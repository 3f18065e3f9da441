"""Fused GroupNorm(+SiLU)(+int8-quantize) Pallas kernel.

Every UNet ResnetBlock runs GN → SiLU → conv (models/unet_blocks.py;
reference architecture: diffusers ResnetBlock2D inside the models built at
/root/reference/generator_model/PolypGeneratorModel.py:17-48). XLA executes
the functional ops/groupnorm.py formulation as TWO passes over the
activation — a channel-wise Σx/Σx² reduction, then a normalize+SiLU
elementwise fusion — i.e. two HBM reads and one write of the big tensor.
This kernel does stats + normalize + SiLU in ONE pass: grid over the batch,
a whole [H·W, C] sample resident in VMEM (the SD UNet's largest is
32·32·320 = 655 KB bf16 — `supported()` gates on MAX_SAMPLE_ELEMENTS so
VAE-decode-sized tensors keep the XLA path).

The int8 epilogue is the point (round-3 follow-up to the "conv-side int8
tax" negative result in BASELINE.md): under `w8a8_static`, the conv that
CONSUMES the GN output quantizes it with a calibrated scale. XLA fuses
that clamp/round/convert chain into the *conv* (consumer side), so the
activation crosses HBM in bf16 and the conv fusion pays the quantize
arithmetic on every read. Emitting int8 from the GN kernel (producer
side) halves the GN→conv HBM traffic and deletes the quantize arithmetic
from the conv fusion entirely — no Pallas conv needed, the conv stays
XLA's 81-100%-MXU kernel, it just reads int8. The per-timestep calibrated
scale arrives as a traced SMEM scalar (the same gathered value QConv uses
to dequantize — ops/quant.py `static_scale`).

Group statistics never touch the lane dimension with a reshape: per-channel
Σx/Σx² vectors [1, C] are folded to per-group [1, G] (and broadcast back)
with tiny one-hot group-assignment matmuls built from 2-D iota — a lane-
aligned formulation, same trick as ops/groupnorm.py's NHWC layout note.

Dispatch: models/unet_blocks.py GroupNorm under ops/dispatch.inference()
(+ pallas_ok); opt-in with POLYP_FUSED_GN=1 until the chip A/B lands
(trace-time flag — re-jit after changing, same contract as
POLYP_FUSED_GEGLU). The int8 epilogue is additionally reachable as a
pure-XLA producer-side quantize (POLYP_GN_Q8=1 in unet_blocks.py) so the
HBM-traffic win and the kernel win can be A/B-measured separately.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-sample element budget: the whole [H·W, C] slab plus its f32 working
# copies (x, x², y — 4 bytes each) plus double-buffered in/out blocks must
# sit in the ~16 MB VMEM scope, which XLA shares with neighboring buffers
# inside the compiled UNet (the fused-GEGLU lesson: a config that compiles
# standalone can exceed scoped VMEM in situ). 512K elements ≈ 1 MB bf16 /
# 2 MB f32 per copy (~8 MB peak). The SD UNet's largest GN input is
# 327,680 elements and the VAE mid-block's 524,288 — both covered; big
# VAE-decode / early scratch-UNet tensors (≥1.6 M) stay on the XLA path.
MAX_SAMPLE_ELEMENTS = 1 << 19


def supported(x: jax.Array, num_groups: int, quantize: bool = False) -> bool:
    """Can the kernel take this GN? (TPU, NHWC, lane-aligned channels,
    sublane-aligned spatial extent, per-sample slab within VMEM budget.)
    With the int8 epilogue (`quantize`) the output block's sublane tile is
    32 rather than 8, so the spatial extent must be 32-aligned — the SD
    UNet's 4×4 level falls back to the XLA producer-side chain."""
    if x.ndim != 4:
        return False
    n, h, w, c = x.shape
    return (jax.default_backend() == "tpu"
            and c % 64 == 0
            and (h * w) % (32 if quantize else 8) == 0
            and h * w * c <= MAX_SAMPLE_ELEMENTS)


def _gn_kernel(x_ref, g_ref, b_ref, s_ref, o_ref, *,
               groups: int, eps: float, act: str | None, quantize: bool):
    x = x_ref[0].astype(jnp.float32)               # [HW, C]
    hw, c = x.shape
    cg = c // groups

    s1 = jnp.sum(x, axis=0, keepdims=True)         # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)     # [1, C]
    # lane-aligned group fold: one-hot assignment matmuls instead of a
    # [C] → [G, C/G] reshape of the lane dimension (which Mosaic would
    # relayout); AT[g, c] = 1 iff channel c belongs to group g.
    gi = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1)
    at = (ci // cg == gi).astype(jnp.float32)      # [G, C]
    cnt = float(hw * cg)
    mean_g = jax.lax.dot_general(s1, at, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) / cnt
    e2_g = jax.lax.dot_general(s2, at, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32) / cnt
    var_g = jnp.maximum(e2_g - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)            # [1, G]
    mean_c = jax.lax.dot_general(mean_g, at, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd_g, at, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    mul = rstd_c * g_ref[...]                      # [1, C] f32
    add = b_ref[...] - mean_c * mul
    y = x * mul + add
    if act == "silu":
        # explicit exp form: Mosaic lowers exp; don't rely on a logistic
        # primitive lowering (the fused-GEGLU erf precedent)
        y = y / (1.0 + jnp.exp(-y))
    if quantize:
        s = s_ref[0, 0]
        o_ref[0] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    else:
        o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_groups", "eps", "act", "interpret"))
def fused_group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     act_scale: jax.Array | None = None, *,
                     num_groups: int = 32, eps: float = 1e-5,
                     act: str | None = None,
                     interpret: bool = False) -> jax.Array:
    """GN(+act) over NHWC `x` in one Pallas pass; == ops.group_norm to
    rounding. With `act_scale` (a calibrated w8a8_static activation scale,
    scalar — possibly a traced per-timestep gather) the output is the
    int8-quantized activation `clip(round(y/act_scale))` the consuming
    quantized conv reads directly (QConv's prequantized path)."""
    if act not in (None, "silu"):
        raise ValueError(act)
    n, h, w, c = x.shape
    g = math.gcd(c, num_groups)
    quantize = act_scale is not None
    out_dtype = jnp.int8 if quantize else x.dtype
    s = (jnp.asarray(act_scale, jnp.float32).reshape(1, 1) if quantize
         else jnp.zeros((1, 1), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=g, eps=eps, act=act,
                          quantize=quantize),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * x.size,
            bytes_accessed=x.size * x.dtype.itemsize
            + x.size * jnp.dtype(out_dtype).itemsize,
            transcendentals=x.size if act == "silu" else 0,
        ),
        interpret=interpret,
    )(x.reshape(n, h * w, c),
      scale.astype(jnp.float32).reshape(1, c),
      bias.astype(jnp.float32).reshape(1, c), s)
    return out.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def group_norm_fused(x, scale, bias, act_scale,
                     num_groups: int = 32, eps: float = 1e-5,
                     act: str | None = None):
    """Dispatch entry (models/unet_blocks.py GroupNorm). Inference-only:
    the GN module only routes here under ops/dispatch.inference(), and the
    custom_vjp refuses differentiation outright — training traces the
    plain XLA ops/groupnorm.py path, whose autodiff fuses better than any
    recompute arrangement (the same A/B economics as the fused GEGLU,
    BASELINE.md round-3 change 4)."""
    return fused_group_norm(x, scale, bias, act_scale,
                            num_groups=num_groups, eps=eps, act=act)


def _gn_fused_fwd(x, scale, bias, act_scale, num_groups, eps, act):
    return group_norm_fused(x, scale, bias, act_scale,
                            num_groups, eps, act), None


def _gn_fused_bwd(num_groups, eps, act, _, g):
    raise NotImplementedError(
        "the fused GroupNorm kernel is inference-only; training paths "
        "trace ops.group_norm (they never enter dispatch.inference())")


group_norm_fused.defvjp(_gn_fused_fwd, _gn_fused_bwd)


def reference_gn_q8(x, scale, bias, act_scale, num_groups=32, eps=1e-5,
                    act="silu"):
    """The XLA composition the quantized kernel replaces (parity oracle):
    ops.group_norm → the exact quantize chain quant._quantize_activation
    applies with a static scale."""
    from polyp_tpu.ops import group_norm

    y = group_norm(x, scale, bias, num_groups, eps, act)
    return jnp.clip(jnp.round(y.astype(jnp.float32)
                              / jnp.asarray(act_scale, jnp.float32)),
                    -127, 127).astype(jnp.int8)
