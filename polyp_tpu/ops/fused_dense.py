"""Fused W8A8-static dense Pallas kernel: in-VMEM activation quantize →
s8×s8→s32 MXU dot → per-channel dequant + bias, in ONE kernel.

**Measured NEGATIVE result — dispatch defaults OFF (POLYP_FUSED_DENSE=1
opts in).** The hypothesis: each quantized dense on the static path (the
attention projections to_q/to_k/to_v/to_out — the q/k/v/out LoRA targets
of reference train_with_lora_per_class.py:310-316 — plus the 1×1
proj_in/proj_out/conv_shortcut convs) pays a standalone clamp/convert
pass (census: 2.86 ms of a 19.9 ms CFG-batch-16 UNet step after the
fused GEGLU took the FF share), and in-VMEM quantize would kill it the
way ops/fused_geglu.py did for the FF. Measured on the v5e: e2e batch-16
w8a8_static REGRESSED 8.08 → 7.19 samples/sec/chip. The census explains
why (BASELINE.md round-3): the kernel's 142 launches/step ran 1.84 ms
and induced +1.3 ms of boundary layout copies, while the dots it
replaced cost only ~0.9 ms inside XLA's fusions — at single-matmul
granularity XLA's epilogue/prologue fusion and layout freedom win, the
same economics that sank the bf16 fused-MHA block (ops/fused_mha.py).
The GEGLU kernel wins because one launch replaces TWO matmuls, a
transcendental pass, and a [T,2H] HBM round trip.

Kept as a validated, parity-tested op: contraction un-tiled (C ≤ 1280
for every SD dense — full [C, O] int8 weight + an activation tile fit
VMEM), grid over token tiles, weight quantization outside so XLA hoists
it from the sampling scan. Parity oracle: quant.w8a8_dense with the same
static scale. Dispatch points: ops/quant.maybe_quantized_dense and the
1×1 QConv branch in models/unet_blocks.py, both inference-scoped.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polyp_tpu.ops.fused_geglu import _tile  # shared aligned-divisor helper

DEFAULT_BLOCK_M = 512


def supported(x: jax.Array, kernel: jax.Array) -> bool:
    """Shapes the kernel handles efficiently. The 77-token cross-attention
    K/V projections (M = N·77, rarely 128-aligned) fall back to the
    per-layer path — they are a negligible share of step time."""
    if x.ndim < 2:
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    c, o = kernel.shape
    return (jax.default_backend() == "tpu"
            # default OFF: measured e2e regression (module docstring)
            and os.environ.get("POLYP_FUSED_DENSE", "0") == "1"
            and m % 128 == 0 and c % 64 == 0 and o % 64 == 0
            # full [C,O] int8 weight + tiles must fit VMEM
            and c * o <= 4 * 1024 * 1024)


def _dense_q_kernel(x_ref, wq_ref, sw_ref, b_ref, sx_ref, o_ref):
    sx = sx_ref[0, 0]
    xq = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o_ref[...] = (y.astype(jnp.float32)
                  * (sx * sw_ref[...].astype(jnp.float32))
                  + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def fused_w8a8_dense(x: jax.Array, kernel: jax.Array,
                     bias: jax.Array | None,
                     act_scale: jax.Array,
                     block_m: int = DEFAULT_BLOCK_M) -> jax.Array:
    """x: [..., C]; kernel: [C, O]; bias: [O] or None; act_scale: the
    calibrated static activation scale (scalar, may be a traced
    per-timestep gather). Returns [..., O] in x.dtype — matches
    `quant.w8a8_dense(x, kernel, x.dtype, act_scale) + bias` to rounding."""
    from polyp_tpu.ops import quant

    c, o = kernel.shape
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    wq, sw = quant.quantize_weight(kernel, (0,))    # sw: [1, O]
    b = (jnp.zeros((1, o), jnp.float32) if bias is None
         else bias.reshape(1, o))
    sx = jnp.asarray(act_scale, jnp.float32).reshape(1, 1)

    block_m = _tile(m, block_m, 128)
    grid = (m // block_m,)

    out = pl.pallas_call(
        _dense_q_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, o), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, o), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, o), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * o,
            bytes_accessed=m * c * 2 + c * o + m * o * 2,
            transcendentals=0,
        ),
    )(x.reshape(m, c), wq, sw, b, sx)
    return out.reshape(*lead, o)


@jax.custom_vjp
def w8a8_dense_fused(x, kernel, bias, act_scale):
    """Dispatch entry — inference-only (refusing vjp, same contract as
    every w8a8 path: int8 rounding has zero gradient)."""
    return fused_w8a8_dense(x, kernel, bias, act_scale)


def _fwd(*args):
    return w8a8_dense_fused(*args), None


def _bwd(_, g):
    raise NotImplementedError(
        "the fused w8a8 dense path is inference-only: int8 activation "
        "rounding has zero gradient. Train in full precision (the "
        "quantized modes are sampling-time optimizations).")


w8a8_dense_fused.defvjp(_fwd, _bwd)
