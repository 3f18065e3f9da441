"""Fused GEGLU feed-forward Pallas kernel.

The SD transformer FF is x@W1 → split(a, gate) → a·gelu(gate) → @W2
(reference: diffusers GEGLU inside BasicTransformerBlock — see
models/unet_blocks.py FeedForward; gelu is the exact erf form, a value
-parity requirement proven by tests/test_torch_block_goldens.py). XLA
runs it as matmul → standalone elementwise fusion (erf on the VPU) →
matmul, which (a) materializes the [T, 2H] intermediate in HBM twice and
(b) serializes the erf pass after the first matmul instead of
overlapping VPU with MXU. This kernel does both matmuls and the gelu in
one pallas_call: grid over (token tiles × hidden tiles), weights
streamed per hidden tile, f32 accumulation of the second matmul in VMEM
scratch — the gelu of tile j runs on the VPU while the MXU works
adjacent tiles, and the intermediate never leaves VMEM.

Hidden tiling is what makes the SD shapes fit: level-2 blocks have
C=1280, 2H=10240 — 39 MB of weights, far beyond VMEM — but a
(block_h=512) column slice of W1 plus the matching row slice of W2 is
~3.9 MB. The a/gate halves of W1 are passed pre-split so each hidden
tile pairs its a-columns with its gate-columns.

Measured (v5e, CFG batch 16, erf gelu): 1.01/0.89/1.01 ms vs XLA
1.56/1.35/1.30 ms at the three SD FF shape classes — see BASELINE.md
round-3. Dispatched by models/unet_blocks.py FeedForward when
`supported` AND inside ops/dispatch.inference() — the samplers set the
scope; training traces the plain XLA path, whose autodiff beats any
custom_vjp around the kernel (A/B in BASELINE.md round-3). Kill switch
POLYP_FUSED_GEGLU=0 (trace-time, like the quant/fused-MHA flags).

`fused_geglu_w8a8` is the static-quant variant: in-VMEM activation
quantize + s8×s8→s32 MXU dots with int32 cross-tile accumulation,
taking the two calibrated activation scales as operands — it removes
the FF's standalone quantize passes, the largest share of the int8 tax
(w8a8_static batch-16 e2e 7.60 → 8.08 samples/sec/chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_T = 256
DEFAULT_BLOCK_H = 512


def _tile(total: int, want: int, unit: int) -> int:
    """Largest divisor of `total` that is ≤ want and a multiple of `unit`
    (falls back to `total` when no such divisor exists)."""
    want = min(want, total)
    for cand in range(want, unit - 1, -1):
        if total % cand == 0 and cand % unit == 0:
            return cand
    return total


def supported(x: jax.Array, w1: jax.Array, w2: jax.Array) -> bool:
    if x.ndim != 3:
        return False
    nt = x.shape[0] * x.shape[1]
    c = x.shape[2]
    hidden2 = w1.shape[1]
    return (jax.default_backend() == "tpu"
            and nt % 128 == 0 and hidden2 % 256 == 0 and c % 64 == 0)


def _erf(z: jax.Array) -> jax.Array:
    """erf via Abramowitz & Stegun 7.1.26 (method |err| ≤ 1.5e-7, ~2.7e-6
    observed in f32 arithmetic — far below the bf16 output resolution, so
    exact-gelu parity is preserved). Mosaic TPU lowers exp but not
    erf/erfc, hence the in-kernel polynomial."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    e = 1.0 - poly * jnp.exp(-az * az)
    return jnp.sign(z) * e


def _exact_gelu(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _geglu_kernel(x_ref, wa_ref, ba_ref, wg_ref, bg_ref, w2_ref, b2_ref,
                  o_ref, acc_ref, *, n_h: int):
    j = pl.program_id(1)
    x = x_ref[...]
    a = jax.lax.dot_general(x, wa_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x, wg_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a + ba_ref[...].astype(jnp.float32)
    g = g + bg_ref[...].astype(jnp.float32)
    h = a * _exact_gelu(g)  # exact-form gelu: import parity
    part = jax.lax.dot_general(h.astype(x.dtype), w2_ref[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _accum():
        acc_ref[...] += part

    @pl.when(j == n_h - 1)
    def _emit():
        o_ref[...] = (acc_ref[...]
                      + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_h"))
def fused_geglu(x: jax.Array, w1: jax.Array, b1: jax.Array,
                w2: jax.Array, b2: jax.Array,
                block_t: int = DEFAULT_BLOCK_T,
                block_h: int = DEFAULT_BLOCK_H) -> jax.Array:
    """x: [N, T, C]; w1: [C, 2H]; b1: [2H]; w2: [H, C]; b2: [C].
    Returns [N, T, C] == reference_geglu to fp rounding."""
    n, t, c = x.shape
    hidden = w1.shape[1] // 2
    # a/gate column halves pre-split so a hidden tile j covers matching
    # slices of both (the split axis is the W1 output axis)
    wa, wg = w1[:, :hidden], w1[:, hidden:]
    ba, bg = b1[:hidden].reshape(1, hidden), b1[hidden:].reshape(1, hidden)
    b2r = b2.reshape(1, c)

    block_t = _tile(n * t, block_t, 128)
    block_h = _tile(hidden, block_h, 128)
    n_h = hidden // block_h
    grid = ((n * t) // block_t, n_h)

    xf = x.reshape(n * t, c)
    out = pl.pallas_call(
        functools.partial(_geglu_kernel, n_h=n_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * t, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * c * 2 * hidden + 2 * n * t * hidden * c,
            bytes_accessed=(xf.size + w1.size + w2.size + xf.size) * 2,
            transcendentals=n * t * hidden,
        ),
    )(xf, wa, ba, wg, bg, w2, b2r)
    return out.reshape(n, t, c)


def reference_geglu(x, w1, b1, w2, b2):
    """Plain XLA reference (identical math)."""
    h = x @ w1 + b1
    a, gate = jnp.split(h, 2, axis=-1)
    return (a * jax.nn.gelu(gate, approximate=False)) @ w2 + b2


def _geglu_q_kernel(x_ref, wa_ref, sa_ref, ba_ref, wg_ref, sg_ref, bg_ref,
                    w2_ref, s2_ref, b2_ref, sx_ref, sh_ref,
                    o_ref, acc_ref, *, n_h: int):
    """W8A8-static variant: int8 MXU dots with in-kernel activation
    quantize. The second matmul accumulates in int32 across hidden tiles
    (exact — ≤ 127²·H ≈ 8e7 « 2³¹), dequantized once at emit."""
    j = pl.program_id(1)
    sx = sx_ref[0, 0]
    xq = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    a32 = jax.lax.dot_general(xq, wa_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    g32 = jax.lax.dot_general(xq, wg_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    a = (a32.astype(jnp.float32) * (sx * sa_ref[...].astype(jnp.float32))
         + ba_ref[...].astype(jnp.float32))
    g = (g32.astype(jnp.float32) * (sx * sg_ref[...].astype(jnp.float32))
         + bg_ref[...].astype(jnp.float32))
    h = a * _exact_gelu(g)
    sh = sh_ref[0, 0]
    hq = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
    part = jax.lax.dot_general(hq, w2_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _accum():
        acc_ref[...] += part

    @pl.when(j == n_h - 1)
    def _emit():
        o_ref[...] = (acc_ref[...].astype(jnp.float32)
                      * (sh * s2_ref[...].astype(jnp.float32))
                      + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_h"))
def fused_geglu_w8a8(x: jax.Array, w1: jax.Array, b1: jax.Array,
                     w2: jax.Array, b2: jax.Array,
                     act_scale1: jax.Array, act_scale2: jax.Array,
                     block_t: int = DEFAULT_BLOCK_T,
                     block_h: int = DEFAULT_BLOCK_H) -> jax.Array:
    """W8A8-static fused GEGLU: same shapes/contract as `fused_geglu` plus
    the two calibrated activation scales (`act_scale1` for the x→W1 input,
    `act_scale2` for the a·gelu(gate)→W2 input — the quant paths
    .../ff_net_0_proj and .../ff_net_2). Weight quantization (symmetric
    per-output-channel, ops/quant.py semantics) happens outside the kernel
    so XLA hoists it out of the sampling scan; activations quantize
    in-VMEM, so the int8 tax's standalone clamp/convert pass disappears
    for the FF. Matches the per-layer w8a8_dense path to bf16 rounding
    (the kernel keeps dequantized intermediates in f32)."""
    from polyp_tpu.ops import quant

    n, t, c = x.shape
    hidden = w1.shape[1] // 2
    wq1, sw1 = quant.quantize_weight(w1, (0,))      # sw1: [1, 2H]
    wq2, sw2 = quant.quantize_weight(w2, (0,))      # sw2: [1, C]
    wa, wg = wq1[:, :hidden], wq1[:, hidden:]
    sa, sg = sw1[:, :hidden], sw1[:, hidden:]
    ba, bg = b1[:hidden].reshape(1, hidden), b1[hidden:].reshape(1, hidden)
    b2r = b2.reshape(1, c)
    sx = jnp.asarray(act_scale1, jnp.float32).reshape(1, 1)
    sh = jnp.asarray(act_scale2, jnp.float32).reshape(1, 1)

    block_t = _tile(n * t, block_t, 128)
    block_h = _tile(hidden, block_h, 128)
    n_h = hidden // block_h
    grid = ((n * t) // block_t, n_h)

    def full(shape):
        return pl.BlockSpec(shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_geglu_q_kernel, n_h=n_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            full((1, c)),
            full((1, c)),
            full((1, 1)),
            full((1, 1)),
        ],
        out_specs=pl.BlockSpec((block_t, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * t, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, c), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * c * 2 * hidden + 2 * n * t * hidden * c,
            bytes_accessed=(x.size * 2 + wq1.size + wq2.size
                            + x.size * 2),
            transcendentals=n * t * hidden,
        ),
    )(x.reshape(n * t, c), wa, sa, ba, wg, sg, bg, wq2, sw2, b2r, sx, sh)
    return out.reshape(n, t, c)


@jax.custom_vjp
def geglu_w8a8(x, w1, b1, w2, b2, act_scale1, act_scale2):
    """Dispatch entry for the static-quant FF. Inference-only like every
    w8a8 path: the custom_vjp below refuses differentiation outright (the
    int8 rounding has zero gradient — silent no-learning otherwise; same
    contract as ops/quant.py `_inference_only`)."""
    bt, bh = _BLOCKS.get(x.shape[-1], (DEFAULT_BLOCK_T, DEFAULT_BLOCK_H))
    return fused_geglu_w8a8(x, w1, b1, w2, b2,
                            act_scale1, act_scale2, block_t=bt, block_h=bh)


def _geglu_w8a8_fwd(*args):
    return geglu_w8a8(*args), None


def _geglu_w8a8_bwd(_, g):
    raise NotImplementedError(
        "the fused w8a8 GEGLU path is inference-only: int8 activation "
        "rounding has zero gradient. Train in full precision (the "
        "quantized modes are sampling-time optimizations).")


geglu_w8a8.defvjp(_geglu_w8a8_fwd, _geglu_w8a8_bwd)


def _geglu_q_pt_kernel(x_ref, wa_ref, sa_ref, ba_ref, wg_ref, sg_ref, bg_ref,
                       w2_ref, s2_ref, b2_ref, o_ref, acc_ref, *, n_h: int):
    """Per-token (row-wise) activation-scale variant of `_geglu_q_kernel`:
    every token quantizes with its own in-VMEM amax instead of one
    calibrated per-layer scalar — finer quantization grid (the row max is
    ≤ the tensor max) at zero HBM cost, and no calibration needed, so the
    DYNAMIC w8a8 mode can dispatch it too (the per-layer XLA path can't
    fuse a dynamic scale that depends on the not-yet-computed
    intermediate). The h quantize is per (row, hidden-tile) — finer still —
    which forces f32 cross-tile accumulation (each tile dequantizes with
    its own row scales; int32 products are ≤127²·block_h ≈ 8.3e6 < 2²⁴ so
    the f32 adds are exact on the integer part)."""
    j = pl.program_id(1)
    x32 = x_ref[...].astype(jnp.float32)
    sxr = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True),
                      1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / sxr), -127, 127).astype(jnp.int8)
    a32 = jax.lax.dot_general(xq, wa_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    g32 = jax.lax.dot_general(xq, wg_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    a = (a32.astype(jnp.float32) * (sxr * sa_ref[...].astype(jnp.float32))
         + ba_ref[...].astype(jnp.float32))
    g = (g32.astype(jnp.float32) * (sxr * sg_ref[...].astype(jnp.float32))
         + bg_ref[...].astype(jnp.float32))
    h = a * _exact_gelu(g)
    shr = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True),
                      1e-12) / 127.0
    hq = jnp.clip(jnp.round(h / shr), -127, 127).astype(jnp.int8)
    part32 = jax.lax.dot_general(hq, w2_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
    part = part32.astype(jnp.float32) * (shr * s2_ref[...].astype(jnp.float32))

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _accum():
        acc_ref[...] += part

    @pl.when(j == n_h - 1)
    def _emit():
        o_ref[...] = (acc_ref[...]
                      + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_h"))
def fused_geglu_w8a8_pt(x: jax.Array, w1: jax.Array, b1: jax.Array,
                        w2: jax.Array, b2: jax.Array,
                        block_t: int = DEFAULT_BLOCK_T,
                        block_h: int = DEFAULT_BLOCK_H) -> jax.Array:
    """Per-token W8A8 fused GEGLU: same contract as `fused_geglu_w8a8`
    minus the calibrated scales (activation scales are computed per row in
    VMEM — see `_geglu_q_pt_kernel`). Weight quantization stays outside so
    XLA hoists it out of the sampling scan."""
    from polyp_tpu.ops import quant

    n, t, c = x.shape
    hidden = w1.shape[1] // 2
    wq1, sw1 = quant.quantize_weight(w1, (0,))      # sw1: [1, 2H]
    wq2, sw2 = quant.quantize_weight(w2, (0,))      # sw2: [1, C]
    wa, wg = wq1[:, :hidden], wq1[:, hidden:]
    sa, sg = sw1[:, :hidden], sw1[:, hidden:]
    ba, bg = b1[:hidden].reshape(1, hidden), b1[hidden:].reshape(1, hidden)
    b2r = b2.reshape(1, c)

    block_t = _tile(n * t, block_t, 128)
    block_h = _tile(hidden, block_h, 128)
    n_h = hidden // block_h
    grid = ((n * t) // block_t, n_h)

    def full(shape):
        return pl.BlockSpec(shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_geglu_q_pt_kernel, n_h=n_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            full((1, c)),
            full((1, c)),
        ],
        out_specs=pl.BlockSpec((block_t, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * t, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * c * 2 * hidden + 2 * n * t * hidden * c,
            bytes_accessed=(x.size * 2 + wq1.size + wq2.size
                            + x.size * 2),
            transcendentals=n * t * hidden,
        ),
    )(x.reshape(n * t, c), wa, sa, ba, wg, sg, bg, wq2, sw2, b2r)
    return out.reshape(n, t, c)


@jax.custom_vjp
def geglu_w8a8_pt(x, w1, b1, w2, b2):
    """Dispatch entry for the per-token quant FF (dynamic w8a8 AND — with
    POLYP_GEGLU_PT=1 — the static mode). Inference-only like every w8a8
    path (refusing custom_vjp, same contract as `geglu_w8a8`)."""
    bt, bh = _BLOCKS.get(x.shape[-1], (DEFAULT_BLOCK_T, DEFAULT_BLOCK_H))
    return fused_geglu_w8a8_pt(x, w1, b1, w2, b2, block_t=bt, block_h=bh)


def _geglu_w8a8_pt_fwd(*args):
    return geglu_w8a8_pt(*args), None


def _geglu_w8a8_pt_bwd(_, g):
    raise NotImplementedError(
        "the fused w8a8 GEGLU path is inference-only: int8 activation "
        "rounding has zero gradient. Train in full precision (the "
        "quantized modes are sampling-time optimizations).")


geglu_w8a8_pt.defvjp(_geglu_w8a8_pt_fwd, _geglu_w8a8_pt_bwd)


def reference_geglu_w8a8_pt(x, w1, b1, w2, b2, out_dtype=None):
    """Plain-XLA per-token oracle for `fused_geglu_w8a8_pt` parity tests:
    identical math (row-wise activation scales, per-output-channel weight
    scales, exact gelu) with the h quantize done per (row, hidden-tile) to
    mirror the kernel's tiling exactly."""
    from polyp_tpu.ops import quant

    out_dtype = out_dtype or x.dtype
    n, t, c = x.shape
    hidden = w1.shape[1] // 2
    bt, bh = _BLOCKS.get(c, (DEFAULT_BLOCK_T, DEFAULT_BLOCK_H))
    block_h = _tile(hidden, bh, 128)

    wq1, sw1 = quant.quantize_weight(w1, (0,))
    wq2, sw2 = quant.quantize_weight(w2, (0,))
    x32 = x.reshape(n * t, c).astype(jnp.float32)
    sxr = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True),
                      1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / sxr), -127, 127).astype(jnp.int8)
    h1 = jax.lax.dot_general(xq, wq1, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    h1 = h1.astype(jnp.float32) * (sxr * sw1.astype(jnp.float32)) + b1
    a, gate = jnp.split(h1, 2, axis=-1)
    h = a * jax.nn.gelu(gate, approximate=False)
    out = jnp.zeros((n * t, c), jnp.float32)
    for j0 in range(0, hidden, block_h):
        ht = h[:, j0:j0 + block_h]
        shr = jnp.maximum(jnp.max(jnp.abs(ht), axis=1, keepdims=True),
                          1e-12) / 127.0
        hq = jnp.clip(jnp.round(ht / shr), -127, 127).astype(jnp.int8)
        p = jax.lax.dot_general(hq, wq2[j0:j0 + block_h],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        out = out + p.astype(jnp.float32) * (shr * sw2.astype(jnp.float32))
    return (out + b2).astype(out_dtype).reshape(n, t, c)


def reference_geglu_w8a8(x, w1, b1, w2, b2, act_scale1, act_scale2,
                         out_dtype=None):
    """The per-layer static-quant FF the kernel replaces (composition of
    quant.w8a8_dense exactly as FeedForward's proj() does it) — the parity
    oracle for tests."""
    from polyp_tpu.ops import quant

    out_dtype = out_dtype or x.dtype
    h = (quant.w8a8_dense(x, w1, out_dtype, jnp.float32(act_scale1))
         + b1.astype(out_dtype))
    a, gate = jnp.split(h, 2, axis=-1)
    return (quant.w8a8_dense(a * jax.nn.gelu(gate, approximate=False), w2,
                             out_dtype, jnp.float32(act_scale2))
            + b2.astype(out_dtype))


# (block_t, block_h) per SD channel width — the best configs of the v5e
# block-size sweep (BASELINE.md round-3); _tile() shrinks them safely for
# other shapes. C=1280 runs (512, 512): (1024, 512) wins ~3% standalone
# but exceeds the 16 MB scoped-VMEM limit inside the compiled UNet (XLA
# co-schedules neighboring buffers into the same scope).
_BLOCKS = {320: (1024, 1024), 640: (512, 512), 1280: (512, 512)}


@jax.custom_vjp
def geglu(x: jax.Array, w1: jax.Array, b1: jax.Array,
          w2: jax.Array, b2: jax.Array) -> jax.Array:
    """Differentiable fused-GEGLU entry. Primal (sampling) calls run the
    Pallas kernel; DIFFERENTIATED calls take the plain XLA forward and
    save the [T, 2H] pre-activation for backward instead — the kernel's
    VMEM-resident intermediate is unrecoverable, and an A/B on the SD
    LoRA train step measured the recompute backward at 117.2 vs the
    unfused path's 123.4 img/s (BASELINE.md round-3). Training through
    the fused dispatch is therefore *identical* math and cost to the
    unfused path; only inference sees the kernel."""
    bt, bh = _BLOCKS.get(x.shape[-1], (DEFAULT_BLOCK_T, DEFAULT_BLOCK_H))
    return fused_geglu(x, w1, b1, w2, b2, block_t=bt, block_h=bh)


def _geglu_tail(h, w2, b2):
    """out as a function of the saved pre-activation (backward re-derives
    only cheap elementwise gelu work, no matmul recompute)."""
    a, gate = jnp.split(h, 2, axis=-1)
    return (a * jax.nn.gelu(gate, approximate=False)) @ w2 + b2


def _geglu_fwd(x, w1, b1, w2, b2):
    h = x @ w1 + b1
    return _geglu_tail(h, w2, b2), (x, w1, w2, b2, h)


def _geglu_bwd(res, g):
    x, w1, w2, b2, h = res
    out, vjp = jax.vjp(_geglu_tail, h, w2, b2)
    dh, dw2, db2 = vjp(g.astype(out.dtype))
    dx = (dh @ w1.T).astype(x.dtype)
    dw1 = jnp.einsum("ntc,nth->ch", x, dh).astype(w1.dtype)
    db1 = jnp.sum(dh, axis=(0, 1)).astype(w1.dtype)
    return dx, dw1, db1, dw2, db2


geglu.defvjp(_geglu_fwd, _geglu_bwd)
