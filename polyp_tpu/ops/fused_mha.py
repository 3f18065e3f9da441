"""Fused multi-head attention block as ONE Pallas kernel.

Motivation (round-2 profile of the 50-step DDIM scan): the standalone flash
kernel wants (B·H, T, D) inputs, so XLA surrounds every call with
pad+transpose copies (BTHD → BHTD for Q/K/V, back for the output) costing
~140 µs per call — ~0.7 ms of pure data formatting per UNet step at CFG
batch 16 — plus separate projection matmuls it cannot fuse into the
custom-call. This kernel moves the whole attention block inside:

    out[b] = softmax((x Wq)(ctx Wk)ᵀ/√d) (ctx Wv) Wo

Per grid cell (b, qblock i, head h, kblock j) it projects the needed Q/K/V
tiles from the *natural* [B, T, C] activations (weights pre-split per head
and zero-padded to a lane-aligned head dim), runs the blockwise-softmax
flash update, and accumulates the output projection over heads into a VMEM
scratch flushed at the last (h, j). No transposes, no pad ops, no separate
projection HLOs — the only HBM traffic is x/ctx in and out once per
q-block (ctx re-read per k-block; weights re-read per head — all tiny).

K/V projections are recomputed per q-block (grid order has i outside h, j):
for the SD UNet's self-attention (T ≤ 4096 → at most 4 q-blocks) that
recompute is O(T·C·d) against the O(T²·d) attention — documented, measured
acceptable. The standalone flash kernel (ops/flash_attention.py) remains
the long-sequence path.

Differentiable via custom_vjp: the backward recomputes through the unfused
reference math (`reference_mha`), so training (LoRA merges weights, then
calls attention as usual) flows gradients to x, ctx, AND all four weights.

Reference parity: this fuses diffusers' Attention processor stack
(reference generator_model/PolypGeneratorModel.py:17-22 uses stock
UNet2DConditionModel attention); the math contract is identical.

Measured outcome (v5e, SD level-0 CFG-batch-16 shapes): 1428 µs vs the
tuned unfused path's 1443 µs — parity, and slightly SLOWER end-to-end
(6.54 vs 6.64 samples/s). The layout copies this kernel eliminates were
already removed by the round-2 flash block tuning, and the per-head
(C×64) in-kernel projections run at lower MXU occupancy than XLA's single
(C×C) dots. Dispatch therefore defaults OFF (ops/attention.py:
use_fused_mha, opt in with POLYP_FUSED_MHA=1); the kernel stays as a
validated building block for regimes where standalone-attention pre/post
copies reappear.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(x: jax.Array, ctx: jax.Array, num_heads: int, head_dim: int,
              qkv_bias: bool) -> bool:
    """Shape/feature/profitability gate for the fused kernel. The VAE's
    biased single-head attention and CLIP's causal path stay on XLA; the
    1024-token floor is where the flash pre/post copies this kernel
    eliminates start to exist."""
    if qkv_bias or jax.default_backend() != "tpu":
        return False
    tq = x.shape[1]
    # q tokens must tile the MXU (the impl shrinks block_q to a 128-aligned
    # divisor of tq); kv tokens are padded+masked internally. head_dim ≤ 128
    # keeps one head in a single lane tile after padding.
    return tq % 128 == 0 and tq >= 1024 and head_dim <= 128 and ctx.shape[1] >= 1


def reference_mha(x, ctx, wq, wk, wv, wo, *, num_heads: int, head_dim: int):
    """Unfused reference math (also the custom_vjp backward): exactly what
    models/unet_blocks.py::Attention computes with nn.Dense + XLA attention."""
    b, tq, _ = x.shape
    tk = ctx.shape[1]
    q = (x @ wq.astype(x.dtype)).reshape(b, tq, num_heads, head_dim)
    k = (ctx @ wk.astype(ctx.dtype)).reshape(b, tk, num_heads, head_dim)
    v = (ctx @ wv.astype(ctx.dtype)).reshape(b, tk, num_heads, head_dim)
    o = jax.nn.dot_product_attention(q, k, v)
    return o.reshape(b, tq, num_heads * head_dim) @ wo.astype(x.dtype)


def _mha_kernel(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, wo_ref, o_ref,
                q_scr, m_scr, l_scr, acc_scr, out_scr, *,
                num_h: int, num_k: int, block_k: int, kv_len: int,
                sm_scale: float):
    h = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _start_head():
        # Q projection for this (q-block, head); scale folded in here so the
        # scores matmul needs no epilogue multiply.
        q = jax.lax.dot(xq_ref[0], wq_ref[0],
                        preferred_element_type=jnp.float32)
        q_scr[...] = (q * sm_scale).astype(q_scr.dtype)
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when((h == 0) & (j == 0))
    def _zero_out():
        out_scr[...] = jnp.zeros_like(out_scr)

    xkv = xkv_ref[0]
    k_blk = jax.lax.dot(xkv, wk_ref[0],
                        preferred_element_type=jnp.float32).astype(xkv.dtype)
    v_blk = jax.lax.dot(xkv, wv_ref[0],
                        preferred_element_type=jnp.float32).astype(xkv.dtype)

    s = jax.lax.dot_general(q_scr[...], k_blk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, bk]
    if num_k * block_k != kv_len:
        # zero-padded kv rows (cross-attention: 77 → 128): mask them out.
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)

    m_prev = m_scr[...][:, :1]
    l_prev = l_scr[...][:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == num_k - 1)
    def _head_out():
        # this head's attention output, projected and accumulated
        o_h = (acc_scr[...] / l_scr[...][:, :1]).astype(xkv.dtype)
        out_scr[...] += jax.lax.dot(o_h, wo_ref[0],
                                    preferred_element_type=jnp.float32)

    @pl.when((h == num_h - 1) & (j == num_k - 1))
    def _flush():
        o_ref[0] = out_scr[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "head_dim",
                                             "block_q", "block_k",
                                             "interpret"))
def fused_mha(x: jax.Array, ctx: jax.Array,
              wq: jax.Array, wk: jax.Array, wv: jax.Array, wo: jax.Array,
              *, num_heads: int, head_dim: int,
              block_q: int = DEFAULT_BLOCK_Q,
              block_k: int = DEFAULT_BLOCK_K,
              interpret: bool = False) -> jax.Array:
    """x: [B, Tq, C]; ctx: [B, Tk, Ckv] (pass x for self-attention).
    wq: [C, H·D]; wk/wv: [Ckv, H·D]; wo: [H·D, Co]. Returns [B, Tq, Co]
    (out-projection bias, if any, is added by the caller — XLA fuses it).
    """
    return _fused_mha_vjp(x, ctx, wq, wk, wv, wo, num_heads, head_dim,
                          block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused_mha_vjp(x, ctx, wq, wk, wv, wo, num_heads, head_dim,
                   block_q, block_k, interpret):
    return _fused_mha_impl(x, ctx, wq, wk, wv, wo, num_heads=num_heads,
                           head_dim=head_dim, block_q=block_q,
                           block_k=block_k, interpret=interpret)


def _fused_mha_fwd(x, ctx, wq, wk, wv, wo, num_heads, head_dim,
                   block_q, block_k, interpret):
    out = _fused_mha_impl(x, ctx, wq, wk, wv, wo, num_heads=num_heads,
                          head_dim=head_dim, block_q=block_q,
                          block_k=block_k, interpret=interpret)
    return out, (x, ctx, wq, wk, wv, wo)


def _fused_mha_bwd(num_heads, head_dim, block_q, block_k, interpret, res, g):
    # recompute through the unfused reference (same math; O(T²) memory is
    # fine at training scales — see flash_attention._flash_vjp_bwd)
    x, ctx, wq, wk, wv, wo = res
    _, pullback = jax.vjp(
        functools.partial(reference_mha, num_heads=num_heads,
                          head_dim=head_dim), x, ctx, wq, wk, wv, wo)
    return pullback(g)


_fused_mha_vjp.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def _fused_mha_impl(x, ctx, wq, wk, wv, wo, *, num_heads, head_dim,
                    block_q, block_k, interpret):
    b, tq, c = x.shape
    tk = ctx.shape[1]
    ckv = ctx.shape[2]
    co = wo.shape[1]
    h, d = num_heads, head_dim
    dp = _round_up(d, 64)
    sm_scale = 1.0 / math.sqrt(d)
    dtype = x.dtype

    # per-head weight split, head dim zero-padded to a lane-aligned width
    # (exact math: zero Q/K columns add nothing to QKᵀ; padded V columns
    # produce padded O columns that meet zero Wo rows). Loop-invariant under
    # scan — XLA hoists these transforms out of the sampling loop.
    def split_heads_in(w, cin):  # [cin, H·D] -> [H, cin, Dp]
        w = w.reshape(cin, h, d).transpose(1, 0, 2).astype(dtype)
        return jnp.pad(w, ((0, 0), (0, 0), (0, dp - d)))

    wq_p = split_heads_in(wq, c)
    wk_p = split_heads_in(wk, ckv)
    wv_p = split_heads_in(wv, ckv)
    # [H·D, Co] -> [H, Dp, Co]
    wo_p = jnp.pad(wo.reshape(h, d, co).astype(dtype),
                   ((0, 0), (0, dp - d), (0, 0)))

    # block_q must divide tq or trailing q rows would never be computed
    # (grid uses tq // block_q); gcd keeps 128-alignment since both are
    # multiples of 128 on the supported() path.
    block_q = math.gcd(min(block_q, tq), tq)
    if tq % block_q or block_q % 128:
        raise ValueError(f"block_q {block_q} incompatible with tq {tq}")
    # pad KV to the next lane multiple only, then shrink block_k to a
    # divisor of that padded length (gcd keeps 128-alignment, mirroring the
    # block_q logic) — padding to a block_k multiple instead would waste
    # masked compute on e.g. tk=1100 → 2048 rather than 1152.
    tk_pad = _round_up(tk, 128)
    block_k = math.gcd(min(block_k, tk_pad), tk_pad)
    if tk_pad != tk:
        ctx = jnp.pad(ctx, ((0, 0), (0, tk_pad - tk), (0, 0)))
    num_k = tk_pad // block_k

    kernel = functools.partial(_mha_kernel, num_h=h, num_k=num_k,
                               block_k=block_k, kv_len=tk,
                               sm_scale=sm_scale)
    return pl.pallas_call(
        kernel,
        grid=(b, tq // block_q, h, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b_, i, h_, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, ckv), lambda b_, i, h_, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, dp), lambda b_, i, h_, j: (h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckv, dp), lambda b_, i, h_, j: (h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckv, dp), lambda b_, i, h_, j: (h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp, co), lambda b_, i, h_, j: (h_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, co),
                               lambda b_, i, h_, j: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tq, co), dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, dp), dtype),          # projected Q
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running sum-exp
            pltpu.VMEM((block_q, dp), jnp.float32),    # PV accumulator
            pltpu.VMEM((block_q, co), jnp.float32),    # out-proj accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * h * tq * c * dp                          # q proj
                   + 4 * b * h * (tq // block_q) * tk_pad * ckv * dp  # k/v
                   + 4 * b * h * tq * tk_pad * dp                  # qk^t + pv
                   + 2 * b * tq * h * dp * co),                    # out proj
            bytes_accessed=(x.size + ctx.size) * x.dtype.itemsize * 2,
            transcendentals=b * h * tq * tk_pad,
        ),
        interpret=interpret,
    )(x, ctx, wq_p, wk_p, wv_p, wo_p)
