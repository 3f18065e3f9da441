"""GroupNorm as a plain jnp function (NHWC, fp32 statistics).

Kept as a function (not a Module) so a fused Pallas variant can swap in
under the same call site without touching parameter layout. Matches torch
GroupNorm semantics: groups over channels, per-group mean/var across
(H, W, C/G).

TPU layout note (round-2 profile finding): the naive formulation —
`x.astype(f32).reshape(N,H,W,G,C/G)` then mean/var — materializes an fp32
copy of the whole activation AND a 5-D tensor whose trailing dim (C/G = 10
or 20 for SD widths) occupies 10-20 of 128 lanes, so Mosaic pads it ~6×
and inserts relayout copies; at CFG batch 16 this cost ~4 ms/UNet-step in
reshape/copy ops. The formulation below keeps every big-tensor op in the
input dtype and native NHWC layout: channel-wise Σx / Σx² with fp32
accumulation (XLA fuses the convert into the reduce — no fp32 copy), group
reduction on the tiny [N, C] stats, then one fused elementwise normalize.
Variance uses E[x²]−E[x]² in fp32 — exact enough at activation scales
(|mean|/std ≲ 1e3) and verified against the two-pass formula in
tests/test_golden_ops.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               num_groups: int = 32, eps: float = 1e-5,
               act: str | None = None) -> jax.Array:
    n, h, w, c = x.shape
    # gcd keeps the full group count for all production widths (multiples of
    # 32); tiny test models and odd skip-concat widths degrade gracefully.
    g = math.gcd(c, num_groups)
    cg = c // g

    # channel-wise first (lane-aligned), fp32 accumulation without an fp32
    # copy of x; then the group reduction runs on tiny [n, g, c/g] stats.
    s1 = jnp.sum(x, axis=(1, 2), dtype=jnp.float32)          # [n, c]
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2))  # [n, c]
    cnt = h * w * cg
    mean_g = jnp.sum(s1.reshape(n, g, cg), axis=-1) / cnt    # [n, g]
    e2_g = jnp.sum(s2.reshape(n, g, cg), axis=-1) / cnt
    var_g = jnp.maximum(e2_g - jnp.square(mean_g), 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)

    # fold per-group stats + affine into per-channel scale/offset so the big
    # tensor sees ONE fused multiply-add (+ activation)
    mean_c = jnp.repeat(mean_g, cg, axis=1)                  # [n, c]
    rstd_c = jnp.repeat(rstd_g, cg, axis=1)
    mul = rstd_c * scale[None, :]                            # [n, c] fp32
    add = bias[None, :] - mean_c * mul
    out = x.astype(jnp.float32) * mul[:, None, None, :] + add[:, None, None, :]
    if act == "silu":
        out = jax.nn.silu(out)
    elif act is not None:
        raise ValueError(act)
    return out.astype(x.dtype)
