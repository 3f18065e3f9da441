"""GroupNorm as a plain jnp function (NHWC, fp32 statistics).

Kept as a function (not a Module) so the fused Pallas GN+SiLU(+conv) resnet
kernel can swap in under the same call site without touching parameter
layout. Matches torch GroupNorm semantics: groups over channels, per-group
mean/var across (H, W, C/G).
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
    xf = x.reshape(n, h, w, g, c // g).astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf.reshape(n, h, w, c) * scale + bias
    if act == "silu":
        out = jax.nn.silu(out)
    elif act is not None:
        raise ValueError(act)
    return out.astype(x.dtype)
