"""Fused GEGLU feed-forward Pallas kernel.

The SD transformer FF is x@W1 → split(a, gate) → a·gelu(gate) → @W2. XLA
materializes the [T, 8C] intermediate in HBM twice (write + read); this
kernel keeps it in VMEM: grid over token tiles, both weight matrices
resident, one HBM write of the [T, C] result.

Shapes (level-1 SD blocks): T=1024 tokens, C=320, hidden 2×4C=2560 — W1
(320×2560×bf16 = 1.6 MB) + W2 (1280×320 = 0.8 MB) + a [block_t, 2560] f32
accumulator fit comfortably in ~16 MB VMEM.

Used by unet_blocks.FeedForward when profitable (see `supported`); falls
back to plain XLA otherwise. Exposed for benchmarking either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_T = 256


def supported(x: jax.Array, w1: jax.Array, w2: jax.Array) -> bool:
    if x.ndim != 3:
        return False
    t = x.shape[1]
    hidden2 = w1.shape[1]
    return (jax.default_backend() == "tpu" and t % 128 == 0
            and hidden2 % 256 == 0 and w1.shape[0] % 128 == 0
            # weights must fit VMEM alongside the token tile
            and (w1.size + w2.size) * 2 < 8 * 1024 * 1024)


def _geglu_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    a, gate = jnp.split(h, 2, axis=-1)
    g = a * jax.nn.gelu(gate, approximate=False)
    out = jax.lax.dot_general(g.astype(x.dtype), w2_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = (out + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t",))
def fused_geglu(x: jax.Array, w1: jax.Array, b1: jax.Array,
                w2: jax.Array, b2: jax.Array,
                block_t: int = DEFAULT_BLOCK_T) -> jax.Array:
    """x: [N, T, C]; w1: [C, 2H]; w2: [H, C]. Returns [N, T, C]."""
    n, t, c = x.shape
    hidden2 = w1.shape[1]
    block_t = min(block_t, t)
    xf = x.reshape(n * t, c)
    grid = (pl.cdiv(n * t, block_t),)
    out = pl.pallas_call(
        _geglu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden2,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden2 // 2, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * t, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * c * hidden2 + 2 * n * t * (hidden2 // 2) * c,
            bytes_accessed=(xf.size + w1.size + w2.size + xf.size) * 2,
            transcendentals=n * t * hidden2 // 2,
        ),
    )(xf, w1, b1, w2, b2)
    return out.reshape(n, t, c)


def reference_geglu(x, w1, b1, w2, b2):
    """Plain XLA reference (identical math)."""
    h = x @ w1 + b1
    a, gate = jnp.split(h, 2, axis=-1)
    return (a * jax.nn.gelu(gate, approximate=False)) @ w2 + b2
