"""Microbench: fused GroupNorm Pallas kernel vs the XLA composition.

Measures, at the SD UNet's four shape classes (CFG batch = 2×B), the
GN+SiLU → 3×3 conv pair that dominates every ResnetBlock
(models/unet_blocks.py):

  bf16:  [XLA GN+SiLU → bf16 conv]           vs [Pallas GN+SiLU → bf16 conv]
  w8a8:  [XLA GN+SiLU → quantize → int8 conv] vs [Pallas GN+SiLU+q8 → int8 conv]

The composition (not the GN alone) is the honest unit: the consumer-side
quantize rides the conv fusion's epilogue, so the int8 question is whether
a producer-side int8 handoff (half the GN→conv HBM traffic, no quantize
arithmetic in the conv fusion) beats XLA's arrangement — BASELINE.md
round-3 recorded the conv-side quantize as the largest standing int8 tax.

Timing per the verify-skill rules: 300 chained iterations inside one
executable (data-dependent carry defeats result memoization), scalar-fetch
sync, best of 3 reps. Run on the exclusive chip:

    python tools/bench_fused_gn.py [--batch 16] [--iters 300]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from polyp_tpu.ops import fused_gn, group_norm  # noqa: E402

LEVELS = [(32, 320), (16, 640), (8, 1280), (4, 1280)]
GROUPS, EPS = 32, 1e-5


def _sync(x) -> float:
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def time_chain(f, x, iters: int, reps: int = 3) -> float:
    """Best-of-reps chained timing of x→x map `f` (ms per call)."""
    @jax.jit
    def chained(x0):
        return jax.lax.fori_loop(0, iters, lambda i, a: f(a), x0)

    _sync(chained(x))  # compile + warm
    best = 1e9
    for r in range(reps):
        a0 = x + r * 1e-4
        _sync(a0)
        t0 = time.perf_counter()
        _sync(chained(a0))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def make_cases(batch: int, spatial: int, c: int):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, spatial, spatial, c), jnp.bfloat16)
    gamma = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (c,))) + 0.5
    beta = jax.random.normal(jax.random.fold_in(key, 2), (c,)) * 0.1
    w = (jax.random.normal(jax.random.fold_in(key, 3), (3, 3, c, c),
                           jnp.bfloat16) * (1.0 / (3 * (c ** 0.5))))
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / 0.02), -127, 127
                  ).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    sa = jnp.float32(0.02)

    def conv_bf16(h):
        return jax.lax.conv_general_dilated(h, w, (1, 1), "SAME",
                                            dimension_numbers=dn)

    def conv_int8(h8):
        y = jax.lax.conv_general_dilated(h8, wq, (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (sa * 0.02)).astype(jnp.bfloat16)

    # no magnitude-stabilizing epilogue needed: GN is the chain's first
    # op, so every iteration re-standardizes its input

    def xla_bf16(a):
        return conv_bf16(group_norm(a, gamma, beta, GROUPS, EPS, "silu"))

    def pallas_bf16(a):
        return conv_bf16(fused_gn.fused_group_norm(
            a, gamma, beta, None, num_groups=GROUPS, eps=EPS, act="silu"))

    def xla_q8(a):
        h = group_norm(a, gamma, beta, GROUPS, EPS, "silu")
        h8 = jnp.clip(jnp.round(h.astype(jnp.float32) / sa), -127, 127
                      ).astype(jnp.int8)
        return conv_int8(h8)

    def xla_producer_q8(a):
        # same math as xla_q8; kept as a separate trace so XLA's fusion
        # choice can be compared against the explicit Pallas producer
        h8 = fused_gn.reference_gn_q8(a, gamma, beta, sa, GROUPS, EPS,
                                      "silu")
        return conv_int8(h8)

    def pallas_q8(a):
        h8 = fused_gn.fused_group_norm(a, gamma, beta, sa,
                                       num_groups=GROUPS, eps=EPS,
                                       act="silu")
        return conv_int8(h8)

    return x, {"xla_bf16": xla_bf16, "pallas_bf16": pallas_bf16,
               "xla_q8": xla_q8, "xla_producer_q8": xla_producer_q8,
               "pallas_q8": pallas_q8}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()

    report = {"batch": args.batch, "iters": args.iters, "levels": []}
    for spatial, c in LEVELS:
        x, cases = make_cases(args.batch, spatial, c)
        row = {"spatial": spatial, "channels": c}
        for name, f in cases.items():
            row[f"{name}_ms"] = round(time_chain(f, x, args.iters), 4)
        report["levels"].append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
