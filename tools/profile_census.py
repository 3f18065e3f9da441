"""Op-level census of the SD UNet step on TPU: trace a chained UNet scan
with jax.profiler, then summarize device-op time from the perfetto JSON.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_census.py [w8a8]

(The tensorboard_plugin_profile converter is broken against this image's
TF, so the summary parses the trace.json.gz directly — op names bucketed
by HLO kind.)  This produced the BASELINE.md round-2 census tables.

Timing rules for the tunneled chip (see .claude/skills/verify/SKILL.md):
chain iterations in one executable, fresh input per timed call, sync via a
device_get of a scalar reduction.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def summarize(trace_json_gz: str, top: int = 20) -> None:
    with gzip.open(trace_json_gz, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n}
    tot: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        base = re.split(r"[.\d]", e.get("name", ""))[0]
        tot[base] += e.get("dur", 0) / 1e3
        cnt[base] += 1
    total = sum(tot.values())
    print(f"total device time: {total:.2f} ms over {sum(cnt.values())} ops")
    for k, v in tot.most_common(top):
        print(f"  {k:40s} {v:9.2f} ms  ({cnt[k]} ops)")


def main() -> None:
    from polyp_tpu.models import sd14_unet
    from polyp_tpu.ops import quant

    mode = sys.argv[1] if len(sys.argv) > 1 else None
    mode = None if mode in (None, "none") else mode
    dtype = jnp.bfloat16
    batch, latent, iters = 16, 32, 10

    unet = sd14_unet(dtype=dtype)
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (batch, latent, latent, 4), dtype)
    t = jnp.full((batch,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(key, 1),
                            (batch, 77, 768), dtype)
    params = jax.jit(unet.init)({"params": jax.random.PRNGKey(1)},
                                lat[:1], t[:1], ctx[:1])["params"]

    scales = None
    if mode == "w8a8_static":
        from polyp_tpu.diffusion import DiffusionSchedule
        from polyp_tpu.diffusion.calibrate import ensure_scales
        sched = DiffusionSchedule.create(1000, "scaled_linear",
                                         0.00085, 0.012)
        scales = ensure_scales(unet, params, sched, (2, latent, latent, 4),
                               ctx[:1], jnp.zeros_like(ctx[:1]),
                               fingerprint_extras=(latent * 8, 1000))

    from polyp_tpu.ops import dispatch

    @jax.jit
    def chain(params, lat, t, ctx):
        # inference scope: match the production sampling trace (the
        # samplers set it — it enables the fused GEGLU kernels)
        def body(h, _):
            with dispatch.inference(), \
                    quant.override(mode, scales=scales, t=t):
                eps = unet.apply({"params": params}, h, t, ctx)
            return (h * 0.98 + eps.astype(h.dtype) * 0.01).astype(h.dtype), None
        h, _ = jax.lax.scan(body, lat, None, length=iters)
        return jnp.mean(h.astype(jnp.float32))

    float(jax.device_get(chain(params, lat, t, ctx)))  # compile + warmup
    logdir = f"/tmp/prof_{mode or 'bf16'}"
    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        float(jax.device_get(chain(params, lat + 0.001, t, ctx)))
        wall = time.perf_counter() - t0
    print(f"mode={mode or 'bf16'}  per UNet step (CFG batch {batch}): "
          f"{wall / iters * 1e3:.2f} ms")
    latest = max(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    summarize(latest)


if __name__ == "__main__":
    main()
