"""Activation-scale calibration for W8A8-static quantized sampling.

The round-2 profile census charged ≈2.3 ms/UNet-step to DYNAMIC activation
quantization (a standalone amax reduction + clamp/convert pass per
quantized op). With calibrated static scales the quantize collapses into
the producing fusion's epilogue (ops/quant.py "w8a8_static"). This module
produces those scales: it runs a short full-precision DDIM trajectory —
the same activation distribution sampling sees, across the timestep range
— under quant's "w8a8_calib" mode, which makes every quantizable layer sow
its live activation amax into the "quant_stats" flax collection; the
per-layer max over all trajectory points (± margin) becomes the scale.

The reference has no analogue (no quantization at all); this is a
TPU-native extra, consumed by the sampling CLIs via
``--quantize w8a8_static``.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from polyp_tpu.diffusion.schedule import DiffusionSchedule
from polyp_tpu.ops import quant


# bump when the scales payload shape changes (v2: per-timestep tables)
CACHE_FORMAT = 2


def cached_scales(cache_path: str | Path | None,
                  compute, fingerprint: str) -> dict:
    """Disk-cache wrapper for calibration: compiling + driving the
    calibration forwards costs minutes on the 860M UNet, while the result
    is a ~256-entry dict — persist it keyed by a caller-supplied
    fingerprint (weights/config digest) and reuse."""
    if cache_path is None:
        return compute()
    cache_path = Path(cache_path)
    if cache_path.exists():
        try:
            payload = json.loads(cache_path.read_text())
            if (payload.get("fingerprint") == fingerprint
                    and payload.get("format") == CACHE_FORMAT):
                return payload["scales"]
        except Exception:
            pass  # unreadable cache → recompute
    scales = compute()
    cache_path.parent.mkdir(parents=True, exist_ok=True)
    cache_path.write_text(json.dumps(
        {"fingerprint": fingerprint, "format": CACHE_FORMAT,
         "scales": scales}))
    return scales


def params_fingerprint(params, *extra: object) -> str:
    """Cheap content fingerprint for a param pytree: leaf paths/shapes plus
    one fp32 sum per leaf, computed in a single jitted reduction (one
    device round-trip — full-leaf host fetches would move GBs through the
    tunnel). NOT a cryptographic hash — calibration tolerance makes
    collisions across genuinely different checkpoints irrelevant unless
    shapes AND per-leaf sums match."""
    h = hashlib.sha256()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, leaf in flat:
        h.update(str(keypath).encode())
        h.update(str(jnp.shape(leaf)).encode())

    @jax.jit
    def leaf_sums(leaves):
        return jnp.stack([jnp.sum(x.astype(jnp.float32)) for x in leaves])

    sums = np.asarray(jax.device_get(leaf_sums([l for _, l in flat])))
    h.update(np.ascontiguousarray(sums, np.float32).tobytes())
    for e in extra:
        h.update(str(e).encode())
    return h.hexdigest()[:24]


def default_scales_cache(fingerprint: str) -> Path:
    """Per-checkpoint cache file for calibrated scales (override root with
    POLYP_QUANT_CACHE)."""
    import os
    root = Path(os.environ.get(
        "POLYP_QUANT_CACHE", str(Path.home() / ".cache" / "polyp_tpu")))
    return root / f"quant_scales_{fingerprint}.json"


def ensure_scales(unet, params, schedule, latent_shape,
                  cond=None, uncond=None, *, num_steps: int = 8,
                  guidance_scale: float | None = 7.5,
                  fingerprint_extras: tuple = (), mesh=None) -> dict:
    """The one-stop w8a8_static scale bootstrap every entry point shares:
    fingerprint the checkpoint → hit the disk cache → calibrate on miss.

    `mesh` matters for correctness, not just placement: samplers calibrate
    AFTER their params are mesh-sharded (Megatron TP or replicated), and a
    calibration trace over sharded params is a multi-device GSPMD program —
    Pallas kernel dispatch must be off for it exactly as for the sampling
    traces (ops/dispatch.pallas_ok rationale), so the calibration forwards
    run under `mesh_trace_scope(mesh)`."""
    from polyp_tpu.ops import dispatch

    fp = params_fingerprint(params, *fingerprint_extras)

    def _calibrate():
        with dispatch.mesh_trace_scope(mesh):
            return calibrate_unet_scales(
                unet, params, schedule, latent_shape, cond, uncond,
                num_steps=num_steps, guidance_scale=guidance_scale)

    return cached_scales(default_scales_cache(fp), _calibrate, fp)


def calibrate_unet_scales(
    unet,
    params,
    schedule: DiffusionSchedule,
    latent_shape: tuple[int, ...],
    cond: jax.Array | None = None,
    uncond: jax.Array | None = None,
    key: jax.Array | None = None,
    num_steps: int = 8,
    guidance_scale: float | None = 7.5,
    margin: float = 1.05,
    dtype=jnp.bfloat16,
    per_timestep: bool = True,
) -> dict:
    """Per-layer activation scales for quant.override("w8a8_static").

    Drives `unet` (a Flax module) along a `num_steps`-point DDIM
    trajectory from pure noise, collecting each quantizable layer's
    activation amax at every point (conditional AND unconditional branch
    when `uncond` is given — CFG runs both; `cond=None` drives an
    unconditional pixel model). `margin` head-rooms the observed amax;
    values beyond it saturate to ±127, which int8 tolerates gracefully
    for rare outliers.

    `per_timestep=True` (default) returns per-layer scale TABLES indexed
    by diffusion timestep ({path: [num_train_timesteps floats]}, linear
    interpolation between trajectory points) — activation magnitudes swing
    across the trajectory, and a single max-over-trajectory scale measured
    3.7× worse image fidelity than per-timestep tables on the SD stack
    (BASELINE.md round-3 sweep). Consumers must then pass the traced
    timestep: ``quant.override("w8a8_static", scales=..., t=t)``.
    `per_timestep=False` keeps the flat max-over-trajectory floats."""
    key = key if key is not None else jax.random.PRNGKey(0)
    if cond is not None:
        dtype = cond.dtype
    n = latent_shape[0]
    # guidance_scale=None = guidance folded into the model (a distilled
    # student, with_cfg(None)): it never runs an uncond branch, so neither
    # does its calibration
    if guidance_scale is None:
        uncond = None

    @jax.jit
    def calib_fwd(params, x, t, ctx):
        with quant.override("w8a8_calib"):
            args = (x, t) if ctx is None else (x, t, ctx)
            out, variables = unet.apply({"params": params}, *args,
                                        mutable=["quant_stats"])
        return out, variables["quant_stats"]

    def bcast(emb):
        return (None if emb is None
                else jnp.broadcast_to(emb, (n,) + emb.shape[-2:]))

    T = schedule.num_train_timesteps
    ts = np.unique(np.linspace(T - 1, 0, num_steps).round().astype(np.int64))[::-1]
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    x = jax.random.normal(key, latent_shape, dtype)

    points: list[tuple[int, list]] = []
    for i, t in enumerate(ts):
        tt = jnp.full((n,), int(t), jnp.int32)
        point_stats = []
        eps_c, s = calib_fwd(params, x, tt, bcast(cond))
        point_stats.append(s)
        if uncond is not None:
            eps_u, s = calib_fwd(params, x, tt, bcast(uncond))
            point_stats.append(s)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        else:
            eps = eps_c
        points.append((int(t), point_stats))
        if i + 1 < len(ts):
            # deterministic DDIM move to the next calibration timestep
            a_t, a_n = abar[int(t)], abar[int(ts[i + 1])]
            out32 = eps.astype(jnp.float32)
            x32 = x.astype(jnp.float32)
            if schedule.prediction_type == "v_prediction":
                # ε = √ᾱ·v + √(1−ᾱ)·x_t — a v-head student's output is
                # not ε; treating it as such would walk a garbage
                # trajectory and calibrate the wrong activation ranges
                out32 = (np.sqrt(a_t) * out32 + np.sqrt(1.0 - a_t) * x32)
            x0 = (x32 - np.sqrt(1.0 - a_t) * out32) / np.sqrt(a_t)
            x = (np.sqrt(a_n) * x0
                 + np.sqrt(1.0 - a_n) * out32).astype(dtype)
    if per_timestep:
        return quant.scale_tables_from_stats(points, T, margin)
    return quant.scales_from_stats(
        [s for _, ps in points for s in ps], margin)
