"""W8A8 quantization for the diffusion sampling path.

The v5e MXU runs s8×s8→s32 at 2× its bf16 rate; measured on the SD UNet's
conv shapes the full chain (dynamic per-tensor activation quantization →
int8 conv → per-channel dequant epilogue) sustains 1.12–1.58× over bf16
(see BASELINE.md round-2 quantization section). This module provides the
functional ops; `models/unet_blocks.py` (QConv / dense dispatch) consumes
them.

Three trace-time modes (`override(...)`):

* ``"w8a8"`` — dynamic per-tensor activation scales (one amax reduction +
  one quantize pass per op). Round-2 census: ≈2.3 ms/UNet-step of pure
  overhead (1.6 ms clamp/convert re-read/write + 0.7 ms amax).
* ``"w8a8_static"`` — calibrated per-layer scales passed via
  ``override("w8a8_static", scales=...)``. The activation quantize becomes
  a scale-multiply+clamp+convert that XLA fuses into the producing
  GN/SiLU/conv fusion — no amax reduction and no standalone quantize pass,
  which is the int8 tax the round-2 census identified. Scale values may be
  floats (one scale per layer) or length-``num_train_timesteps`` tables
  (one scale per layer per diffusion timestep, indexed by the traced
  timestep passed as ``override(..., t=...)``). Tables exist because
  diffusion activation magnitudes swing across the trajectory: a single
  max-over-trajectory scale quantizes the small-magnitude timesteps
  coarsely (measured rel L2 0.35 vs 0.10 dynamic on the SD stack —
  BASELINE.md round-3 sweep), while a per-timestep lookup costs one tiny
  gather per layer per step and keeps the fused epilogue.
* ``"w8a8_calib"`` — calibration: ops run FULL precision while each
  quantizable layer sows its activation amax into the ``"quant_stats"``
  flax collection; `scales_from_stats` turns the collected tree into the
  scales dict for the static mode (max over calibration points).

`skip`/`only` select layers by path substring — the per-layer exclusion
knob for the sensitivity sweep (tools/quant_sensitivity.py): `skip`
excludes matching layers; `only` (when set) quantizes nothing BUT
matching layers.

Scope/semantics:
* **Trace-time mode.** `quantization()` is read while a model function is
  being traced, not per step. Re-jit after changing the mode — an
  already-compiled function keeps the mode it was traced with.
* **Inference only.** The rounding in the activation path has a zero
  gradient; trainers never enable the mode (and tests assert the default
  is off).
* Weights are quantized **in-graph** from the resident fp32 params
  (per-output-channel symmetric scales). Inside a sampling `lax.scan` the
  weight-quantization subgraph is loop-invariant and XLA hoists it out of
  the loop, so steady-state cost is the activation path only.
* Quality is workload-dependent and measured, not assumed: BASELINE.md
  records the fixed-seed image delta vs bf16 on the SD stack. The
  reference has no analogue (torch fp16 AMP only — config_diffusion.py:14);
  this is a TPU-native extra, default-off everywhere.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Literal, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Mode = Literal["w8a8", "w8a8_static", "w8a8_calib"] | None

_MODE: contextvars.ContextVar[Mode] = contextvars.ContextVar(
    "polyp_quantization_mode", default=None)
_SCALES: contextvars.ContextVar[Mapping[str, float] | None] = \
    contextvars.ContextVar("polyp_quantization_scales", default=None)
_T: contextvars.ContextVar[jax.Array | int | None] = contextvars.ContextVar(
    "polyp_quantization_t", default=None)
_SKIP: contextvars.ContextVar[tuple[str, ...]] = contextvars.ContextVar(
    "polyp_quantization_skip", default=())
_ONLY: contextvars.ContextVar[tuple[str, ...] | None] = contextvars.ContextVar(
    "polyp_quantization_only", default=None)

# don't quantize thin layers (conv_in 4→320, conv_out →4, tiny test models):
# no MXU win, pure accuracy noise.
MIN_QUANT_CHANNELS = 64

AMAX_SUFFIX = "/act_amax"  # sow name for calibration stats


def promoted_config(distilled: bool = False) -> dict | None:
    """The gate-passing quantization config, if one exists.

    `quant_gate.json` (package data, next to this module) vendors the
    measured go/no-go verdicts of tools/quant_sensitivity.py and the
    distilled-path fidelity probe (bench.py quant_rel_l2): a quant mode
    is promoted only when its fixed-seed image rel L2 vs bf16 beats
    GATE_REL_L2 AND it clears the throughput bar (BASELINE.md round-4
    quant gate). Two operating points carry separate verdicts —
    `promoted` for full-trajectory CFG sampling (25/50 steps; needs a
    bf16 head) and `promoted_distilled` for few-step folded-guidance
    sampling (the short trajectory quantizes cleanly with no head).
    Returns the dict (mode / quant_fp_head / quant_fp_tail / measured
    numbers) when `gate_pass` is true, else None. Demotion is DATA:
    delete the file or flip `gate_pass` — bench.py's headline and the
    `--quantize promoted` CLI surfaces all resolve through here, so the
    verdict travels with the package."""
    import json
    import pathlib

    p = pathlib.Path(__file__).resolve().parent / "quant_gate.json"
    key = "promoted_distilled" if distilled else "promoted"
    try:
        promo = json.loads(p.read_text())[key]
        return promo if promo.get("gate_pass") else None
    except Exception:
        return None


def resolve_quantize_arg(quantize: str | None, fp_head: int, fp_tail: int,
                         distilled: bool = False) -> tuple[str | None,
                                                           int, int]:
    """CLI helper: expand `--quantize promoted` into the concrete
    gate-passing (mode, fp_head, fp_tail) from `promoted_config()` —
    pass distilled=True on few-step folded-guidance paths so the
    distilled verdict (pure int8, no head) is used; explicit modes pass
    through untouched. Raises if promotion was requested but no config
    currently passes the gate."""
    if quantize != "promoted":
        return quantize, fp_head, fp_tail
    promo = promoted_config(distilled=distilled)
    if promo is None:
        raise SystemExit(
            "--quantize promoted: no gate-passing config exists "
            "(polyp_tpu/ops/quant_gate.json is absent or gate_pass is "
            "false) — pick an explicit mode (w8a8 | w8a8_static) or run "
            "tools/quant_sensitivity.py to re-judge")
    return (promo["mode"], int(promo.get("quant_fp_head", 0)),
            int(promo.get("quant_fp_tail", 0)))


def quantization() -> Mode:
    """The active quantization mode at trace time (None = full precision)."""
    return _MODE.get()


def calibrating() -> bool:
    return _MODE.get() == "w8a8_calib"


@contextlib.contextmanager
def override(mode: Mode, scales: Mapping[str, Any] | None = None,
             skip: Sequence[str] = (), only: Sequence[str] | None = None,
             t: jax.Array | int | None = None):
    """Set the quantization mode for a trace region (usable inside jit —
    it runs at trace time). `scales` is required for "w8a8_static";
    `skip`/`only` filter layers by path substring. `t` is the current
    diffusion timestep (traced scalar or [B] array — sampling uses a
    uniform timestep per batch, so the first element is taken); required
    when any scale value is a per-timestep table."""
    if mode not in (None, "w8a8", "w8a8_static", "w8a8_calib"):
        raise ValueError(f"unknown quantization mode: {mode!r}")
    if mode == "w8a8_static" and scales is None:
        raise ValueError("w8a8_static needs calibrated scales "
                         "(ops.quant.scales_from_stats); an empty dict is "
                         "allowed and leaves every layer full-precision")
    tokens = (_MODE.set(mode), _SCALES.set(scales),
              _SKIP.set(tuple(skip)), _ONLY.set(
                  tuple(only) if only is not None else None), _T.set(t))
    try:
        yield
    finally:
        for var, tok in zip((_MODE, _SCALES, _SKIP, _ONLY, _T), tokens):
            var.reset(tok)


def layer_selected(path: str | None) -> bool:
    """Does the skip/only filter allow quantizing this layer?"""
    if path is None:
        return _ONLY.get() is None and not _SKIP.get()
    only = _ONLY.get()
    if only is not None and not any(p in path for p in only):
        return False
    return not any(p in path for p in _SKIP.get())


def static_scale(path: str | None) -> jax.Array | None:
    """The calibrated activation scale for a layer (static mode only).

    Float values are returned as fp32 scalars. Sequence/array values are
    per-diffusion-timestep tables: the scale is gathered at the timestep
    set via ``override(..., t=...)`` — one scalar dynamic-slice that stays
    inside the producing fusion."""
    scales = _SCALES.get()
    if scales is None or path is None:
        return None
    val = scales.get(path)
    if val is None:
        return None
    if isinstance(val, (int, float)):
        return jnp.float32(val)
    table = jnp.asarray(val, jnp.float32)
    if table.ndim == 0:
        return table
    t = _T.get()
    if t is None:
        raise ValueError(
            "per-timestep static quantization scales need the current "
            "diffusion timestep: pass quant.override(..., t=t) where t is "
            "the (traced) timestep the model is being applied at")
    t_idx = jnp.asarray(t, jnp.int32).reshape(-1)[0]
    return table[jnp.clip(t_idx, 0, table.shape[0] - 1)]


def scales_from_stats(stats_trees: Sequence[Any],
                      margin: float = 1.0) -> dict[str, float]:
    """Fold one or more sown ``quant_stats`` collections (from calibration
    forwards under "w8a8_calib" with ``mutable=["quant_stats"]``) into the
    {layer_path: scale} dict the static mode consumes. Scale = max-over-
    points amax × margin / 127."""
    amax: dict[str, float] = {}
    for tree in stats_trees:
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for keypath, value in flat:
            parts = []
            for k in keypath:
                name = getattr(k, "key", None)
                if name is None:
                    continue  # tuple indices from sow's default accumulation
                parts.append(str(name))
            if not parts:
                continue
            leaf = parts[-1]
            if leaf == "act_amax":           # QConv: sown at the conv's scope
                path = "/".join(parts[:-1])
            elif leaf.endswith(".act_amax"):  # dense: "<proj_name>.act_amax"
                path = "/".join(parts[:-1] + [leaf[: -len(".act_amax")]])
            else:
                continue
            v = float(jnp.max(jnp.asarray(value)))
            amax[path] = max(amax.get(path, 0.0), v)
    return {p: max(v * margin, 1e-12) / 127.0 for p, v in amax.items()}


def scale_tables_from_stats(points: Sequence[tuple[int, Sequence[Any]]],
                            num_train_timesteps: int,
                            margin: float = 1.0) -> dict[str, list[float]]:
    """Fold per-timestep calibration stats into per-layer, per-timestep
    scale TABLES for the static mode.

    `points` is [(t, stats_trees_at_t), ...] — each entry the sown
    ``quant_stats`` collections observed at diffusion timestep `t` (both
    CFG branches belong in the same entry: sampling batches them into one
    activation tensor, so the scale must cover their union). Scales
    between calibration points are linearly interpolated over the full
    [0, num_train_timesteps) range; the result is JSON-serializable
    ({path: [T floats]}) for the disk cache."""
    if not points:
        return {}
    per_point: list[tuple[int, dict[str, float]]] = [
        (int(t), scales_from_stats(trees, margin)) for t, trees in points]
    per_point.sort(key=lambda p: p[0])
    ts = np.asarray([t for t, _ in per_point], np.float64)
    paths = set().union(*(d.keys() for _, d in per_point))
    tables: dict[str, list[float]] = {}
    grid = np.arange(num_train_timesteps, dtype=np.float64)
    for path in sorted(paths):
        # a path missing at some point (layer inactive there) falls back to
        # the max over the points where it WAS seen — conservative
        fallback = max(d[path] for _, d in per_point if path in d)
        vals = np.asarray([d.get(path, fallback) for _, d in per_point])
        tables[path] = np.interp(grid, ts, vals).tolist()
    return tables


@jax.custom_vjp
def _inference_only(x: jax.Array) -> jax.Array:
    """Identity that REFUSES differentiation: the activation rounding below
    has a zero gradient, so a quantized train step would silently learn
    nothing. Failing at backward-trace time turns that hazard into an
    immediate, explicit error."""
    return x


def _inference_only_fwd(x):
    return x, None


def _inference_only_bwd(_, g):
    raise NotImplementedError(
        "w8a8 quantization is inference-only (zero gradient through int8 "
        "rounding); disable quant.override(...) for training")


_inference_only.defvjp(_inference_only_fwd, _inference_only_bwd)


def quantize_weight(w: jax.Array,
                    reduce_axes: Sequence[int]) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a weight tensor.
    `reduce_axes` are the non-output axes (e.g. (0,1,2) for HWIO conv
    kernels, (0,) for [in,out] dense kernels). Returns (int8 weights,
    fp32 scales broadcast-shaped like w with output axes kept)."""
    w32 = _inference_only(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=tuple(reduce_axes), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _quantize_activation(x: jax.Array, scale: jax.Array | None = None
                         ) -> tuple[jax.Array, jax.Array]:
    """int8 activation quantization. With `scale` (static mode) this is one
    fusable elementwise chain; without, the scale comes from the live
    max-abs (one VPU reduction + a standalone quantize pass per op)."""
    x = _inference_only(x)
    if scale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                  ).astype(jnp.int8)
    return xq, scale


def w8a8_conv(x: jax.Array, kernel: jax.Array,
              strides: Sequence[int], padding,
              out_dtype: jnp.dtype,
              act_scale: jax.Array | None = None) -> jax.Array:
    """int8 NHWC/HWIO conv with dynamic or static activation scale and
    per-output-channel weight scales; returns `out_dtype` (bias NOT
    applied). An int8 `x` is a producer-side pre-quantized activation
    (the fused-GN handoff, models/unet_blocks.py): `act_scale` is then
    required — it is the scale the producer quantized with — and the
    activation-quantize step is skipped."""
    wq, sw = quantize_weight(kernel, (0, 1, 2))  # sw: [1,1,1,O]
    if x.dtype == jnp.int8:
        if act_scale is None:
            raise ValueError("pre-quantized int8 conv input needs its "
                             "activation scale")
        xq, sa = x, jnp.asarray(act_scale, jnp.float32)
    else:
        xq, sa = _quantize_activation(x, act_scale)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xq, wq, tuple(strides), padding,
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sa * sw.reshape(1, 1, 1, -1))
            ).astype(out_dtype)


def w8a8_dense(x: jax.Array, kernel: jax.Array,
               out_dtype: jnp.dtype,
               act_scale: jax.Array | None = None) -> jax.Array:
    """int8 [..., in] @ [in, out] with dynamic or static activation scale
    and per-output-channel weight scales; returns `out_dtype` (no bias)."""
    wq, sw = quantize_weight(kernel, (0,))  # sw: [1, O]
    xq, sa = _quantize_activation(x, act_scale)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sa * sw.reshape(1, -1))).astype(out_dtype)


def _quantizable(cin: int, cout: int, path: str | None) -> bool:
    mode = quantization()
    if mode not in ("w8a8", "w8a8_static"):
        return False
    if min(cin, cout) < MIN_QUANT_CHANNELS:
        return False
    if not layer_selected(path):
        return False
    if mode == "w8a8_static" and static_scale(path) is None:
        # no calibration record for this layer → stay full precision
        return False
    return True


def conv_quantizable(cin: int, cout: int, path: str | None = None) -> bool:
    return _quantizable(cin, cout, path)


def dense_quantizable(cin: int, cout: int, path: str | None = None) -> bool:
    return _quantizable(cin, cout, path)


def maybe_quantized_dense(x: jax.Array, kernel: jax.Array,
                          bias: jax.Array | None,
                          dtype: jnp.dtype,
                          path: str | None = None) -> jax.Array:
    """Dense matmul that honours the active quantization mode; numerically
    identical to `x @ kernel.astype(dtype) (+ bias)` when the mode is off
    or the layer is too thin to pay."""
    cin, cout = kernel.shape
    if dense_quantizable(cin, cout, path):
        scale = static_scale(path)
        if scale is not None and quantization() == "w8a8_static":
            # static-scale sampling path: the fused Pallas kernel
            # quantizes the activation in VMEM, killing the standalone
            # clamp/convert pass (ops/fused_dense.py; inference-scoped —
            # the quantized modes are sampling-only anyway, but the
            # scope keeps any future differentiable caller on XLA)
            from polyp_tpu.ops import dispatch, fused_dense
            if (dispatch.in_inference() and dispatch.pallas_ok()
                    and fused_dense.supported(x, kernel)):
                return fused_dense.w8a8_dense_fused(
                    x.astype(dtype), kernel.astype(dtype),
                    None if bias is None else bias.astype(dtype), scale)
        y = w8a8_dense(x, kernel, dtype, scale)
    else:
        y = x.astype(dtype) @ kernel.astype(dtype)
    return y + bias.astype(dtype) if bias is not None else y
