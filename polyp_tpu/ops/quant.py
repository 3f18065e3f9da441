"""W8A8 dynamic quantization for the diffusion sampling path.

The v5e MXU runs s8×s8→s32 at 2× its bf16 rate; measured on the SD UNet's
conv shapes the full chain (dynamic per-tensor activation quantization →
int8 conv → per-channel dequant epilogue) sustains 1.12–1.58× over bf16
(see BASELINE.md round-2 quantization section). This module provides the
functional ops; `models/unet_blocks.py` (QConv / dense dispatch) consumes
them.

Scope/semantics:
* **Trace-time mode.** `quantization()` is read while a model function is
  being traced, not per step. Enable it for exactly the region you want
  quantized, e.g.::

      def unet_fn(params, x, t, ctx):
          with override("w8a8"):
              return unet.apply({"params": params}, x, t, ctx)

  Re-jit after changing the mode — an already-compiled function keeps the
  mode it was traced with.
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
from typing import Literal, Sequence

import jax
import jax.numpy as jnp

Mode = Literal["w8a8"] | None

_MODE: contextvars.ContextVar[Mode] = contextvars.ContextVar(
    "polyp_quantization_mode", default=None)

# don't quantize thin layers (conv_in 4→320, conv_out →4, tiny test models):
# no MXU win, pure accuracy noise.
MIN_QUANT_CHANNELS = 64


def quantization() -> Mode:
    """The active quantization mode at trace time (None = full precision)."""
    return _MODE.get()


@contextlib.contextmanager
def override(mode: Mode):
    """Set the quantization mode for a trace region (usable inside jit —
    it runs at trace time)."""
    if mode not in (None, "w8a8"):
        raise ValueError(f"unknown quantization mode: {mode!r}")
    token = _MODE.set(mode)
    try:
        yield
    finally:
        _MODE.reset(token)


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


def _quantize_activation(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-tensor symmetric int8 quantization (scale from the live
    max-abs — one cheap VPU reduction per op)."""
    x = _inference_only(x)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                  ).astype(jnp.int8)
    return xq, scale


def w8a8_conv(x: jax.Array, kernel: jax.Array,
              strides: Sequence[int], padding,
              out_dtype: jnp.dtype) -> jax.Array:
    """int8 NHWC/HWIO conv with dynamic activation scale and per-output-
    channel weight scales; returns `out_dtype` (bias NOT applied)."""
    wq, sw = quantize_weight(kernel, (0, 1, 2))  # sw: [1,1,1,O]
    xq, sa = _quantize_activation(x)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xq, wq, tuple(strides), padding,
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sa * sw.reshape(1, 1, 1, -1))
            ).astype(out_dtype)


def w8a8_dense(x: jax.Array, kernel: jax.Array,
               out_dtype: jnp.dtype) -> jax.Array:
    """int8 [..., in] @ [in, out] with dynamic activation scale and
    per-output-channel weight scales; returns `out_dtype` (no bias)."""
    wq, sw = quantize_weight(kernel, (0,))  # sw: [1, O]
    xq, sa = _quantize_activation(x)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sa * sw.reshape(1, -1))).astype(out_dtype)


def conv_quantizable(cin: int, cout: int) -> bool:
    return (quantization() == "w8a8"
            and min(cin, cout) >= MIN_QUANT_CHANNELS)


def dense_quantizable(cin: int, cout: int) -> bool:
    return (quantization() == "w8a8"
            and min(cin, cout) >= MIN_QUANT_CHANNELS)


def maybe_quantized_dense(x: jax.Array, kernel: jax.Array,
                          bias: jax.Array | None,
                          dtype: jnp.dtype) -> jax.Array:
    """Dense matmul that honours the active quantization mode; numerically
    identical to `x @ kernel.astype(dtype) (+ bias)` when the mode is off
    or the layer is too thin to pay."""
    cin, cout = kernel.shape
    if dense_quantizable(cin, cout):
        y = w8a8_dense(x, kernel, dtype)
    else:
        y = x.astype(dtype) @ kernel.astype(dtype)
    return y + bias.astype(dtype) if bias is not None else y
