"""Trace-time inference-context flag for fused-kernel dispatch.

Some Pallas kernels are pure inference-path wins: the fused GEGLU
(ops/fused_geglu.py) beats XLA on the forward but cannot expose its
VMEM-resident [T, 2H] intermediate to autodiff, so a differentiated call
must either recompute (measured 117.2 img/s on the SD LoRA train step) or
save the intermediate from a plain XLA forward via custom_vjp (119.2) —
both worse than simply not dispatching the kernel in training (123.4,
BASELINE.md round-3). JAX offers no trace-time "am I being
differentiated?" predicate, so the sampling entry points declare it: every
sampler in diffusion/samplers.py runs its model calls under
``inference()``, and FeedForward only routes to the fused kernel when
``in_inference()`` is true. Training paths never set the flag and trace
the plain XLA program, whose autodiff is optimal.

Same contextvar-at-trace-time pattern as ops/quant.py `override`: the
flag is read while jit TRACES, so it composes with jit as long as the
context wraps the traced region (it does — the samplers themselves are
what gets traced). Re-jit after changing it outside a managed context.
"""

from __future__ import annotations

import contextlib
import contextvars

_INFERENCE: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "polyp_inference_mode", default=False)
_MULTI_DEVICE: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "polyp_multi_device_trace", default=False)


def in_inference() -> bool:
    """True while tracing under an `inference()` scope."""
    return _INFERENCE.get()


@contextlib.contextmanager
def inference():
    """Declare the enclosed trace region gradient-free, enabling
    inference-only fused kernels (usable inside jit — trace time)."""
    token = _INFERENCE.set(True)
    try:
        yield
    finally:
        _INFERENCE.reset(token)


def pallas_ok() -> bool:
    """May this trace dispatch Pallas kernels at all?

    False under `multi_device_trace()`: GSPMD has no partitioning rule
    for our pallas_calls, so on a >1-device mesh XLA would at best
    replicate their operands (an all-gather per kernel launch per layer)
    and at worst fail to partition — and no multi-chip TPU exists in this
    environment to validate either behavior. The mesh-aware entry points
    (pipeline samplers, sd_common train loops) set the flag so
    multi-device traces compile to pure-XLA programs, which the 8-device
    CPU equivalence tests DO prove out (tests/test_parallel_wiring.py).
    Single-device runs keep every kernel. Revisit with shard_map-wrapped
    kernels when multi-chip hardware is available."""
    return not _MULTI_DEVICE.get()


@contextlib.contextmanager
def multi_device_trace():
    """Declare the enclosed trace region mesh-partitioned (>1 device):
    Pallas kernel dispatch is disabled, XLA primitives only."""
    token = _MULTI_DEVICE.set(True)
    try:
        yield
    finally:
        _MULTI_DEVICE.reset(token)


def mesh_trace_scope(mesh):
    """`multi_device_trace()` when `mesh` spans more than one device,
    otherwise a no-op scope — the one-liner every mesh-aware entry point
    (pipeline samplers, CLI train loops) wraps its traced region in."""
    if mesh is not None and mesh.devices.size > 1:
        return multi_device_trace()
    return contextlib.nullcontext()
