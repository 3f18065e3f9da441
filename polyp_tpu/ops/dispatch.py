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
