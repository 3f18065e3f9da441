"""Attention dispatch: one entry point for every attention in the framework.

All UNet/VAE/CLIP attention calls route through `dot_product_attention`, so
swapping in the Pallas flash kernel (ops/flash_attention.py) is a one-line
policy change rather than a model edit. Default path is XLA's fused
attention, which is already MXU-tiled; the Pallas kernel wins at larger
latent grids (see SURVEY §7 "hard parts").
"""

from __future__ import annotations

import os
from typing import Literal

import jax

_BACKEND = os.environ.get("POLYP_ATTENTION_BACKEND", "auto")


def set_attention_backend(name: Literal["auto", "xla", "pallas"]) -> None:
    global _BACKEND
    _BACKEND = name


def use_fused_mha(x: jax.Array, ctx: jax.Array, num_heads: int,
                  head_dim: int, qkv_bias: bool,
                  is_self: bool = True) -> bool:
    """Policy: route a whole attention block (projections included) through
    the fused Pallas MHA kernel (ops/fused_mha.py). OFF by default
    (opt in with POLYP_FUSED_MHA=1): at SD level-0 shapes the kernel only
    matches the tuned flash path (1428 vs 1443 µs block microbench) and is
    slightly slower end-to-end (6.54 vs 6.64 samples/s) — the BTHD copies
    it was built to eliminate were already removed by the round-2 flash
    block tuning, and its per-head (C×64) projections run at lower MXU
    occupancy than XLA's single (C×C) dots. Kept as a validated op for
    shapes where standalone-flash pre/post copies reappear.

    **Trace-time flag** (same contract as quant.override): POLYP_FUSED_MHA
    and set_attention_backend are read while the model function is being
    traced — a function jitted before the flag changed keeps the dispatch
    it was traced with; re-jit (or clear jax caches) after changing it."""
    if _BACKEND == "xla" or os.environ.get("POLYP_FUSED_MHA", "0") != "1":
        return False
    from polyp_tpu.ops import dispatch
    if not dispatch.pallas_ok():  # multi-device trace: XLA only
        return False
    if not is_self:
        # cross-attention (77-token KV) executes MORE in-kernel FLOPs than
        # the XLA path saves in copies (per-head K/V/out projections run at
        # half MXU occupancy) — measured slower; XLA keeps it.
        return False
    from polyp_tpu.ops import fused_mha as fm
    from polyp_tpu.ops import quant
    if quant.quantization() is not None:
        # w8a8 mode: the unfused path quantizes the projections; the fused
        # kernel is bf16-only and would silently bypass the mode.
        return False
    return fm.supported(x, ctx, num_heads, head_dim, qkv_bias)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: jax.Array | None = None,
                          is_causal: bool = False) -> jax.Array:
    """Scaled dot-product attention over [N, T, H, D] tensors (BTHD layout,
    matching jax.nn.dot_product_attention)."""
    backend = _BACKEND
    if backend in ("auto", "pallas"):
        from polyp_tpu.ops import dispatch
        from polyp_tpu.ops import flash_attention as fa
        if (dispatch.pallas_ok()  # multi-device trace: XLA only
                and fa.supported(q, k, v, mask, is_causal)
                and (backend == "pallas" or fa.profitable(q, k, v))):
            return fa.flash_attention(q, k, v, is_causal=is_causal)
    return jax.nn.dot_product_attention(q, k, v, mask=mask, is_causal=is_causal)
