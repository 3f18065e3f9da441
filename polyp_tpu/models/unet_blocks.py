"""Shared UNet building blocks (Flax, NHWC, bf16-friendly).

These implement the architecture family behind both reference generator
models — the scratch `UNet2DModel` (PolypGeneratorModel.py:25-48) and the
SD-v1-4 `UNet2DConditionModel` / `AutoencoderKL` (PolypGeneratorModel.py:17-22)
— as TPU-idiomatic modules: NHWC convs (MXU-native layout), fp32 GroupNorm
statistics with bf16 activations, attention routed through
polyp_tpu.ops.dot_product_attention (Pallas-swappable), and parameter names
(`to_q/to_k/to_v/to_out`, `proj_in/proj_out`, `ff_net_0_proj/ff_net_2`,
`time_emb_proj`) chosen so LoRA target-module presets address the same
surfaces as the reference's PEFT configs (config_diffusion.py:34-37).
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from polyp_tpu.ops import dot_product_attention, group_norm
from polyp_tpu.ops import quant


def sinusoidal_time_embedding(timesteps: jax.Array, dim: int,
                              max_period: float = 10000.0,
                              flip_sin_to_cos: bool = True,
                              downscale_freq_shift: float = 0.0) -> jax.Array:
    """Transformer sinusoidal embedding of integer timesteps → [N, dim]
    (diffusers `Timesteps` parity: half exp-spaced freqs, sin‖cos, optional
    flip)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Sinusoidal → MLP (Linear-SiLU-Linear) time embedding."""

    base_dim: int
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        emb = sinusoidal_time_embedding(timesteps, self.base_dim)
        emb = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(
            emb.astype(self.dtype))
        emb = nn.silu(emb)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(emb)


class GroupNorm(nn.Module):
    """Thin param wrapper around ops.group_norm (functional core, fusable).

    Inference traces route through the one-pass Pallas kernel
    (ops/fused_gn.py) when the shape qualifies and POLYP_FUSED_GN=1
    (opt-in until the chip A/B lands; trace-time flag — re-jit after
    changing, like POLYP_FUSED_GEGLU).

    `quantize_scale` (w8a8_static producer-side handoff): when the CALLER
    knows the consuming quantized conv's calibrated activation scale
    (ResnetBlock does — it owns both the norm and the conv), passing it
    here makes the GN emit the int8 activation directly, so the conv reads
    int8 from HBM instead of re-quantizing a bf16 tensor on every read
    (the round-3 "conv-side int8 tax"). Output dtype is int8 iff
    `quantize_scale` is given, via the kernel or an equivalent XLA chain.
    """

    num_groups: int = 32
    eps: float = 1e-5
    act: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 quantize_scale: jax.Array | None = None) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        from polyp_tpu.ops import dispatch, fused_gn
        # default OFF until the chip A/B lands (measure-then-enable — the
        # per-dense fused-quantize lesson, BASELINE.md round-3 change 5)
        if (dispatch.in_inference() and dispatch.pallas_ok()
                and os.environ.get("POLYP_FUSED_GN", "0") != "0"
                and fused_gn.supported(x, self.num_groups,
                                       quantize=quantize_scale is not None)):
            return fused_gn.group_norm_fused(x, scale, bias, quantize_scale,
                                             self.num_groups, self.eps,
                                             self.act)
        y = group_norm(x, scale, bias, self.num_groups, self.eps, self.act)
        if quantize_scale is not None:
            # XLA producer-side quantize: the exact consumer-side chain
            # (inference-only — quant's refusing custom_vjp guards it),
            # fused by XLA into the GN-apply pass
            y = quant._quantize_activation(y, quantize_scale)[0]
        return y


class QConv(nn.Module):
    """`nn.Conv`-equivalent NHWC conv (identical param tree, init, and
    full-precision numerics) that additionally honours ops.quant's
    trace-time W8A8 mode: when enabled — and the layer is wide enough to
    pay (min channel ≥ quant.MIN_QUANT_CHANNELS) — it runs the s8×s8→s32
    MXU path with dynamic activation scales. Used for every hot conv in
    the UNet/VAE block family; callers opt in per trace region via
    `quant.override("w8a8")` (the samplers wrap only the UNet forward)."""

    features: int
    kernel_size: tuple[int, int]
    strides: int | tuple[int, int] = 1
    # str ("SAME"/"VALID") or per-spatial-dim (lo, hi) pairs, e.g.
    # [(1, 1), (1, 1)] — the list-of-pairs form Downsample2D passes.
    padding: str | Sequence[tuple[int, int]] = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        strides = ((self.strides, self.strides)
                   if isinstance(self.strides, int) else tuple(self.strides))
        padding = (self.padding if isinstance(self.padding, str)
                   else [tuple(p) for p in self.padding])
        path = "/".join(self.scope.path)
        if x.dtype == jnp.int8:
            # producer-side w8a8_static handoff (ResnetBlock → GroupNorm
            # quantize epilogue): x is already clip(round(h/scale)) with
            # THIS conv's calibrated scale. The caller guarantees the
            # scale identity (it fetched quant.static_scale(path) for this
            # very path before quantizing).
            scale = quant.static_scale(path)
            if scale is None:
                raise ValueError(
                    f"int8 input reached conv {path} without a calibrated "
                    "static scale — producer-side quantize out of sync")
            y = quant.w8a8_conv(x, kernel, strides, padding, self.dtype,
                                scale)
            return y + bias.astype(y.dtype)
        if quant.calibrating() and min(cin, self.features) >= quant.MIN_QUANT_CHANNELS:
            self.sow("quant_stats", "act_amax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     init_fn=lambda: jnp.float32(0.0), reduce_fn=jnp.maximum)
        if quant.conv_quantizable(cin, self.features, path):
            scale = quant.static_scale(path)
            nopad = (padding in ("SAME", "VALID")  # no-op for 1×1
                     or all(tuple(p) == (0, 0) for p in padding))
            if (scale is not None
                    and quant.quantization() == "w8a8_static"
                    and kh == kw == 1 and strides == (1, 1) and nopad):
                # a 1×1 stride-1 conv IS a dense over [N·H·W, C]
                # (proj_in/proj_out/conv_shortcut): route it through the
                # fused in-VMEM-quantize kernel like the attention
                # projections (ops/fused_dense.py; inference-scoped)
                from polyp_tpu.ops import dispatch, fused_dense
                flat = x.reshape(-1, cin)
                if (dispatch.in_inference() and dispatch.pallas_ok()
                        and fused_dense.supported(flat, kernel[0, 0])):
                    y = fused_dense.w8a8_dense_fused(
                        flat.astype(self.dtype),
                        kernel[0, 0].astype(self.dtype), None, scale
                    ).reshape(*x.shape[:-1], self.features)
                    return y + bias.astype(y.dtype)
            y = quant.w8a8_conv(x, kernel, strides, padding, self.dtype,
                                scale)
        else:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), strides,
                padding, dimension_numbers=dn)
        return y + bias.astype(y.dtype)


def _handoff_scale(module: nn.Module, conv_name: str,
                   cin: int, cout: int) -> jax.Array | None:
    """The consuming conv's calibrated w8a8_static activation scale — when
    set, the GroupNorm feeding that conv quantizes its own output
    (producer-side int8 handoff: half the GN→conv HBM traffic, no quantize
    arithmetic in the conv fusion). Opt-in with POLYP_GN_Q8=1 until the
    chip A/B lands (trace-time flag; measure-then-enable)."""
    if (quant.quantization() != "w8a8_static"
            or os.environ.get("POLYP_GN_Q8", "0") == "0"):
        return None
    path = "/".join((*module.scope.path, conv_name))
    if not quant.conv_quantizable(cin, cout, path):
        return None
    return quant.static_scale(path)


class ResnetBlock2D(nn.Module):
    """GN+SiLU+Conv ×2 with additive time embedding and 1×1 skip projection —
    the UNet workhorse (the Pallas fusion target for GN+SiLU+conv)."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def _handoff_scale(self, cin: int, conv_name: str) -> jax.Array | None:
        return _handoff_scale(self, conv_name, cin, self.out_channels)

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        residual = x
        s1 = self._handoff_scale(x.shape[-1], "conv1")
        h = GroupNorm(self.groups, self.eps, act="silu", name="norm1")(
            x, quantize_scale=s1)
        h = QConv(self.out_channels, (3, 3), padding="SAME",
                  dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        # the int8 handoff skips the (identity) inference dropout; training
        # never quantizes, so the non-deterministic path is unreachable
        s2 = (self._handoff_scale(self.out_channels, "conv2")
              if deterministic else None)
        h = GroupNorm(self.groups, self.eps, act="silu", name="norm2")(
            h, quantize_scale=s2)
        if s2 is None:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = QConv(self.out_channels, (3, 3), padding="SAME",
                  dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = QConv(self.out_channels, (1, 1), dtype=self.dtype,
                             name="conv_shortcut")(residual)
        return h + residual


class _ProjParams(nn.Module):
    """Declares a Dense projection's parameters (same tree/init/shapes as
    nn.Dense: `<name>/kernel` [+ `<name>/bias`]) without applying it, so
    Attention can hand raw kernels to the fused Pallas MHA kernel while
    keeping checkpoint/importer/LoRA-surgery compatibility."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array | None]:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class Attention(nn.Module):
    """Multi-head attention with SD naming (to_q/to_k/to_v/to_out). Works as
    self-attention (context=None) or cross-attention over encoder states.

    Two execution paths over the SAME parameters:
    * fused Pallas MHA kernel (ops/fused_mha.py) — projections + blockwise
      softmax + output projection in one kernel, avoiding the BTHD layout
      copies XLA inserts around a standalone attention custom-call;
    * unfused — Dense-equivalent matmuls + ops.dot_product_attention
      (which itself dispatches XLA vs the standalone flash kernel).
    """

    num_heads: int
    head_dim: int
    out_features: int | None = None
    qkv_bias: bool = False  # SD UNet: False; SD VAE attention: True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array | None = None) -> jax.Array:
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        out_features = self.out_features or x.shape[-1]
        wq, bq = _ProjParams(x.shape[-1], inner, self.qkv_bias, name="to_q")()
        wk, bk = _ProjParams(ctx.shape[-1], inner, self.qkv_bias, name="to_k")()
        wv, bv = _ProjParams(ctx.shape[-1], inner, self.qkv_bias, name="to_v")()
        wo, bo = _ProjParams(inner, out_features, True, name="to_out")()

        x = x.astype(self.dtype)
        ctx = ctx.astype(self.dtype)
        from polyp_tpu.ops import attention as _policy
        if _policy.use_fused_mha(x, ctx, self.num_heads, self.head_dim,
                                 self.qkv_bias, is_self=context is None):
            from polyp_tpu.ops.fused_mha import fused_mha
            out = fused_mha(x, ctx, wq, wk, wv, wo,
                            num_heads=self.num_heads, head_dim=self.head_dim)
            return out + bo.astype(self.dtype)

        base = "/".join(self.scope.path)

        def proj(h, w, b, name):
            p = f"{base}/{name}"
            if quant.calibrating() and min(w.shape) >= quant.MIN_QUANT_CHANNELS:
                self.sow("quant_stats", f"{name}.act_amax",
                         jnp.max(jnp.abs(h.astype(jnp.float32))),
                         init_fn=lambda: jnp.float32(0.0),
                         reduce_fn=jnp.maximum)
            return quant.maybe_quantized_dense(h, w, b, self.dtype, p)

        n, tq = x.shape[0], x.shape[1]
        tk = ctx.shape[1]
        q = proj(x, wq, bq, "to_q").reshape(n, tq, self.num_heads, self.head_dim)
        k = proj(ctx, wk, bk, "to_k").reshape(n, tk, self.num_heads, self.head_dim)
        v = proj(ctx, wv, bv, "to_v").reshape(n, tk, self.num_heads, self.head_dim)
        out = dot_product_attention(q, k, v).reshape(n, tq, inner)
        return proj(out, wo, bo, "to_out")


class SpatialSelfAttention(nn.Module):
    """GN → spatial tokens → self-attention → residual; the attention used by
    AttnDownBlock2D/AttnUpBlock2D and the VAE mid block.

    TPU note: head_dim is fixed at 64 lanes (num_heads = C/64) rather than
    diffusers' default head_dim=8 — a deliberate MXU-alignment choice; the
    scratch model trains from scratch so there is no weight-parity concern
    (the VAE importer overrides heads=1 for exact SD parity).
    """

    num_heads: int | None = None
    groups: int = 32
    eps: float = 1e-5
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        heads = self.num_heads or max(1, c // 64)
        residual = x
        y = GroupNorm(self.groups, self.eps, name="group_norm")(x)
        y = y.reshape(n, h * w, c)
        y = Attention(heads, c // heads, qkv_bias=self.qkv_bias,
                      dtype=self.dtype, name="attention")(y)
        return residual + y.reshape(n, h, w, c)


class FeedForward(nn.Module):
    """GEGLU feed-forward (SD transformer MLP). Names ff_net_0_proj/ff_net_2
    match the LoRA preset surface for diffusers' ff.net.0.proj / ff.net.2."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        w0, b0 = _ProjParams(dim, dim * self.mult * 2,
                             name="ff_net_0_proj")()
        w2, b2 = _ProjParams(dim * self.mult, dim, name="ff_net_2")()
        base = "/".join(self.scope.path)

        def proj(h, w, b, name):
            if quant.calibrating() and min(w.shape) >= quant.MIN_QUANT_CHANNELS:
                self.sow("quant_stats", f"{name}.act_amax",
                         jnp.max(jnp.abs(h.astype(jnp.float32))),
                         init_fn=lambda: jnp.float32(0.0),
                         reduce_fn=jnp.maximum)
            return quant.maybe_quantized_dense(h, w, b, self.dtype,
                                               f"{base}/{name}")

        # Fused TPU paths: one Pallas kernel for matmul→gelu→matmul
        # (ops/fused_geglu.py — keeps the [T,2H] intermediate in VMEM).
        # Inference-scoped (ops/dispatch.py — the samplers set the flag):
        # training traces the plain XLA program below, whose autodiff
        # beats any custom_vjp around the kernel (A/B in BASELINE.md
        # round-3). Full precision uses `geglu`; w8a8_static uses the
        # int8-MXU variant when BOTH layers are quantizable under the
        # active skip/only filters (mixed configs fall back to
        # per-layer). Trace-time flag like the quant/fused-MHA
        # dispatches: re-jit after changing POLYP_FUSED_GEGLU. Dynamic
        # w8a8 and calibration keep the per-layer dense hooks below (the
        # dynamic scale depends on the not-yet-computed intermediate).
        from polyp_tpu.ops import dispatch
        from polyp_tpu.ops import fused_geglu as fg
        if (dispatch.in_inference() and dispatch.pallas_ok()
                and os.environ.get("POLYP_FUSED_GEGLU", "1") != "0"
                and fg.supported(x, w0, w2)):
            if quant.quantization() is None:
                return fg.geglu(x.astype(self.dtype), w0.astype(self.dtype),
                                b0.astype(self.dtype), w2.astype(self.dtype),
                                b2.astype(self.dtype))
            p0, p2 = f"{base}/ff_net_0_proj", f"{base}/ff_net_2"
            if (quant.quantization() in ("w8a8", "w8a8_static")
                    and os.environ.get("POLYP_GEGLU_PT", "0") == "1"
                    and quant.dense_quantizable(*w0.shape, p0)
                    and quant.dense_quantizable(*w2.shape, p2)):
                # per-token in-VMEM activation scales (finer grid, no
                # calibration operands) — the only fused option for the
                # DYNAMIC mode, whose scale depends on the intermediate.
                # Opt-in until the chip A/B lands (measure-then-enable).
                return fg.geglu_w8a8_pt(
                    x.astype(self.dtype), w0.astype(self.dtype),
                    b0.astype(self.dtype), w2.astype(self.dtype),
                    b2.astype(self.dtype))
            if (quant.quantization() == "w8a8_static"
                    and quant.dense_quantizable(*w0.shape, p0)
                    and quant.dense_quantizable(*w2.shape, p2)):
                s0, s2 = quant.static_scale(p0), quant.static_scale(p2)
                # a missing calibrated scale (stale cache, renamed layer)
                # falls through to the per-layer path, which handles it
                if s0 is not None and s2 is not None:
                    return fg.geglu_w8a8(
                        x.astype(self.dtype), w0.astype(self.dtype),
                        b0.astype(self.dtype), w2.astype(self.dtype),
                        b2.astype(self.dtype), s0, s2)

        hidden = proj(x, w0, b0, "ff_net_0_proj")
        a, gate = jnp.split(hidden, 2, axis=-1)
        # exact (erf) gelu: diffusers GEGLU calls F.gelu, which is erf-form;
        # flax's default tanh approximation deviates ~1e-3 — caught by
        # tests/test_torch_block_goldens.py
        return proj(a * nn.gelu(gate, approximate=False), w2, b2, "ff_net_2")


class BasicTransformerBlock(nn.Module):
    """LN→self-attn, LN→cross-attn, LN→GEGLU-FF with residuals (SD layout)."""

    num_heads: int
    head_dim: int
    cross_attention_dim: int | None = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 context: jax.Array | None = None) -> jax.Array:
        attn = lambda name: Attention(self.num_heads, self.head_dim,
                                      dtype=self.dtype, name=name)
        # LayerNorm eps 1e-5 matches diffusers BasicTransformerBlock norm_eps
        x = x + attn("attn1")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x))
        if self.cross_attention_dim is not None:
            x = x + attn("attn2")(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x),
                context)
        x = x + FeedForward(dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x))
        return x


class Transformer2D(nn.Module):
    """GN → 1×1 proj_in → transformer blocks over spatial tokens → 1×1
    proj_out → residual (SD Transformer2DModel, conv-projection variant)."""

    num_heads: int
    head_dim: int
    depth: int = 1
    cross_attention_dim: int | None = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 context: jax.Array | None = None) -> jax.Array:
        n, h, w, c = x.shape
        inner = self.num_heads * self.head_dim
        residual = x
        # producer-side int8 handoff into the 1×1 proj_in (same contract
        # as the ResnetBlock GN→conv pairs)
        s_in = _handoff_scale(self, "proj_in", c, inner)
        y = GroupNorm(32, 1e-6, name="norm")(x, quantize_scale=s_in)
        y = QConv(inner, (1, 1), dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(n, h * w, inner)
        for i in range(self.depth):
            y = BasicTransformerBlock(
                self.num_heads, self.head_dim, self.cross_attention_dim,
                self.dtype, name=f"transformer_blocks_{i}")(y, context)
        y = y.reshape(n, h, w, inner)
        y = QConv(c, (1, 1), dtype=self.dtype, name="proj_out")(y)
        return y + residual


class Downsample2D(nn.Module):
    """Stride-2 3×3 conv downsample. Two padding conventions exist in
    diffusers and they are NOT value-equivalent (the window phase differs):
    the UNet's Downsample2D pads symmetrically (downsample_padding=1), the
    VAE Encoder's pads (0,1,0,1) then convs VALID (`padding=0` →
    asymmetric). `asymmetric=True` selects the VAE convention — required
    for value parity with imported AutoencoderKL weights
    (tests/test_torch_block_goldens.py)."""

    out_channels: int
    asymmetric: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = [(0, 1), (0, 1)] if self.asymmetric else [(1, 1), (1, 1)]
        return QConv(self.out_channels, (3, 3), strides=2,
                     padding=pad, dtype=self.dtype,
                     name="conv")(x)


class Upsample2D(nn.Module):
    """Nearest-neighbour upsample + 3×3 conv.

    `out_size` pins the target spatial dims; diffusers' Upsample2D accepts an
    `output_size` for exactly this reason (forward_upsample_size): when the
    down path hits odd sizes (224px → 28→14→7→4), the up path must resize to
    the *skip connection's* dims (4→7), not a blind ×2 (4→8).
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 out_size: tuple[int, int] | None = None) -> jax.Array:
        n, h, w, c = x.shape
        th, tw = out_size if out_size is not None else (h * 2, w * 2)
        # producer-side w8a8_static handoff, one step earlier than the GN
        # version: nearest resize only DUPLICATES values, so quantize
        # commutes with it exactly — quantizing the small pre-resize
        # tensor halves the big tensor's HBM write AND the conv's read,
        # and the resize itself is an int8 gather. The resized tensor's
        # only consumer is this conv, so no bf16 copy is needed.
        s = _handoff_scale(self, "conv", c, self.out_channels)
        if s is not None:
            x = quant._quantize_activation(x, s)[0]
        x = jax.image.resize(x, (n, th, tw, c), "nearest")
        return QConv(self.out_channels, (3, 3), padding="SAME",
                     dtype=self.dtype, name="conv")(x)
