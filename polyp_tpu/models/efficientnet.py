"""EfficientNet (B0-B7) in Flax, NHWC/TPU-native, with the polyp classifier
head.

Functional equivalent of the reference `PolypClassificationModel`
(classifier_model/PolypClassificationModel.py:4-20): an EfficientNet-B0
backbone whose classifier is replaced by
Linear(1280→hidden) → ReLU → Dropout → Linear(hidden→num_classes).

Design notes (TPU-first, not a torch translation):
* NHWC layout end-to-end — XLA's native conv layout on TPU; every conv
  lowers onto the MXU without transposes.
* BatchNorm constants follow torchvision per variant (`_bn_config`): torch
  defaults for b0–b4, TF-ported 1e-3/.99 for b5–b7; batch stats carried as
  a separate `batch_stats` collection.
* Stochastic depth (row-wise DropPath) with linearly increasing drop rate,
  matching the published architecture.
* Weight import from a torchvision `efficientnet_b0` state_dict is provided
  (`import_torch_state_dict`) and gated on the caller supplying the weights
  file — no network access is assumed.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# (expand_ratio, channels, repeats, stride, kernel) per stage — EfficientNet-B0
B0_STAGES: tuple[tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# width_mult, depth_mult, dropout for the EfficientNet family
VARIANTS: dict[str, tuple[float, float, float]] = {
    "b0": (1.0, 1.0, 0.2), "b1": (1.0, 1.1, 0.2), "b2": (1.1, 1.2, 0.3),
    "b3": (1.2, 1.4, 0.3), "b4": (1.4, 1.8, 0.4), "b5": (1.6, 2.2, 0.4),
    "b6": (1.8, 2.6, 0.5), "b7": (2.0, 3.1, 0.5),
    # miniature variant for tests/smoke/dryrun — NOT a torchvision model;
    # same block taxonomy, ~1 block per stage, minimal widths
    "tiny": (0.1, 0.1, 0.1),
}

# BatchNorm (eps, EMA decay) per variant, matching torchvision so imported
# IMAGENET1K_V1 stats evaluate identically: b0–b4 carry torch-native weights
# and use nn.BatchNorm2d defaults (eps 1e-5, momentum 0.1 → decay 0.9);
# b5–b7 are TF-ported and built with eps=1e-3, momentum=0.01 → decay 0.99
# (torchvision models/efficientnet.py norm_layer overrides). Scratch
# variants follow b0. The eps choice is load-bearing for import parity —
# round-3 torch goldens (tests/test_torch_efficientnet_golden.py) pin it.
_TF_PORTED = frozenset({"b5", "b6", "b7"})


def _bn_config(variant: str) -> tuple[float, float]:
    return (1e-3, 0.99) if variant in _TF_PORTED else (1e-5, 0.9)


def _round_channels(ch: float, width_mult: float, divisor: int = 8) -> int:
    ch *= width_mult
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return new


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


class DropPath(nn.Module):
    """Row-wise stochastic depth: drops whole residual branches per sample."""

    rate: float
    deterministic: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        key = self.make_rng("dropout")
        mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class ConvBNAct(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # Explicit symmetric (k-1)//2 padding, NOT "SAME": torch pads
        # stride-2 convs symmetrically while SAME pads (0, 1) on even
        # inputs — same output shape, one-pixel-shifted values. Caught by
        # the round-3 torch goldens; symmetric is the torchvision
        # convention every imported checkpoint was trained under.
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=x.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=self.bn_eps,
                         momentum=self.bn_momentum, dtype=jnp.float32,
                         name="bn")(x)
        return nn.silu(x) if self.act else x


class SqueezeExcite(nn.Module):
    squeeze_features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_features, (1, 1), dtype=x.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=x.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    in_features: int
    out_features: int
    expand_ratio: int
    kernel: int
    stride: int
    drop_path: float
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        residual = x
        expanded = self.in_features * self.expand_ratio
        bn = dict(bn_eps=self.bn_eps, bn_momentum=self.bn_momentum)
        if self.expand_ratio != 1:
            x = ConvBNAct(expanded, 1, name="expand", **bn)(x, train)
        x = ConvBNAct(expanded, self.kernel, self.stride, groups=expanded,
                      name="depthwise", **bn)(x, train)
        x = SqueezeExcite(max(1, self.in_features // 4), name="se")(x)
        x = ConvBNAct(self.out_features, 1, act=False, name="project",
                      **bn)(x, train)
        if self.stride == 1 and self.in_features == self.out_features:
            x = DropPath(self.drop_path, deterministic=not train)(x) + residual
        return x


class EfficientNet(nn.Module):
    """Backbone → pooled features (1280·width for b0..b7)."""

    variant: str = "b0"
    stochastic_depth: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width, depth, _ = VARIANTS[self.variant]
        eps, mom = _bn_config(self.variant)
        bn = dict(bn_eps=eps, bn_momentum=mom)
        stem_ch = _round_channels(32, width)
        x = ConvBNAct(stem_ch, 3, 2, name="stem", **bn)(x, train)

        total_blocks = sum(_round_repeats(r, depth) for _, _, r, _, _ in B0_STAGES)
        block_idx = 0
        in_ch = stem_ch
        for stage_i, (expand, ch, repeats, stride, kernel) in enumerate(B0_STAGES):
            out_ch = _round_channels(ch, width)
            for i in range(_round_repeats(repeats, depth)):
                rate = self.stochastic_depth * block_idx / total_blocks
                x = MBConv(in_ch, out_ch, expand, kernel,
                           stride if i == 0 else 1, rate, **bn,
                           name=f"stage{stage_i + 1}_block{i}")(x, train)
                in_ch = out_ch
                block_idx += 1

        head_ch = _round_channels(1280, width)
        x = ConvBNAct(head_ch, 1, name="head", **bn)(x, train)
        return jnp.mean(x, axis=(1, 2))  # global average pool → [N, head_ch]


class PolypClassifier(nn.Module):
    """EfficientNet backbone + the reference's replacement head
    (PolypClassificationModel.py:12-17)."""

    num_classes: int
    hidden_features: int = 256
    dropout: float = 0.5
    variant: str = "b0"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = EfficientNet(self.variant, name="backbone")(x, train)
        h = nn.Dense(self.hidden_features, dtype=feats.dtype, name="fc1")(feats)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc2")(h)
        return logits


def efficientnet_b0(num_classes: int, hidden_features: int = 256,
                    dropout: float = 0.5) -> PolypClassifier:
    return PolypClassifier(num_classes, hidden_features, dropout, "b0")


# ---------------------------------------------------------------------------
# torchvision weight import (IMAGENET1K_V1 parity, PolypClassificationModel.py:8)
# ---------------------------------------------------------------------------

def _conv_w(t) -> jnp.ndarray:
    # torch OIHW → flax HWIO
    return jnp.asarray(t).transpose(2, 3, 1, 0)


def _dw_conv_w(t) -> jnp.ndarray:
    # torch depthwise (C,1,H,W) → flax HWIO with feature_group_count=C: (H,W,1,C)
    return jnp.asarray(t).transpose(2, 3, 1, 0)


def import_torch_state_dict(variables: dict, state_dict: dict[str, Any],
                            variant: str = "b0") -> dict:
    """Map a torchvision `efficientnet_bN` state_dict (numpy-converted values)
    onto our param/batch_stats tree. The classifier head is NOT imported —
    the reference replaces it (PolypClassificationModel.py:12-17).

    torchvision layout: features.0 = stem; features.{1..7}.{i}.block.{j} with
    j=0 expand (absent when expand_ratio==1 — then j=0 is depthwise),
    then depthwise, SE(fc1/fc2), project; features.8 = head.
    """
    import numpy as np

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    stats = jax.tree_util.tree_map(lambda x: x, variables["batch_stats"])

    used: set[str] = set()

    class _Reader:
        """Tracks consumed keys so silently-unused checkpoint tensors are
        reported (the state-dict analogue of apply_rules' unmatched check)."""

        def __getitem__(self, k: str):
            used.add(k)
            return np.asarray(state_dict[k])

    sd = _Reader()

    def put_convbn(dst_params: dict, dst_stats: dict, prefix: str,
                   depthwise: bool = False) -> None:
        w = sd[f"{prefix}.0.weight"]
        dst_params["conv"]["kernel"] = (_dw_conv_w(w) if depthwise else _conv_w(w))
        dst_params["bn"]["scale"] = jnp.asarray(sd[f"{prefix}.1.weight"])
        dst_params["bn"]["bias"] = jnp.asarray(sd[f"{prefix}.1.bias"])
        dst_stats["bn"]["mean"] = jnp.asarray(sd[f"{prefix}.1.running_mean"])
        dst_stats["bn"]["var"] = jnp.asarray(sd[f"{prefix}.1.running_var"])

    bb_p = params["backbone"]
    bb_s = stats["backbone"]
    put_convbn(bb_p["stem"], bb_s["stem"], "features.0")

    _, depth, _ = VARIANTS[variant]
    for stage_i, (expand, _, repeats, _, _) in enumerate(B0_STAGES):
        for i in range(_round_repeats(repeats, depth)):
            name = f"stage{stage_i + 1}_block{i}"
            tprefix = f"features.{stage_i + 1}.{i}.block"
            j = 0
            if expand != 1:
                put_convbn(bb_p[name]["expand"], bb_s[name]["expand"],
                           f"{tprefix}.{j}")
                j += 1
            put_convbn(bb_p[name]["depthwise"], bb_s[name]["depthwise"],
                       f"{tprefix}.{j}", depthwise=True)
            j += 1
            se = bb_p[name]["se"]
            se["fc1"]["kernel"] = _conv_w(sd[f"{tprefix}.{j}.fc1.weight"])
            se["fc1"]["bias"] = jnp.asarray(sd[f"{tprefix}.{j}.fc1.bias"])
            se["fc2"]["kernel"] = _conv_w(sd[f"{tprefix}.{j}.fc2.weight"])
            se["fc2"]["bias"] = jnp.asarray(sd[f"{tprefix}.{j}.fc2.bias"])
            j += 1
            put_convbn(bb_p[name]["project"], bb_s[name]["project"],
                       f"{tprefix}.{j}")

    put_convbn(bb_p["head"], bb_s["head"], "features.8")
    leftover = {k for k in state_dict
                if k not in used
                and not k.startswith("classifier.")   # head is replaced
                and not k.endswith("num_batches_tracked")}
    if leftover:
        raise KeyError("unconsumed torchvision keys (first 10): "
                       + ", ".join(sorted(leftover)[:10]))
    return {"params": params, "batch_stats": stats}
