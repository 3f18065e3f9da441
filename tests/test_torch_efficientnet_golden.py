"""Value-level torch goldens for the EfficientNet (classifier) import path.

Completes the round-3 goldens programme: test_torch_block_goldens.py proved
the SD UNet/VAE importers value-correct; this file does the same for the
classifier backbone the reference fine-tunes
(classifier_model/PolypClassificationModel.py:8 — torchvision
efficientnet_b0 IMAGENET1K_V1). The manifest test (tests/test_manifests.py)
proves key/shape coverage; here a random torchvision-layout state dict is
fabricated from the vendored manifest, a raw-torch functional transcription
of torchvision's eval forward runs it in native OIHW layout, the SAME dict
goes through `import_torch_state_dict` into the Flax model, and pooled
backbone features must match in fp32.

The transcription pins three conventions the goldens caught drifting:
* stride-2 convs pad symmetrically ((k-1)//2 each side), not SAME's (0, 1)
  phase on even inputs (torchvision Conv2dNormActivation default padding);
* BatchNorm eps for b0 is the torch default 1e-5 (torchvision only
  overrides eps=1e-3/momentum=.01 for the TF-ported b5–b7) — see
  `_bn_config` in models/efficientnet.py;
* SE squeeze width is the block INPUT channels // 4, not expanded // 4.

Negative controls prove the harness discriminates: a transposed stem
kernel and a 1e-3 BN eps both fail.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from polyp_tpu.models.efficientnet import (
    B0_STAGES,
    EfficientNet,
    PolypClassifier,
    import_torch_state_dict,
)

MANIFEST = Path(__file__).parent / "fixtures" / "manifests" / "efficientnet_b0.json"
RTOL = 2e-4


def fabricate_state_dict(seed: int = 0) -> dict[str, np.ndarray]:
    """Random values in the exact torchvision-B0 key/shape layout (from the
    vendored manifest). Conv weights are fan-in scaled (std 1/√fan_in) so
    signal VARIANCE is preserved through all 16 blocks — with flat small
    weights the activations decay to the BN biases within a few blocks and
    the golden stops testing the early layers (input-dependence measured at
    ~1e-7; a flipped stem kernel passed). BN stats near identity keep the
    normalize step from re-washing the signal."""
    with open(MANIFEST) as f:
        manifest = json.load(f)
    rng = np.random.default_rng(seed)
    sd: dict[str, np.ndarray] = {}
    for key, shape in manifest.items():
        if key.endswith("num_batches_tracked"):
            sd[key] = np.asarray(0, dtype=np.int64)
        elif key.endswith("running_var"):
            sd[key] = rng.uniform(0.8, 1.2, shape).astype(np.float32)
        elif key.endswith("running_mean"):
            sd[key] = (0.05 * rng.standard_normal(shape)).astype(np.float32)
        elif len(shape) == 4:  # conv (incl. depthwise: fan_in = I*kh*kw)
            fan_in = shape[1] * shape[2] * shape[3]
            sd[key] = (rng.standard_normal(shape) / np.sqrt(fan_in)
                       ).astype(np.float32)
        elif len(shape) == 2:  # linear (classifier head — replaced, unused)
            sd[key] = (rng.standard_normal(shape) / np.sqrt(shape[1])
                       ).astype(np.float32)
        elif key.endswith(".weight"):  # BN scale
            sd[key] = (1.0 + 0.1 * rng.standard_normal(shape)).astype(np.float32)
        else:  # biases
            sd[key] = (0.1 * rng.standard_normal(shape)).astype(np.float32)
    return sd


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key]))


def torch_b0_features(sd: dict, x: torch.Tensor, eps: float = 1e-5,
                      calibrate: bool = False) -> torch.Tensor:
    """Raw-torch transcription of torchvision efficientnet_b0 eval forward
    (features only — the reference replaces the classifier head), consuming
    the state dict in its native OIHW layout.

    calibrate=True overwrites each BN's running stats with the batch
    statistics of ITS OWN conv output on `x` — what real running stats are.
    Without this the random-weights net loses input dependence within a few
    blocks (SiLU+SE attenuate, fixed stats don't renormalize) and the
    golden silently stops testing the early layers."""

    def convbn(x, p, stride=1, groups=1, act=True):
        w = _t(sd, f"{p}.0.weight")
        k = w.shape[-1]
        x = F.conv2d(x, w, None, stride=stride, padding=(k - 1) // 2,
                     groups=groups)
        if calibrate:
            sd[f"{p}.1.running_mean"] = x.mean((0, 2, 3)).numpy()
            sd[f"{p}.1.running_var"] = (
                x.var((0, 2, 3), unbiased=False) + 0.01).numpy()
        x = F.batch_norm(x, _t(sd, f"{p}.1.running_mean"),
                         _t(sd, f"{p}.1.running_var"),
                         _t(sd, f"{p}.1.weight"), _t(sd, f"{p}.1.bias"),
                         training=False, momentum=0.0, eps=eps)
        return F.silu(x) if act else x

    x = convbn(x, "features.0", stride=2)
    for stage_i, (expand, _ch, repeats, stride, _k) in enumerate(B0_STAGES):
        for i in range(repeats):
            p = f"features.{stage_i + 1}.{i}.block"
            s = stride if i == 0 else 1
            res = x
            j = 0
            if expand != 1:
                x = convbn(x, f"{p}.{j}")
                j += 1
            x = convbn(x, f"{p}.{j}", stride=s, groups=x.shape[1])
            j += 1
            sq = x.mean((2, 3), keepdim=True)
            sq = F.silu(F.conv2d(sq, _t(sd, f"{p}.{j}.fc1.weight"),
                                 _t(sd, f"{p}.{j}.fc1.bias")))
            gate = torch.sigmoid(F.conv2d(sq, _t(sd, f"{p}.{j}.fc2.weight"),
                                          _t(sd, f"{p}.{j}.fc2.bias")))
            x = x * gate
            j += 1
            x = convbn(x, f"{p}.{j}", act=False)
            if s == 1 and x.shape[1] == res.shape[1]:
                x = x + res  # stochastic depth is identity in eval
    x = convbn(x, "features.8")
    return x.mean((2, 3))


def flax_b0_features(sd: dict, x_nhwc: np.ndarray) -> np.ndarray:
    model = PolypClassifier(num_classes=3, variant="b0")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1,) + x_nhwc.shape[1:], jnp.float32))
    imported = import_torch_state_dict(variables, sd)
    backbone_vars = {"params": imported["params"]["backbone"],
                     "batch_stats": imported["batch_stats"]["backbone"]}
    feats = EfficientNet("b0").apply(backbone_vars, jnp.asarray(x_nhwc),
                                     train=False)
    return np.asarray(feats)


@pytest.fixture(scope="module")
def golden():
    sd = fabricate_state_dict()
    rng = np.random.default_rng(7)
    # calibrate BN running stats on a DIFFERENT batch than the golden input
    x_cal = rng.standard_normal((4, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        torch_b0_features(sd, torch.from_numpy(x_cal), calibrate=True)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    ours = flax_b0_features(sd, x.transpose(0, 2, 3, 1))
    with torch.no_grad():
        ref = torch_b0_features(sd, torch.from_numpy(x)).numpy()
        # the golden must actually depend on its input (guards against the
        # signal-decay failure mode the calibration exists to prevent)
        ref_cal = torch_b0_features(sd, torch.from_numpy(x_cal[:2])).numpy()
    assert _rel(ref_cal, ref) > 0.05, "features lost input dependence"
    return sd, x, ours, ref


def _rel(a, b) -> float:
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


def test_b0_forward_golden(golden):
    _, _, ours, ref = golden
    assert ours.shape == ref.shape == (2, 1280)
    assert np.max(np.abs(ref)) > 0.01  # non-degenerate activations
    assert _rel(ours, ref) < RTOL


def test_flipped_stem_kernel_fails(golden):
    # spatially flipped kernel (the correlation-vs-convolution layout bug;
    # same shape, different function) must diverge
    sd, x, _, ref = golden
    bad = dict(sd)
    bad["features.0.0.weight"] = sd["features.0.0.weight"][:, :, ::-1, ::-1].copy()
    ours = flax_b0_features(bad, x.transpose(0, 2, 3, 1))
    assert _rel(ours, ref) > 100 * RTOL


def test_wrong_bn_eps_fails(golden):
    # the golden pins torchvision-b0's eps=1e-5; the TF constant 1e-3
    # (used only by the ported b5–b7) must be distinguishable
    sd, x, ours, _ = golden
    with torch.no_grad():
        ref_tf_eps = torch_b0_features(sd, torch.from_numpy(x),
                                       eps=1e-3).numpy()
    assert _rel(ours, ref_tf_eps) > 10 * RTOL


def test_stride2_padding_phase_fails(golden):
    # SAME padding on even inputs pads (0, 1); torch pads (1, 1). A torch
    # forward emulating the SAME phase must diverge — this is the exact
    # drift the goldens caught in the flax model (models/efficientnet.py
    # ConvBNAct padding note).
    sd, x, ours, _ = golden

    def same_phase(x_t):
        w = _t(sd, "features.0.0.weight")
        h = F.pad(x_t, (0, 1, 0, 1))  # low 0, high 1 — the SAME phase
        h = F.conv2d(h, w, None, stride=2)
        h = F.batch_norm(h, _t(sd, "features.0.1.running_mean"),
                         _t(sd, "features.0.1.running_var"),
                         _t(sd, "features.0.1.weight"),
                         _t(sd, "features.0.1.bias"),
                         training=False, momentum=0.0, eps=1e-5)
        return F.silu(h)

    with torch.no_grad():
        a = same_phase(torch.from_numpy(x))
        b = F.silu(F.batch_norm(
            F.conv2d(torch.from_numpy(x), _t(sd, "features.0.0.weight"),
                     None, stride=2, padding=1),
            _t(sd, "features.0.1.running_mean"),
            _t(sd, "features.0.1.running_var"),
            _t(sd, "features.0.1.weight"), _t(sd, "features.0.1.bias"),
            training=False, momentum=0.0, eps=1e-5))
    assert _rel(a.numpy(), b.numpy()) > 100 * RTOL
