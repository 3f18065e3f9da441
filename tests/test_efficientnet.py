"""EfficientNet-B0 backbone + classifier head: shapes, param budget, train
behavior, and torch state-dict import mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.models.efficientnet import (
    B0_STAGES,
    PolypClassifier,
    VARIANTS,
    _round_repeats,
    import_torch_state_dict,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = PolypClassifier(num_classes=3, hidden_features=16, dropout=0.5)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


@pytest.mark.slow
def test_output_shape(model_and_vars):
    model, variables = model_and_vars
    logits = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert logits.shape == (2, 3)
    assert logits.dtype == jnp.float32


def test_backbone_param_count(model_and_vars):
    # torchvision efficientnet_b0 features ≈ 4.008M params (5.289M minus the
    # 1000-class classifier); ours must match within BN bookkeeping noise.
    _, variables = model_and_vars
    n = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]["backbone"]))
    assert 3.9e6 < n < 4.1e6, n


def test_bf16_forward(model_and_vars):
    model, variables = model_and_vars
    logits = model.apply(variables, jnp.zeros((2, 64, 64, 3), jnp.bfloat16),
                         train=False)
    assert jnp.isfinite(logits).all()


@pytest.mark.slow
def test_dropout_and_droppath_need_rng(model_and_vars):
    model, variables = model_and_vars
    out, _ = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (2, 3)


def _synth_torch_state_dict(variant="b0"):
    """Fabricate a torchvision-shaped efficientnet state_dict with
    deterministic values so we can verify the importer's key/transpose map."""
    rng = np.random.default_rng(0)
    sd = {}

    # Small weights / near-unit BN stats so a 16-block forward pass through
    # untrained random values stays finite.
    def convbn(prefix, cin, cout, k, groups=1):
        sd[f"{prefix}.0.weight"] = (0.05 * rng.normal(size=(cout, cin // groups, k, k))).astype(np.float32)
        sd[f"{prefix}.1.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.1.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.1.running_mean"] = (0.01 * rng.normal(size=(cout,))).astype(np.float32)
        sd[f"{prefix}.1.running_var"] = np.ones(cout, np.float32)

    convbn("features.0", 3, 32, 3)
    in_ch = 32
    for stage_i, (expand, ch, repeats, stride, k) in enumerate(B0_STAGES):
        for i in range(_round_repeats(repeats, VARIANTS[variant][1])):
            p = f"features.{stage_i + 1}.{i}.block"
            mid = in_ch * expand
            j = 0
            if expand != 1:
                convbn(f"{p}.{j}", in_ch, mid, 1)
                j += 1
            convbn(f"{p}.{j}", mid, mid, k, groups=mid)
            j += 1
            sq = max(1, in_ch // 4)
            sd[f"{p}.{j}.fc1.weight"] = rng.normal(size=(sq, mid, 1, 1)).astype(np.float32)
            sd[f"{p}.{j}.fc1.bias"] = rng.normal(size=(sq,)).astype(np.float32)
            sd[f"{p}.{j}.fc2.weight"] = rng.normal(size=(mid, sq, 1, 1)).astype(np.float32)
            sd[f"{p}.{j}.fc2.bias"] = rng.normal(size=(mid,)).astype(np.float32)
            j += 1
            convbn(f"{p}.{j}", mid, ch, 1)
            in_ch = ch
    convbn("features.8", in_ch, 1280, 1)
    return sd


@pytest.mark.slow
def test_torch_import_maps_all_backbone_weights(model_and_vars):
    _, variables = model_and_vars
    sd = _synth_torch_state_dict()
    imported = import_torch_state_dict(variables, sd)
    # stem kernel transposed OIHW→HWIO
    np.testing.assert_allclose(
        np.asarray(imported["params"]["backbone"]["stem"]["conv"]["kernel"]),
        sd["features.0.0.weight"].transpose(2, 3, 1, 0))
    # a depthwise kernel lands with shape (k, k, 1, C)
    dw = imported["params"]["backbone"]["stage1_block0"]["depthwise"]["conv"]["kernel"]
    assert dw.shape == (3, 3, 1, 32)
    # BN running stats land in batch_stats
    np.testing.assert_allclose(
        np.asarray(imported["batch_stats"]["backbone"]["head"]["bn"]["mean"]),
        sd["features.8.1.running_mean"])
    # imported tree still runs
    model = PolypClassifier(num_classes=3, hidden_features=16, dropout=0.5)
    logits = model.apply(imported, jnp.zeros((1, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(logits)).all()
