"""LoRA pytree surgery: no-op init, merge algebra, gradient flow,
introspection, save/load, path masks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.lora import (
    LoRAConfig,
    apply_lora_to_kernels,
    count_lora_params,
    init_lora,
    load_lora,
    lorarized_layers,
    merge_lora,
    path_mask,
    save_lora,
    trainable_count,
)
from polyp_tpu.models import tiny_condition_unet


@pytest.fixture(scope="module")
def unet_params():
    model = tiny_condition_unet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.asarray([1]), jnp.zeros((1, 4, 32)))["params"]
    return model, params


CFG = LoRAConfig(rank=4, dropout=0.0)


def test_init_targets_attention_kernels(unet_params):
    _, params = unet_params
    adapter = init_lora(params, CFG, jax.random.PRNGKey(1))
    layers = lorarized_layers(adapter)
    assert layers, "no adapted layers found"
    assert all(any(t in l.split(".")[-1] for t in CFG.target_modules)
               for l in layers)
    # both self-attn (attn1) and cross-attn (attn2) projections are covered
    assert any("attn1" in l for l in layers)
    assert any("attn2" in l for l in layers)
    assert count_lora_params(adapter) > 0


def test_fresh_adapter_is_noop(unet_params):
    model, params = unet_params
    adapter = init_lora(params, CFG, jax.random.PRNGKey(1))
    merged = merge_lora(params, adapter, CFG)
    x, t = jnp.ones((1, 8, 8, 4)), jnp.asarray([5])
    ctx = jnp.ones((1, 4, 32))
    a = model.apply({"params": params}, x, t, ctx)
    b = model.apply({"params": merged}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_merge_algebra():
    params = {"to_q": {"kernel": jnp.eye(4)}}
    adapter = {"to_q": {"lora_A": jnp.ones((4, 2)),
                        "lora_B": jnp.full((2, 4), 0.5)}}
    merged = apply_lora_to_kernels(params, adapter, scale=2.0)
    # delta = 2.0 · (ones(4,2) @ 0.5·ones(2,4)) = 2.0 · ones(4,4)
    np.testing.assert_allclose(np.asarray(merged["to_q"]["kernel"]),
                               np.eye(4) + 2.0, rtol=1e-6)


def test_conv1x1_kernels_supported():
    params = {"proj_in": {"kernel": jnp.zeros((1, 1, 8, 16))}}
    cfg = LoRAConfig(rank=2, target_modules=("proj_in",))
    adapter = init_lora(params, cfg, jax.random.PRNGKey(0))
    assert adapter["proj_in"]["lora_A"].shape == (8, 2)
    merged = merge_lora(params, adapter, cfg)
    assert merged["proj_in"]["kernel"].shape == (1, 1, 8, 16)


@pytest.mark.slow
def test_gradients_flow_only_through_adapter(unet_params):
    model, params = unet_params
    adapter = init_lora(params, CFG, jax.random.PRNGKey(1))
    x, t, ctx = jnp.ones((1, 8, 8, 4)), jnp.asarray([5]), jnp.ones((1, 4, 32))

    def loss_fn(ad):
        merged = merge_lora(params, ad, CFG)
        return jnp.mean(model.apply({"params": merged}, x, t, ctx) ** 2)

    grads = jax.grad(loss_fn)(adapter)
    # B starts zero → dL/dA can be zero at init, but dL/dB must be nonzero
    b_norms = [float(jnp.abs(g).max())
               for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]
               if "lora_B" in str(path)]
    assert max(b_norms) > 0


@pytest.mark.slow
def test_dropout_perturbs_merge(unet_params):
    _, params = unet_params
    cfg = LoRAConfig(rank=4, dropout=0.5)
    adapter = init_lora(params, cfg, jax.random.PRNGKey(1))
    # make B nonzero so dropout has an observable effect
    adapter = jax.tree_util.tree_map(
        lambda x: jnp.ones_like(x), adapter)
    m_train = merge_lora(params, adapter, cfg,
                         dropout_rng=jax.random.PRNGKey(2), train=True)
    m_eval = merge_lora(params, adapter, cfg)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), m_train, m_eval)
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6


def test_save_load_roundtrip(tmp_path, unet_params):
    _, params = unet_params
    adapter = init_lora(params, CFG, jax.random.PRNGKey(1))
    save_lora(tmp_path / "lora", adapter)
    restored = load_lora(tmp_path / "lora", like=adapter)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        adapter, restored)


def test_path_mask_and_counts(unet_params):
    _, params = unet_params
    mask = path_mask(params, ["to_q", "to_k", "to_v", "to_out"])
    trainable, total = trainable_count(params, mask)
    assert 0 < trainable < total
    mask_all = path_mask(params, [""])
    t2, _ = trainable_count(params, mask_all)
    assert t2 == total


def test_extract_and_overlay(unet_params):
    from polyp_tpu.lora.partition import extract_by_mask, overlay_params

    _, params = unet_params
    mask = path_mask(params, ["to_q"])
    subset = extract_by_mask(params, mask)
    # subset contains only to_q kernels
    leaves = jax.tree_util.tree_leaves_with_path(subset)
    assert leaves and all("to_q" in str(p) for p, _ in leaves)
    # overlay with modified subset replaces exactly those leaves
    bumped = jax.tree_util.tree_map(lambda x: x + 1.0, subset)
    merged = overlay_params(params, bumped)
    q = merged["down_0_attn_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    q0 = params["down_0_attn_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    np.testing.assert_allclose(np.asarray(q), np.asarray(q0) + 1.0, rtol=1e-6)
    k = merged["down_0_attn_0"]["transformer_blocks_0"]["attn1"]["to_k"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k), np.asarray(
        params["down_0_attn_0"]["transformer_blocks_0"]["attn1"]["to_k"]["kernel"]))


@pytest.mark.slow
def test_dropout_rng_is_process_stable(unet_params):
    """Dropout stream derivation must not depend on builtin hash() (salted
    per process via PYTHONHASHSEED) — ADVICE r1 medium. _stream_hash is
    sha256-based; pin a value so any future drift is loud."""
    from polyp_tpu.utils.rng import _stream_hash
    assert _stream_hash("to_q") == _stream_hash("to_q")
    # recomputing in a subprocess with a different hash seed must agree
    import subprocess, sys
    code = ("from polyp_tpu.utils.rng import _stream_hash;"
            "print(_stream_hash('to_q'), _stream_hash('down_0_attn_0'))")
    outs = set()
    for seed in ("0", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        outs.add(subprocess.check_output(
            [sys.executable, "-c", code], env=env).decode().strip())
    assert len(outs) == 1
    here = f"{_stream_hash('to_q')} {_stream_hash('down_0_attn_0')}"
    assert outs == {here}
