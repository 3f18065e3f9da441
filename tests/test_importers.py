"""Importer round-trip: export our tiny models to diffusers/transformers
naming (independent inverse mapping written here), re-import through
polyp_tpu.models.importers, and require exact tree equality. Catches renames,
transposes, and missing-key asymmetries without network access."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    TINY_TEXT_CONFIG,
    tiny_condition_unet,
)
from polyp_tpu.models.importers import (
    import_clip_text,
    import_unet_condition,
    import_vae,
    to_pytree,
    validate_against,
)


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, np.asarray(tree)


def _inv_transform(path, leaf):
    if path[-1] == "kernel":
        if leaf.ndim == 4:
            return leaf.transpose(3, 2, 0, 1)  # HWIO → OIHW
        return leaf.T
    return leaf


UNET_SUBS = [
    (r"^down_(\d+)_res_(\d+)", r"down_blocks.\1.resnets.\2"),
    (r"^down_(\d+)_attn_(\d+)", r"down_blocks.\1.attentions.\2"),
    (r"^down_(\d+)_downsample", r"down_blocks.\1.downsamplers.0"),
    (r"^up_(\d+)_res_(\d+)", r"up_blocks.\1.resnets.\2"),
    (r"^up_(\d+)_attn_(\d+)", r"up_blocks.\1.attentions.\2"),
    (r"^up_(\d+)_upsample", r"up_blocks.\1.upsamplers.0"),
    (r"^mid_res_(\d+)", r"mid_block.resnets.\1"),
    (r"^mid_attn", r"mid_block.attentions.0"),
    (r"transformer_blocks_(\d+)", r"transformer_blocks.\1"),
    (r"ff\.ff_net_0_proj", r"ff.net.0.proj"),
    (r"ff\.ff_net_2", r"ff.net.2"),
    (r"to_out\.(kernel|bias)", r"to_out.0.\1"),
    (r"\.kernel$", ".weight"),
    (r"\.scale$", ".weight"),
]

VAE_SUBS = [
    (r"^(encoder|decoder)\.down_(\d+)_res_(\d+)", r"\1.down_blocks.\2.resnets.\3"),
    (r"^(encoder|decoder)\.up_(\d+)_res_(\d+)", r"\1.up_blocks.\2.resnets.\3"),
    (r"^encoder\.down_(\d+)_downsample", r"encoder.down_blocks.\1.downsamplers.0"),
    (r"^decoder\.up_(\d+)_upsample", r"decoder.up_blocks.\1.upsamplers.0"),
    (r"^(encoder|decoder)\.mid_res_(\d+)", r"\1.mid_block.resnets.\2"),
    (r"^(encoder|decoder)\.mid_attn", r"\1.mid_block.attentions.0"),
    (r"attention\.(to_q|to_k|to_v)", r"\1"),
    (r"attention\.to_out\.(kernel|bias)", r"to_out.0.\1"),
    (r"\.kernel$", ".weight"),
    (r"\.scale$", ".weight"),
]

CLIP_SUBS = [
    (r"^token_embedding$", "text_model.embeddings.token_embedding.weight"),
    (r"^position_embedding$", "text_model.embeddings.position_embedding.weight"),
    (r"^layer_(\d+)\.self_attn", r"text_model.encoder.layers.\1.self_attn"),
    (r"^layer_(\d+)\.layer_norm(\d)", r"text_model.encoder.layers.\1.layer_norm\2"),
    (r"^layer_(\d+)\.fc(\d)", r"text_model.encoder.layers.\1.mlp.fc\2"),
    (r"^final_layer_norm", "text_model.final_layer_norm"),
    (r"\.kernel$", ".weight"),
    (r"\.scale$", ".weight"),
]


def _export(params, subs):
    sd = {}
    for path, leaf in _flatten(params):
        name = ".".join(path)
        for pat, repl in subs:
            name = re.sub(pat, repl, name)
        sd[name] = _inv_transform(path, leaf)
    return sd


def _assert_trees_equal(a, b):
    flat_a = dict(_flatten(a))
    flat_b = dict(_flatten(b))
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=str(k))


def test_unet_condition_roundtrip(tmp_path, monkeypatch):
    unet = tiny_condition_unet()
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.asarray([0]), jnp.zeros((1, 4, 32)))["params"]
    sd = _export(params, UNET_SUBS)
    import polyp_tpu.models.importers as I
    monkeypatch.setattr(I, "load_state_dict", lambda p: sd)
    imported = import_unet_condition("unused", like=params)
    _assert_trees_equal(imported, jax.device_get(params))


def test_vae_roundtrip(monkeypatch):
    vae = AutoencoderKL(block_out_channels=(16, 16, 32, 32))
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                      jax.random.PRNGKey(1))["params"]
    sd = _export(params, VAE_SUBS)
    import polyp_tpu.models.importers as I
    monkeypatch.setattr(I, "load_state_dict", lambda p: sd)
    imported = import_vae("unused", like=params)
    _assert_trees_equal(imported, jax.device_get(params))


def test_clip_text_roundtrip(monkeypatch):
    model = CLIPTextModel(TINY_TEXT_CONFIG)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    sd = _export(params, CLIP_SUBS)
    sd["text_model.embeddings.position_ids"] = np.arange(8)[None]  # extras dropped
    import polyp_tpu.models.importers as I
    monkeypatch.setattr(I, "load_state_dict", lambda p: sd)
    imported = import_clip_text("unused", like=params)
    _assert_trees_equal(imported, jax.device_get(params))


def test_unmapped_keys_raise(monkeypatch):
    import polyp_tpu.models.importers as I
    monkeypatch.setattr(I, "load_state_dict",
                        lambda p: {"totally.unknown.weight": np.zeros(3)})
    with pytest.raises(KeyError, match="unmapped"):
        import_clip_text("unused")


def test_validation_reports_shape_mismatch():
    ref = {"a": {"kernel": np.zeros((2, 3))}}
    bad = {"a": {"kernel": np.zeros((3, 2))}}
    problems = validate_against(bad, ref)
    assert problems and "shape" in problems[0]


def test_validation_reports_missing():
    ref = {"a": {"kernel": np.zeros(2)}, "b": {"bias": np.zeros(1)}}
    problems = validate_against({"a": {"kernel": np.zeros(2)}}, ref)
    assert any("missing" in p for p in problems)
