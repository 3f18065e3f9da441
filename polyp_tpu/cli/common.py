"""Shared CLI plumbing: data-layout conventions, tracker setup, SD stack
loading (pretrained import or random init), prompt encoding."""

from __future__ import annotations

import argparse
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DataLayout:
    """The reference's on-disk corpus layout (classifier.py:50-99):
    {root}/m_train2/m_train/{images,train.csv}, {root}/m_valid/m_valid/...,
    {root}/m_test/m_test/{images,gt_test.csv}."""

    root: Path

    @property
    def train_images(self): return self.root / "m_train2/m_train/images"
    @property
    def train_csv(self): return self.root / "m_train2/m_train/train.csv"
    @property
    def train_masks(self): return self.root / "m_train2/m_train/masks"
    @property
    def val_images(self): return self.root / "m_valid/m_valid/images"
    @property
    def val_csv(self): return self.root / "m_valid/m_valid/valid.csv"
    @property
    def test_images(self): return self.root / "m_test/m_test/images"
    @property
    def test_csv(self): return self.root / "m_test/m_test/gt_test.csv"


def add_common_flags(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--data-root", type=str, default="./data",
                        help="corpus root (reference layout)")
    parser.add_argument("--cache-dir", type=str, default="./data/cache")
    parser.add_argument("--tracker-root", type=str, default="mlruns_local")
    parser.add_argument("--experiment-name", type=str, default=None)
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["w8a8", "w8a8_static", "promoted"],
                        help="quantized UNet sampling (int8 MXU path, "
                             "ops/quant.py); training is never quantized. "
                             "'promoted' expands to the gate-passing "
                             "config from quant.promoted_config() "
                             "(DiffusionConfig resolves it)")
    parser.add_argument("--quant_fp_head", type=int, default=0,
                        help="with --quantize: run the FIRST N sampling "
                             "steps full precision (hybrid-precision "
                             "trajectory). The early evals set the whole "
                             "trajectory on a deterministic sampler, so a "
                             "small bf16 head makes the quantized run "
                             "reproduce the full-precision images almost "
                             "exactly at ~the full int8 throughput")
    parser.add_argument("--quant_fp_tail", type=int, default=0,
                        help="with --quantize: run the final N sampling "
                             "steps full precision (the symmetric knob "
                             "for detail-sensitive workloads)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="device mesh spec, e.g. 'data=8' (pure DP) or "
                             "'data=4,model=2' (DP × Megatron-TP on the "
                             "attention/FF kernels); 'data=-1' = all devices. "
                             "Default: single-device, like the reference "
                             "(classification.sh:8, gres gpu:1)")


def get_mesh_from(args):
    """Build the mesh named by --mesh (None when unset). Multi-host pods
    initialize DCN first so jax.devices() spans all processes."""
    from polyp_tpu.parallel import mesh_from_spec, multihost_init
    spec = getattr(args, "mesh", None)
    if spec:
        multihost_init()
    mesh = mesh_from_spec(spec)
    if mesh is not None:
        print(f"[polyp-tpu] mesh: {dict(mesh.shape)} over "
              f"{mesh.devices.size} devices")
    return mesh


def get_tracker_from(args):
    from polyp_tpu.track import get_tracker
    return get_tracker(args.tracker_root)


@dataclass
class SDStack:
    unet: object
    unet_params: dict
    vae: object
    vae_params: dict
    text: object
    text_params: dict
    tokenizer: object
    pretrained: bool


def load_sd_stack(pretrained_dir: str | None,
                  dtype=jnp.bfloat16, tiny: bool = False) -> SDStack:
    """SD-v1-4 components: imported from a local diffusers layout when
    `pretrained_dir` is given, else randomly initialized (smoke mode — the
    zero-egress analogue of the reference's HF-hub download at
    train_with_lora_per_class.py:304-308). `tiny=True` swaps in the
    miniature stack for CI/smoke runs (--generate_subsamples-grade)."""
    from polyp_tpu.models import (
        AutoencoderKL, CLIPTextModel, TINY_TEXT_CONFIG, load_tokenizer,
        sd14_unet, tiny_condition_unet, tiny_vae)

    if tiny:
        unet = tiny_condition_unet(dtype=dtype)
        vae = tiny_vae(dtype=dtype)
        text = CLIPTextModel(TINY_TEXT_CONFIG, dtype=dtype)
        ctx_dim, max_len = TINY_TEXT_CONFIG.width, TINY_TEXT_CONFIG.max_length
    else:
        unet = sd14_unet(dtype=dtype)
        vae = AutoencoderKL(dtype=dtype)
        text = CLIPTextModel(dtype=dtype)
        ctx_dim, max_len = 768, 77
    k = jax.random.PRNGKey(0)
    unet_params = jax.jit(unet.init)(
        {"params": k}, jnp.zeros((1, 32, 32, 4), dtype),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, max_len, ctx_dim), dtype))["params"]
    vae_variables = jax.jit(vae.init)(
        {"params": k}, jnp.zeros((1, 64, 64, 3), dtype), k)
    text_params = jax.jit(text.init)(
        {"params": k}, jnp.zeros((1, max_len), jnp.int32))["params"]

    pretrained = False
    tokenizer_dir = None
    if pretrained_dir is not None and Path(pretrained_dir).exists():
        from polyp_tpu.models.importers import load_sd_checkpoint
        loaded = load_sd_checkpoint(pretrained_dir, unet_like=unet_params,
                                    vae_like=vae_variables["params"],
                                    text_like=text_params)
        unet_params = jax.tree_util.tree_map(jnp.asarray, loaded["unet"])
        vae_variables = {"params": jax.tree_util.tree_map(jnp.asarray,
                                                          loaded["vae"])}
        text_params = jax.tree_util.tree_map(jnp.asarray, loaded["text"])
        tokenizer_dir = Path(pretrained_dir) / "tokenizer"
        pretrained = True
    else:
        print("[polyp-tpu] no pretrained dir — using RANDOM INIT (smoke mode)")

    if tiny:
        from polyp_tpu.models.clip_tokenizer import HashTokenizer
        tokenizer = HashTokenizer(vocab_size=TINY_TEXT_CONFIG.vocab_size,
                                  max_length=max_len)
    else:
        tokenizer = load_tokenizer(tokenizer_dir, max_length=max_len)
    return SDStack(unet, unet_params, vae, vae_variables, text,
                   {"params": text_params}, tokenizer, pretrained)


def encode_prompt(stack: SDStack, prompt: str) -> jax.Array:
    ids = jnp.asarray(stack.tokenizer([prompt]))
    return stack.text.apply(stack.text_params, ids)


def print_banner(msg: str) -> None:
    print(f"\n=== {msg} ===")
