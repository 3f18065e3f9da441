"""Scratch-DDPM and SD-LoRA trainers: single fused steps, optional features,
epoch loops (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.data.pipeline import Loader
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.lora import LoRAConfig, init_lora
from polyp_tpu.models import (
    CLIPTextModel,
    TINY_TEXT_CONFIG,
    UNet2D,
    tiny_condition_unet,
    tiny_vae,
)
from polyp_tpu.train.dreambooth import (
    dreambooth_prompt,
    dreambooth_token_init,
    resize_token_embeddings,
    resume_prompt,
)
from polyp_tpu.train.scratch_ddpm import (
    cosine_warmup_schedule,
    create_ddpm_state,
    ddpm_train_step,
    train_scratch_ddpm,
)
from polyp_tpu.train.sd_finetune import (
    SDComponents,
    create_sd_train_state,
    init_proj_params,
    init_trainable,
    sd_lora_train_step,
    train_sd_lora,
)
from polyp_tpu.models.clip_tokenizer import HashTokenizer
from polyp_tpu.utils.rng import key_for

pytestmark = pytest.mark.slow  # compile-heavy


TINY_UNET = UNet2D(block_out_channels=(16, 32),
                   down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                   up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                   layers_per_block=1)

CFG = DiffusionConfig(image_size=16, train_batch_size=4, num_epochs=2,
                      num_train_timesteps=100).with_schedule(steps_per_epoch=2)
SCHED = DiffusionSchedule.create(100)


def _images(n=8, size=16, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (n, size, size, 3),
                                                dtype=np.uint8)


class TestCosineSchedule:
    def test_warmup_then_decay_to_zero(self):
        s = cosine_warmup_schedule(1e-3, warmup_steps=10, total_steps=100)
        assert float(s(0)) == pytest.approx(0.0)
        assert float(s(10)) == pytest.approx(1e-3, rel=1e-2)
        assert float(s(100)) == pytest.approx(0.0, abs=1e-6)
        assert float(s(5)) == pytest.approx(5e-4, rel=1e-2)


class TestScratchDDPM:
    def test_steps_run_and_loss_finite(self):
        state = create_ddpm_state(CFG, TINY_UNET, jax.random.PRNGKey(0),
                                  image_size=16)
        imgs = jnp.asarray(_images(4))
        for i in range(3):
            state, loss = ddpm_train_step(state, SCHED, imgs,
                                          key_for(0, "t", i))
            assert np.isfinite(float(loss))
        assert int(state.step) == 3

    def test_text_conditioned_step(self):
        model = UNet2D(block_out_channels=(16, 32),
                       down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                       up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                       layers_per_block=1, cross_attention_dim=8)
        state = create_ddpm_state(CFG, model, jax.random.PRNGKey(0),
                                  image_size=16, context_dim=8)
        emb = jnp.ones((1, 77, 8))
        state, loss = ddpm_train_step(state, SCHED, jnp.asarray(_images(4)),
                                      jax.random.PRNGKey(1), emb)
        assert np.isfinite(float(loss))

    def test_epoch_loop_with_callback(self):
        state = create_ddpm_state(CFG, TINY_UNET, jax.random.PRNGKey(0),
                                  image_size=16)
        loader = Loader(_images(8), np.zeros(8, np.int32), 4, seed=0)
        seen = []
        state, result = train_scratch_ddpm(
            CFG, state, SCHED, loader,
            epoch_callback=lambda e, s: seen.append(e))
        assert len(result.loss_hist) == 2
        assert seen == [0, 1]


@pytest.fixture(scope="module")
def sd_stack():
    unet = tiny_condition_unet()
    vae = tiny_vae()
    text = CLIPTextModel(TINY_TEXT_CONFIG)
    k = jax.random.PRNGKey(0)
    unet_params = unet.init(k, jnp.zeros((1, 2, 2, 4)), jnp.asarray([0]),
                            jnp.zeros((1, 16, 32)))["params"]
    vae_params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    text_params = text.init(k, jnp.zeros((1, 16), jnp.int32))["params"]

    frozen = SDComponents(
        unet_params=unet_params,
        vae_params=vae_params,
        text_params=text_params,
        unet_apply=lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
        vae_encode=lambda p, x: vae.apply(p, x, method=vae.encode_moments),
        text_apply=lambda p, ids: text.apply({"params": p}, ids),
    )
    return unet, vae, text, frozen


class TestSDLoRA:
    def test_basic_lora_step(self, sd_stack):
        unet, vae, text, frozen = sd_stack
        lcfg = LoRAConfig(rank=2, dropout=0.0)
        adapter = init_lora(frozen.unet_params, lcfg, jax.random.PRNGKey(1))
        state = create_sd_train_state(CFG, init_trainable(adapter))
        ids = jnp.zeros((1, 16), jnp.int32)
        # two steps: cosine warmup starts at LR=0, so step 0 alone cannot
        # move the adapter (reference parity: diffusers warmup also starts 0)
        for i in range(2):
            state, loss = sd_lora_train_step(
                state, frozen, SCHED, jnp.asarray(_images(2)), ids,
                jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(2 + i), lcfg)
        assert np.isfinite(float(loss))
        assert int(state.step) == 2
        # B factors moved off zero after one step
        b_max = max(float(jnp.abs(l).max())
                    for p, l in jax.tree_util.tree_flatten_with_path(
                        state.trainable["unet_lora"])[0]
                    if "lora_B" in str(p))
        assert b_max > 0

    def test_full_feature_step(self, sd_stack):
        """text-encoder LoRA + visual influence + dreambooth rows together
        (the flag combination surface of train_with_lora_per_class.py)."""
        unet, vae, text, frozen = sd_stack
        lcfg = LoRAConfig(rank=2)
        tcfg = LoRAConfig(rank=2, target_modules=("q_proj", "k_proj",
                                                  "v_proj", "out_proj"))
        tok = HashTokenizer(vocab_size=TINY_TEXT_CONFIG.vocab_size, max_length=16)
        tok.add_tokens(["sks"])
        text_params = resize_token_embeddings(frozen.text_params, len(tok),
                                              jax.random.PRNGKey(3))
        # the module's static vocab_size must track the grown table
        import dataclasses
        text_grown = CLIPTextModel(dataclasses.replace(
            TINY_TEXT_CONFIG, vocab_size=len(tok)))
        frozen = frozen.replace(
            text_params=text_params,
            text_apply=lambda p, ids: text_grown.apply({"params": p}, ids))
        special_id = tok.convert_tokens_to_ids("sks")
        row = dreambooth_token_init(text_params, tok, "AD")
        trainable = init_trainable(
            unet_lora=init_lora(frozen.unet_params, lcfg, jax.random.PRNGKey(1)),
            text_lora=init_lora(frozen.text_params, tcfg, jax.random.PRNGKey(2)),
            proj=init_proj_params(jax.random.PRNGKey(4), 4, 32),
            special_rows=row[None])
        state = create_sd_train_state(CFG, trainable)
        ids = jnp.asarray(tok("a photo of sks polyp"))
        prev_row = np.asarray(trainable["special_rows"])
        for i in range(2):  # warmup LR is 0 at step 0
            state, loss = sd_lora_train_step(
                state, frozen, SCHED, jnp.asarray(_images(2)), ids,
                jnp.asarray([special_id], jnp.int32), jax.random.PRNGKey(5 + i),
                lcfg, tcfg, 1.0, 0.1)
        assert np.isfinite(float(loss))
        # the special row trains; base table is frozen by construction
        assert float(np.max(np.abs(
            np.asarray(state.trainable["special_rows"]) - prev_row))) > 0

    def test_epoch_loop(self, sd_stack):
        unet, vae, text, frozen = sd_stack
        lcfg = LoRAConfig(rank=2)
        adapter = init_lora(frozen.unet_params, lcfg, jax.random.PRNGKey(1))
        state = create_sd_train_state(CFG, init_trainable(adapter))
        loader = Loader(_images(4), np.zeros(4, np.int32), 2, seed=0)
        state, result = train_sd_lora(
            CFG, state, frozen, SCHED, loader,
            np.zeros((1, 16), np.int32), lcfg)
        assert len(result.loss_hist) == 2


class TestDreamboothHelpers:
    def test_token_init_mixes_class_and_polyp(self):
        tok = HashTokenizer(vocab_size=64, max_length=8)
        table = jnp.arange(64 * 4, dtype=jnp.float32).reshape(64, 4)
        params = {"token_embedding": table}
        row = dreambooth_token_init(params, tok, "AD", 0.5, 0.5)
        polyp = table[tok.convert_tokens_to_ids("polyp")]
        cls_avg = table[tok.convert_tokens_to_ids("adenomatous")]
        np.testing.assert_allclose(np.asarray(row),
                                   np.asarray(0.5 * cls_avg + 0.5 * polyp))

    def test_prompt_matrix(self):
        assert dreambooth_prompt("AD", True, False, False) == ""
        assert dreambooth_prompt("AD", False, True, True) == "AD"
        assert "sks adenomatous polyp" in dreambooth_prompt("AD", False, False, True)
        assert "sks" not in dreambooth_prompt("AD", False, False, False)
        assert "zbt hyperplastic and sessile serrated" in resume_prompt("REST", False)

    def test_resize_embeddings(self):
        params = {"token_embedding": jnp.zeros((10, 4))}
        out = resize_token_embeddings(params, 12, jax.random.PRNGKey(0))
        assert out["token_embedding"].shape == (12, 4)
        np.testing.assert_array_equal(np.asarray(out["token_embedding"][:10]), 0)


class TestUnfreezeLayers:
    def test_unfrozen_base_weights_train(self, sd_stack):
        """--unfreeze_layers: base attention weights receive updates
        alongside the adapter (train_with_lora_per_class.py:318-323)."""
        from polyp_tpu.lora.partition import extract_by_mask, path_mask

        unet, vae, text, frozen = sd_stack
        lcfg = LoRAConfig(rank=2)
        adapter = init_lora(frozen.unet_params, lcfg, jax.random.PRNGKey(1))
        unfrozen = extract_by_mask(
            frozen.unet_params,
            path_mask(frozen.unet_params, ["to_q", "to_k", "to_v", "to_out"]))
        state = create_sd_train_state(
            CFG, init_trainable(adapter, unfrozen=unfrozen))
        before = jax.tree_util.tree_leaves(state.trainable["unfrozen"])[0]
        before = np.asarray(before).copy()
        ids = jnp.zeros((1, 16), jnp.int32)
        for i in range(2):  # warmup LR is 0 at step 0
            state, loss = sd_lora_train_step(
                state, frozen, SCHED, jnp.asarray(_images(2)), ids,
                jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(7 + i), lcfg)
        after = np.asarray(jax.tree_util.tree_leaves(
            state.trainable["unfrozen"])[0])
        assert np.isfinite(float(loss))
        assert float(np.max(np.abs(after - before))) > 0
