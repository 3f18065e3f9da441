"""Epoch-level checkpoint/resume and remat."""

import jax
import jax.numpy as jnp
import numpy as np

from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.lora import LoRAConfig, init_lora
from polyp_tpu.train.resume import EpochCheckpointer, resume_or_init
from polyp_tpu.train.scratch_ddpm import create_ddpm_state, ddpm_train_step
from polyp_tpu.train.sd_finetune import (
    create_sd_train_state,
    init_trainable,
    sd_lora_train_step,
)
from tests.test_trainers import CFG, SCHED, TINY_UNET, _images, sd_stack  # noqa: F401
import pytest

pytestmark = pytest.mark.slow  # compile-heavy


class TestEpochCheckpointer:
    def test_save_restore_roundtrip(self, tmp_path):
        state = create_ddpm_state(CFG, TINY_UNET, jax.random.PRNGKey(0), 16)
        state, _ = ddpm_train_step(state, SCHED, jnp.asarray(_images(4)),
                                   jax.random.PRNGKey(1))
        ckptr = EpochCheckpointer(tmp_path, every=1)
        assert ckptr.save(epoch=0, state=state)
        init = create_ddpm_state(CFG, TINY_UNET, jax.random.PRNGKey(0), 16)
        restored, next_epoch = resume_or_init(ckptr, init)
        assert next_epoch == 1
        assert int(restored.step) == 1
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_every_and_prune(self, tmp_path):
        state = create_ddpm_state(CFG, TINY_UNET, jax.random.PRNGKey(0), 16)
        ckptr = EpochCheckpointer(tmp_path, every=2, keep=2)
        saved = [ckptr.save(e, state) for e in range(6)]
        assert saved == [False, True, False, True, False, True]
        snaps = sorted(p.name for p in tmp_path.glob("epoch_*"))
        assert snaps == ["epoch_3", "epoch_5"]
        assert ckptr.latest_epoch() == 5

    def test_resume_without_snapshot(self, tmp_path):
        init = create_ddpm_state(CFG, TINY_UNET, jax.random.PRNGKey(0), 16)
        state, epoch = resume_or_init(EpochCheckpointer(tmp_path), init)
        assert epoch == 0


class TestRemat:
    def test_remat_step_matches_plain(self, sd_stack):  # noqa: F811
        unet, vae, text, frozen = sd_stack
        lcfg = LoRAConfig(rank=2, dropout=0.0)
        adapter = init_lora(frozen.unet_params, lcfg, jax.random.PRNGKey(1))
        ids = jnp.zeros((1, 16), jnp.int32)
        images = jnp.asarray(_images(2))

        def two_steps(components):
            # the train step donates its state; give each run private buffers
            fresh = jax.tree_util.tree_map(jnp.copy, adapter)
            state = create_sd_train_state(CFG, init_trainable(fresh))
            for i in range(2):
                state, loss = sd_lora_train_step(
                    state, components, SCHED, images, ids,
                    jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(9 + i), lcfg)
            return state, float(loss)

        _, plain = two_steps(frozen)
        _, remat = two_steps(frozen.with_remat())
        assert plain == np.float32(remat) or abs(plain - remat) < 1e-5
