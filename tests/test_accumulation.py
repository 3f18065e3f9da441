"""Gradient-accumulation equivalence and schedule-horizon tests.

Gradient accumulation is the reference C13's signature feature
(train_with_lora_all_classes.py:121-176: loss/grad scaling by
accumulation_steps, optimizer stepped every N batches). Here it is
optax.MultiSteps (train/sd_finetune.py::make_sd_optimizer); these tests pin
the two properties a wiring mistake would silently break:

1. accumulation_steps=2 over half-batches produces the SAME update as
   accumulation_steps=1 over the full batch (grad averaging + single inner
   step), both with the real make_sd_optimizer and through the real
   sd_lora_train_step;
2. the LR schedule advances per EFFECTIVE update, and with_schedule derives
   the horizon in effective updates, so the cosine completes exactly at the
   end of training instead of stopping at 1/N.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.train.sd_finetune import make_sd_optimizer


def _leaves_allclose(a, b, rtol=1e-6, atol=1e-7):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_with_schedule_counts_effective_updates():
    cfg = DiffusionConfig(num_epochs=4, accumulation_steps=1)
    full = cfg.with_schedule(10)
    half = replace(cfg, accumulation_steps=2).with_schedule(20)
    # same data, half micro-batch size → same number of optimizer updates
    assert full.total_train_steps == 40
    assert half.total_train_steps == 40
    assert half.lr_warmup_steps == full.lr_warmup_steps


def test_half_batches_match_full_batch():
    """accumulation_steps=2 at batch B/2 == accumulation_steps=1 at batch B:
    identical final params and identical per-update losses, through the real
    optimizer factory (mean-reduced loss → half-batch grads average to the
    full-batch grad)."""
    cfg_full = DiffusionConfig(num_epochs=1, accumulation_steps=1,
                               learning_rate=1e-2).with_schedule(2)
    cfg_half = replace(cfg_full, accumulation_steps=2).with_schedule(4)
    assert cfg_full.total_train_steps == cfg_half.total_train_steps == 2

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)  # 2 full batches
    params0 = {"w": jnp.asarray([0.5, -1.0, 2.0]),
               "b": jnp.asarray([0.1])}

    def loss_fn(params, batch):
        pred = batch @ params["w"] + params["b"]
        return jnp.mean((pred - 1.0) ** 2)

    grad = jax.grad(loss_fn)

    def run(tx, batches):
        params = params0
        opt_state = tx.init(params)
        for b in batches:
            updates, opt_state = tx.update(grad(params, b), opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params

    p_full = run(make_sd_optimizer(cfg_full), [data[0], data[1]])
    p_half = run(make_sd_optimizer(cfg_half),
                 [data[0, :4], data[0, 4:], data[1, :4], data[1, 4:]])
    _leaves_allclose(p_full, p_half)
    # and the wiring is discriminating: 4 half-batches at accum=1 diverge
    p_wrong = run(make_sd_optimizer(cfg_full),
                  [data[0, :4], data[0, 4:]])
    assert not all(
        np.allclose(x, y, rtol=1e-6)
        for x, y in zip(jax.tree_util.tree_leaves(p_full),
                        jax.tree_util.tree_leaves(p_wrong)))


def test_sd_train_step_accumulation_equivalence():
    """Through the REAL sd_lora_train_step: two accumulation micro-steps on
    the same batch+key must equal one plain step on that batch (grads
    average to themselves; inner optimizer steps once; schedule advances
    once)."""
    from polyp_tpu.cli.common import load_sd_stack
    from polyp_tpu.cli.sd_common import make_components
    from polyp_tpu.diffusion import DiffusionSchedule
    from polyp_tpu.lora import LoRAConfig, init_lora
    from polyp_tpu.train.sd_finetune import (create_sd_train_state,
                                             init_trainable,
                                             sd_lora_train_step)

    stack = load_sd_stack(None, tiny=True)
    frozen = make_components(stack)
    sched = DiffusionSchedule.create(50)
    lcfg = LoRAConfig(rank=2, dropout=0.0)
    # host copy: sd_lora_train_step donates its state, so each train state
    # needs its own device buffers
    adapter0 = jax.device_get(init_lora(stack.unet_params, lcfg,
                                        jax.random.PRNGKey(1)))
    fresh = lambda: jax.tree_util.tree_map(jnp.asarray, adapter0)

    cfg_plain = DiffusionConfig(image_size=32, num_epochs=1,
                                accumulation_steps=1).with_schedule(1)
    cfg_accum = replace(cfg_plain, accumulation_steps=2).with_schedule(2)
    assert cfg_plain.total_train_steps == cfg_accum.total_train_steps == 1

    images = jnp.asarray(
        np.random.default_rng(2).integers(0, 255, (2, 32, 32, 3), np.uint8))
    ids = jnp.zeros((1, 16), jnp.int32)
    sids = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(3)

    s_plain = create_sd_train_state(cfg_plain, init_trainable(fresh()))
    s_plain, loss_plain = sd_lora_train_step(
        s_plain, frozen, sched, images, ids, sids, key, lcfg)

    s_acc = create_sd_train_state(cfg_accum, init_trainable(fresh()))
    s_acc, loss_a = sd_lora_train_step(
        s_acc, frozen, sched, images, ids, sids, key, lcfg)
    # after the first micro-step nothing must have been applied yet
    _leaves_allclose(s_acc.trainable, init_trainable(adapter0))
    assert int(s_acc.opt_state.gradient_step) == 0
    s_acc, loss_b = sd_lora_train_step(
        s_acc, frozen, sched, images, ids, sids, key, lcfg)

    assert np.isclose(float(loss_a), float(loss_plain))
    assert np.isclose(float(loss_b), float(loss_plain))
    assert int(s_acc.opt_state.gradient_step) == 1
    _leaves_allclose(s_acc.trainable, s_plain.trainable, rtol=1e-5, atol=1e-6)
