"""End-to-end classifier training smoke on a learnable synthetic task
(SURVEY §4 plan item e)."""

import dataclasses

import jax
import numpy as np
import pytest

from polyp_tpu.configs import ClassificationConfig
from polyp_tpu.data.pipeline import Loader, weighted_sample_weights
from polyp_tpu.eval.metrics import balanced_class_weights
from polyp_tpu.train.classifier import (
    create_classifier_state,
    cross_entropy,
    evaluate_classifier,
    train_classifier,
    train_step,
)
from polyp_tpu.utils.rng import key_for

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy


def _toy_data(n=32, size=32, seed=0):
    """Two classes separable by mean brightness."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n).astype(np.int32)
    base = np.where(labels[:, None, None, None] == 0, 60, 190)
    noise = rng.integers(0, 40, (n, size, size, 3))
    images = np.clip(base + noise, 0, 255).astype(np.uint8)
    return images, labels


@pytest.fixture(scope="module")
def tiny_config():
    return ClassificationConfig(image_size=32, batch_size=8, num_epochs=2,
                                hidden_features=16, learning_rate=1e-3,
                                patience=10, mixed_precision="fp32",
                                weighted_sampling=False)


def test_train_loss_decreases(tiny_config):
    images, labels = _toy_data()
    state, _ = create_classifier_state(tiny_config, 2, jax.random.PRNGKey(0))
    cw = None
    losses = []
    for step in range(8):
        idx = slice((step % 4) * 8, (step % 4) * 8 + 8)
        s_images = jax.numpy.asarray(images[idx])
        s_labels = jax.numpy.asarray(labels[idx])
        state, loss, _ = train_step(state, s_images, s_labels,
                                    key_for(0, "t", step), cw, "fp32")
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_full_train_and_evaluate(tiny_config):
    images, labels = _toy_data(48)
    state, _ = create_classifier_state(tiny_config, 2, jax.random.PRNGKey(1))
    train_loader = Loader(images[:32], labels[:32], 8, seed=0, drop_last=True)
    val_loader = Loader(images[32:40], labels[32:40], 8, seed=0, shuffle=False)
    test_loader = Loader(images[40:], labels[40:], 8, seed=0, shuffle=False)

    logged = []
    state, result = train_classifier(tiny_config, state, train_loader,
                                     val_loader,
                                     log=lambda k, v, s: logged.append((k, v, s)))
    assert len(result.train_loss_hist) == 2
    assert len(result.val_loss_hist) == 2
    assert result.best_params is not None
    assert any(k == "val_accuracy" for k, _, _ in logged)

    best_state = state.replace(params=result.best_params,
                               batch_stats=result.best_batch_stats)
    metrics = evaluate_classifier(best_state, test_loader,
                                  {0: "AD", 1: "HP"}, "fp32")
    assert set(metrics) >= {"accuracy", "precision", "recall", "f1_score",
                            "confusion_matrix", "report"}
    assert metrics["confusion_matrix"].sum() == 8


def test_weighted_ce_matches_manual():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 1.0]])
    labels = jnp.asarray([0, 1])
    w = jnp.asarray([0.5, 2.0])
    got = cross_entropy(logits, labels, w)
    logp = jax.nn.log_softmax(logits)
    expected = -(0.5 * logp[0, 0] + 2.0 * logp[1, 1]) / 2.5
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-6)


def test_early_stopping_counts_without_reset(tiny_config, monkeypatch):
    """Reference contract: the patience counter never resets on improvement
    (classifier.py:193-199). Feed a crafted val-loss sequence."""
    import polyp_tpu.train.classifier as C

    seq = iter([1.0, 2.0, 0.5, 2.0, 2.0, 2.0])  # improvements at epochs 0,2

    monkeypatch.setattr(C, "_run_validation", lambda *a, **k: (next(seq), 0.5))
    cfg = dataclasses.replace(tiny_config, num_epochs=10, patience=3)
    images, labels = _toy_data(8)
    state, _ = create_classifier_state(cfg, 2, jax.random.PRNGKey(0))
    loader = Loader(images, labels, 8, seed=0)
    _, result = C.train_classifier(cfg, state, loader, loader)
    # non-improving epochs: 1,3,4 → counter hits 3 at epoch 4 despite the
    # improvement at epoch 2
    assert result.stopped_epoch == 4
