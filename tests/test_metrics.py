"""Metrics parity vs sklearn (the reference's metric library,
classifier.py:251-292)."""

import numpy as np
import pytest

from polyp_tpu.eval import metrics as M

sklearn_metrics = pytest.importorskip("sklearn.metrics")
from sklearn.utils.class_weight import compute_class_weight  # noqa: E402


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_classes", [2, 3])
def test_weighted_prf_matches_sklearn(seed, n_classes):
    rng = np.random.default_rng(seed)
    y_true = rng.integers(0, n_classes, 200)
    y_pred = rng.integers(0, n_classes, 200)
    p, r, f = M.precision_recall_f1(y_true, y_pred, "weighted")
    assert p == pytest.approx(sklearn_metrics.precision_score(
        y_true, y_pred, average="weighted", zero_division=0))
    assert r == pytest.approx(sklearn_metrics.recall_score(
        y_true, y_pred, average="weighted", zero_division=0))
    assert f == pytest.approx(sklearn_metrics.f1_score(
        y_true, y_pred, average="weighted", zero_division=0))


def test_confusion_matrix_and_accuracy_match_sklearn():
    rng = np.random.default_rng(3)
    y_true = rng.choice(["AD", "HP", "ASS"], 100)
    y_pred = rng.choice(["AD", "HP", "ASS"], 100)
    labels = sorted(set(y_true))
    np.testing.assert_array_equal(
        M.confusion_matrix(y_true, y_pred, labels),
        sklearn_metrics.confusion_matrix(y_true, y_pred, labels=labels))
    assert M.accuracy_score(y_true, y_pred) == pytest.approx(
        sklearn_metrics.accuracy_score(y_true, y_pred))


def test_classification_report_matches_sklearn():
    rng = np.random.default_rng(4)
    y_true = rng.integers(0, 3, 150)
    y_pred = rng.integers(0, 3, 150)
    ours = M.classification_report(y_true, y_pred)
    ref = sklearn_metrics.classification_report(y_true, y_pred, output_dict=True,
                                                zero_division=0)
    for key in ref:
        if key == "accuracy":
            assert ours["accuracy"] == pytest.approx(ref["accuracy"])
        else:
            for stat in ("precision", "recall", "f1-score", "support"):
                assert ours[key][stat] == pytest.approx(ref[key][stat]), (key, stat)


def test_balanced_class_weights_matches_sklearn():
    labels = np.array([0] * 535 + [1] * 122 + [2] * 131)  # AD/ASS/HP train counts
    ours = M.balanced_class_weights(labels)
    classes = np.unique(labels)
    ref = compute_class_weight("balanced", classes=classes, y=labels)
    for c, w in zip(classes, ref):
        assert ours[int(c)] == pytest.approx(w)


def test_zero_division_yields_zero():
    # class 1 never predicted → precision 0 for it, no NaNs anywhere
    y_true = [0, 1, 1, 0]
    y_pred = [0, 0, 0, 0]
    p, r, f = M.precision_recall_f1(y_true, y_pred, "weighted")
    assert np.isfinite([p, r, f]).all()
