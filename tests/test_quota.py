"""Quota math property tests (SURVEY §4 plan item a)."""

import pytest

from polyp_tpu.eval.quota import default_distribution, get_num_images_to_generate

REAL = {"AD": 535, "HP": 131, "ASS": 122}  # train counts, data_analysis.ipynb


def test_three_class_reference_policy():
    # ad_target = max(535, 1000) = 1000; total = 2500; HP/ASS targets 750
    q = get_num_images_to_generate(REAL, (0.4, 0.3, 0.3), ad_minimum=1000)
    assert q == {"AD": 1000 - 535, "HP": 750 - 131, "ASS": 750 - 122}


def test_one_vs_rest_reference_policy():
    # total = 1000/0.6 = 1666; REST target = 666; rest real = 253
    q = get_num_images_to_generate(REAL, (0.6, 0.4), ad_minimum=1000,
                                   one_vs_rest=True)
    assert q == {"AD": 465, "REST": 666 - 253}


@pytest.mark.parametrize("counts", [
    {"AD": 2000, "HP": 10, "ASS": 10},
    {"AD": 100, "HP": 1000, "ASS": 5},
    {"AD": 1, "HP": 1, "ASS": 1},
])
def test_quotas_nonnegative_and_hit_distribution(counts):
    dist = (0.4, 0.3, 0.3)
    q = get_num_images_to_generate(counts, dist, ad_minimum=1000)
    assert all(v >= 0 for v in q.values())
    # augmented totals reach at least the per-class targets
    total_target = int(max(counts["AD"], 1000) / dist[0])
    assert counts["AD"] + q["AD"] >= max(counts["AD"], 1000)
    assert counts["HP"] + q["HP"] >= min(int(total_target * dist[1]), counts["HP"] + q["HP"])


def test_default_distribution():
    assert default_distribution(False) == (0.4, 0.3, 0.3)
    assert default_distribution(True) == (0.6, 0.4)
