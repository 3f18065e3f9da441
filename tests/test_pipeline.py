"""Generation pipeline: quota loop, file naming, deterministic top-up."""

import jax
import jax.numpy as jnp
import numpy as np

from polyp_tpu.pipeline import (
    count_samples,
    generate_to_dir,
    to_uint8,
    top_up_samples,
)


def _stub_sampler(batch_size, key):
    """Deterministic pseudo-images derived from the key (stands in for a
    diffusion sampler; same key → same images)."""
    base = jax.random.uniform(key, (batch_size, 8, 8, 3), minval=-1, maxval=1)
    return base


def test_to_uint8_range():
    imgs = to_uint8(jnp.asarray([[[[-1.0, 0.0, 1.0]]]]))
    assert imgs.tolist() == [[[[0, 128, 255]]]]


def test_generate_quota_and_names(tmp_path):
    n = generate_to_dir(_stub_sampler, 5, tmp_path / "AD", eval_batch_size=2,
                        seed=0)
    assert n == 5
    names = sorted(p.name for p in (tmp_path / "AD").iterdir())
    assert names == ["1.png", "2.png", "3.png", "4.png", "5.png"]


def test_progress_callback(tmp_path):
    seen = []
    generate_to_dir(_stub_sampler, 5, tmp_path / "x", eval_batch_size=2,
                    seed=0, progress=lambda a, b: seen.append((a, b)))
    assert seen == [(2, 5), (4, 5), (5, 5)]


def test_top_up_resumes_deterministically(tmp_path):
    full_dir = tmp_path / "full"
    part_dir = tmp_path / "part"
    generate_to_dir(_stub_sampler, 6, full_dir, eval_batch_size=2, seed=7)
    # simulate an interrupted run: only the first 3 images exist
    generate_to_dir(_stub_sampler, 3, part_dir, eval_batch_size=2, seed=7)
    assert count_samples(part_dir) == 3
    added = top_up_samples(_stub_sampler, 6, part_dir, eval_batch_size=2, seed=7)
    assert added == 4  # batch 1 regenerated in full + batch 2
    assert count_samples(part_dir) == 6
    # every file byte-identical to the uninterrupted run
    for i in range(1, 7):
        a = (full_dir / f"{i}.png").read_bytes()
        b = (part_dir / f"{i}.png").read_bytes()
        assert a == b, f"file {i} differs after top-up"


def test_top_up_noop_when_quota_met(tmp_path):
    generate_to_dir(_stub_sampler, 4, tmp_path / "d", eval_batch_size=2, seed=0)
    assert top_up_samples(_stub_sampler, 4, tmp_path / "d", 2, 0) == 0
