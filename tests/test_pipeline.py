"""Generation pipeline: quota loop, file naming, deterministic top-up."""

import jax
import pytest
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


@pytest.mark.slow
class TestGenerateBatch:
    """StableDiffusionSampler.generate_batch: the serving layer's
    micro-batching primitive (serve.py). A sample's output must be a pure
    function of its own (prompt, key) — independent of co-batched samples
    and of pad_to — and multi-prompt batches must match the per-prompt
    for_prompt path sample-for-sample."""

    @pytest.fixture(scope="class")
    def sampler(self):
        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.sd_common import make_sampler
        from polyp_tpu.configs import DiffusionConfig

        stack = load_sd_stack(None, dtype=jnp.float32, tiny=True)
        cfg = DiffusionConfig(image_size=16, num_inference_steps=2,
                              sampler="unipc")
        return make_sampler(stack, stack.unet_params,
                            stack.text_params["params"], cfg)

    def test_coalescing_invariance_at_fixed_pad(self, sampler):
        # the serving contract: with a fixed pad_to (the server's
        # max_batch), every launch runs ONE executable, and a sample row is
        # a pure function of its own (prompt, key) — so solo vs coalesced
        # is bit-identical.
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        solo = np.asarray(
            sampler.generate_batch(["a colon polyp"], [k1], pad_to=4))
        pair = np.asarray(sampler.generate_batch(
            ["a colon polyp", "something else"], [k1, k2], pad_to=4))
        assert pair.shape == (2, 16, 16, 3)
        np.testing.assert_array_equal(pair[0], solo[0])
        assert not np.allclose(pair[1], pair[0]), \
            "distinct (prompt, key) samples must differ"

    def test_pad_to_only_perturbs_rounding(self, sampler):
        # different pad sizes compile different executables whose reduction
        # orders differ — values must agree to fp rounding, not bitwise
        k1 = jax.random.PRNGKey(7)
        unpadded = np.asarray(sampler.generate_batch(["a colon polyp"], [k1]))
        padded = np.asarray(sampler.generate_batch(["a colon polyp"], [k1],
                                                   pad_to=4))
        assert padded.shape == (1, 16, 16, 3)
        np.testing.assert_allclose(padded[0], unpadded[0],
                                   rtol=5e-3, atol=5e-3)

    def test_key_not_prompt_position_drives_noise(self, sampler):
        # same key, same prompt, different batch slot → same image
        k1, k2 = jax.random.split(jax.random.PRNGKey(11))
        a = np.asarray(sampler.generate_batch(
            ["a colon polyp", "other"], [k1, k2], pad_to=4))
        b = np.asarray(sampler.generate_batch(
            ["other", "a colon polyp"], [k2, k1], pad_to=4))
        np.testing.assert_array_equal(a[0], b[1])
        np.testing.assert_array_equal(a[1], b[0])

    def test_mismatched_keys_rejected(self, sampler):
        with pytest.raises(ValueError, match="keys"):
            sampler.generate_batch(["a", "b"], [jax.random.PRNGKey(0)])
        with pytest.raises(ValueError, match="at least one"):
            sampler.generate_batch([], [])
