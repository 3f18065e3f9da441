"""Hybrid-precision trajectory (`quant_fp_head` / `quant_fp_tail`): the
first / final N inference steps run the full-precision UNet while the rest
run quantized — pipeline._precision_split resolves the knobs and the
samplers run the trajectory as consecutive scan SEGMENTS with continued
step indices (diffusion/samplers._as_segments), one model function per
segment. Segments (not a lax.cond in the scan body) because XLA does not
hoist the loop-invariant int8 weight quantization out of a conditional
branch — verified on HLO, 58/58 weight-quantize rounds stayed in-loop
under cond vs 0 under segments.

Measured finding (tools/quant_sensitivity.py --fp-split; BASELINE.md): on
a deterministic sampler the EARLY evals set the whole trajectory, so a
small bf16 HEAD makes the quantized run reproduce the full-precision
images almost exactly — the effective direction for the fidelity gate.
The tail knob is the symmetric control."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.diffusion import DiffusionSchedule, sample, sampler_timesteps
from polyp_tpu.diffusion.schedule import inference_timesteps
from polyp_tpu.ops import quant
from polyp_tpu.pipeline import (PixelDiffusionSampler, _precision_segments,
                                _precision_split)


class TestSamplerTimesteps:
    def test_matches_each_samplers_convention(self):
        """The registry must reproduce the exact per-sampler spacing the
        sampler bodies use internally."""
        T, S = 1000, 25
        want = {
            "ddpm": inference_timesteps(T, S, "leading", 0),
            "ddim": inference_timesteps(T, S, "leading", 1),
            "dpmpp_2m": inference_timesteps(T, S, "linspace"),
            "unipc": inference_timesteps(T, S, "linspace"),
        }
        for name, ts in want.items():
            got = np.asarray(sampler_timesteps(name, T, S))
            np.testing.assert_array_equal(got, np.asarray(ts), err_msg=name)
            assert (np.diff(got) < 0).all(), f"{name} not descending"
            assert got.min() >= 0 and got.max() < T

    def test_unknown_sampler_raises(self):
        with pytest.raises(KeyError):
            sampler_timesteps("nope", 1000, 25)


class TestPrecisionSplit:
    def test_no_quantize_is_passthrough(self):
        assert _precision_split(25, None, 3, 10) == (None, None)

    def test_zero_split_is_pure_mode(self):
        assert _precision_split(25, "w8a8", 0, 0) == ("w8a8", None)

    def test_full_split_drops_the_mode(self):
        assert _precision_split(25, "w8a8", 0, 25) == (None, None)
        assert _precision_split(25, "w8a8", 13, 12) == (None, None)
        assert _precision_split(25, "w8a8", 99, 0) == (None, None)

    def test_segments_partition_exactly(self):
        q, fp = object(), object()
        for fp_head, fp_tail in ((1, 0), (0, 1), (3, 0), (0, 5), (2, 2)):
            mode, split = _precision_split(25, "w8a8", fp_head, fp_tail)
            assert mode == "w8a8" and split == (fp_head, fp_tail)
            segs = _precision_segments(q, fp, 25, split)
            assert segs == [(fp_head, fp), (25 - fp_head - fp_tail, q),
                            (fp_tail, fp)]
            assert sum(n for n, _ in segs) == 25


class TestSegmentedScanEquivalence:
    def test_segments_bit_identical_to_single_scan(self):
        """Running any sampler as [(k, fn), (S-k, fn)] segments with the
        SAME fn must be bit-identical to the single scan — continued step
        indices preserve the multistep solvers' history/order ramp
        exactly. This is the property that makes the hybrid-precision
        endpoints exact."""
        sched = DiffusionSchedule.create(50)
        key = jax.random.PRNGKey(0)
        shape = (2, 8, 8, 3)

        def fn(x, t):
            # t-dependent, x-dependent toy denoiser
            return x * (0.05 + 0.001 * t[0].astype(jnp.float32))

        for name in ("ddpm", "ddim", "dpmpp_2m", "unipc"):
            plain = sample(name, fn, sched, shape, key, 6)
            for segs in ([(2, fn), (4, fn)], [(1, fn), (3, fn), (2, fn)]):
                seg = sample(name, segs, sched, shape, key, 6)
                np.testing.assert_array_equal(np.asarray(seg),
                                              np.asarray(plain),
                                              err_msg=f"{name} {segs}")

    def test_bad_segment_total_raises(self):
        sched = DiffusionSchedule.create(50)

        def fn(x, t):
            return x * 0.1

        with pytest.raises(ValueError, match="segments cover"):
            sample("ddim", [(2, fn), (2, fn)], sched, (1, 4, 4, 3),
                   jax.random.PRNGKey(0), 6)


def _tiny_pixel_model():
    from polyp_tpu.models import UNet2D

    model = UNet2D(block_out_channels=(16, 32),
                   down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                   up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                   layers_per_block=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,), jnp.int32))["params"]
    return model, params


class TestPixelSamplerHybrid:
    def _run(self, model, params, sched, quantize, fp_head=0, fp_tail=0):
        sampler = PixelDiffusionSampler(model, params, sched, 16,
                                        sampler="ddim", num_steps=4,
                                        quantize=quantize,
                                        quant_fp_head=fp_head,
                                        quant_fp_tail=fp_tail)
        return np.asarray(sampler(2, jax.random.PRNGKey(3)), np.float32)

    def test_hybrid_endpoints_and_midpoints(self, monkeypatch):
        """A split covering every step reproduces the bf16 trajectory
        exactly; 0/0 reproduces the pure quantized one; partial splits are
        finite and distinct from both (both regimes actually execute)."""
        monkeypatch.setattr(quant, "MIN_QUANT_CHANNELS", 8)
        model, params = _tiny_pixel_model()
        sched = DiffusionSchedule.create(10)

        full = self._run(model, params, sched, None)
        q = self._run(model, params, sched, "w8a8")
        assert not np.allclose(q, full), "quantized mode did not engage"

        for head, tail in ((4, 0), (0, 4), (2, 2)):
            all_fp = self._run(model, params, sched, "w8a8", head, tail)
            np.testing.assert_allclose(all_fp, full, rtol=0, atol=0)

        mid_head = self._run(model, params, sched, "w8a8", fp_head=2)
        mid_tail = self._run(model, params, sched, "w8a8", fp_tail=2)
        for mid in (mid_head, mid_tail):
            assert np.isfinite(mid).all()
            assert not np.allclose(mid, full)
            assert not np.allclose(mid, q)

    def test_hybrid_composes_with_static_scales(self, monkeypatch, tmp_path):
        """w8a8_static + fp_head: calibration still runs, the quantized
        segment gathers per-timestep scales, and the output is finite."""
        monkeypatch.setattr(quant, "MIN_QUANT_CHANNELS", 8)
        monkeypatch.setenv("POLYP_QUANT_CACHE", str(tmp_path))
        model, params = _tiny_pixel_model()
        sched = DiffusionSchedule.create(10)

        out = self._run(model, params, sched, "w8a8_static", fp_head=1,
                        fp_tail=1)
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(out).all()
