"""Fused GroupNorm(+SiLU)(+int8) Pallas kernel vs the XLA composition
(interpret mode on CPU; the same kernel compiles natively on TPU via the
GroupNorm module dispatch), plus the producer-side w8a8_static int8
handoff wiring in ResnetBlock/QConv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.models.unet_blocks import ResnetBlock2D
from polyp_tpu.ops import fused_gn, group_norm, quant


def _rand(key, shape, scale=2.0, shift=0.3):
    return jax.random.normal(key, shape, jnp.float32) * scale + shift


@pytest.mark.parametrize("h,w,c,groups,act", [
    (8, 8, 128, 32, "silu"),   # lane-aligned
    (4, 4, 320, 32, None),     # SD level-0 width (320 = 2.5 × 128 lanes)
    (8, 8, 64, 32, "silu"),    # gcd group fallback (64 ⇒ g=32, cg=2)
    (2, 8, 192, 32, "silu"),   # gcd ⇒ g=32? no: gcd(192,32)=32, cg=6
])
def test_kernel_matches_group_norm(h, w, c, groups, act):
    key = jax.random.PRNGKey(0)
    x = _rand(key, (3, h, w, c))
    gamma = _rand(jax.random.fold_in(key, 1), (c,), 0.5, 1.0)
    beta = _rand(jax.random.fold_in(key, 2), (c,), 0.2, 0.0)
    ref = group_norm(x, gamma, beta, groups, 1e-5, act)
    ours = fused_gn.fused_group_norm(x, gamma, beta, None, num_groups=groups,
                                     eps=1e-5, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_matches_group_norm():
    key = jax.random.PRNGKey(3)
    x = _rand(key, (2, 8, 8, 128)).astype(jnp.bfloat16)
    gamma = _rand(jax.random.fold_in(key, 1), (128,), 0.5, 1.0)
    beta = _rand(jax.random.fold_in(key, 2), (128,), 0.2, 0.0)
    ref = group_norm(x, gamma, beta, 32, 1e-5, "silu")
    ours = fused_gn.fused_group_norm(x, gamma, beta, None, num_groups=32,
                                     eps=1e-5, act="silu", interpret=True)
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("act", [None, "silu"])
def test_quantized_epilogue(act):
    key = jax.random.PRNGKey(7)
    x = _rand(key, (2, 8, 8, 128))
    gamma = _rand(jax.random.fold_in(key, 1), (128,), 0.5, 1.0)
    beta = _rand(jax.random.fold_in(key, 2), (128,), 0.2, 0.0)
    s = jnp.float32(0.0123)
    ref = fused_gn.reference_gn_q8(x, gamma, beta, s, 32, 1e-5, act)
    ours = fused_gn.fused_group_norm(x, gamma, beta, s, num_groups=32,
                                     eps=1e-5, act=act, interpret=True)
    assert ours.dtype == jnp.int8
    diff = np.abs(np.asarray(ours, np.int32) - np.asarray(ref, np.int32))
    # f32 in both paths ⇒ at most boundary-rounding LSB flips
    assert (diff > 1).mean() == 0.0
    assert (diff > 0).mean() < 0.01


def test_supported_predicate():
    on_tpu = jax.default_backend() == "tpu"
    ok = jnp.zeros((2, 32, 32, 320))
    assert fused_gn.supported(ok, 32) == on_tpu
    # lane-misaligned channels
    assert not fused_gn.supported(jnp.zeros((2, 8, 8, 96)), 32)
    # per-sample slab beyond the VMEM budget (VAE decode scale)
    assert not fused_gn.supported(jnp.zeros((1, 256, 256, 128)), 32)
    # non-NHWC rank
    assert not fused_gn.supported(jnp.zeros((2, 64, 320)), 32)
    # int8 epilogue needs 32-aligned spatial extent (sublane tile): the SD
    # 4×4 level qualifies bf16 but not quantized
    deep = jnp.zeros((2, 4, 4, 1280))
    assert fused_gn.supported(deep, 32) == on_tpu
    assert not fused_gn.supported(deep, 32, quantize=True)


def test_dispatch_entry_refuses_grad(monkeypatch):
    import functools

    monkeypatch.setattr(
        fused_gn, "fused_group_norm",
        functools.partial(fused_gn.fused_group_norm, interpret=True))
    x = _rand(jax.random.PRNGKey(0), (1, 4, 4, 128))
    gamma = jnp.ones((128,))
    beta = jnp.zeros((128,))

    def loss(x):
        return jnp.sum(fused_gn.group_norm_fused(x, gamma, beta, None,
                                                 32, 1e-5, "silu"))

    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(loss)(x)


class TestProducerSideHandoff:
    """ResnetBlock w8a8_static: GN emits int8 with the consuming conv's
    calibrated scale; QConv consumes it directly. On CPU the XLA
    producer-side chain runs (the Pallas kernel needs TPU) — the consumer-
    vs-producer A/B must be numerically identical (same scale, same
    rounding, same int8 conv)."""

    def _block_apply(self, monkeypatch, gn_q8: str):
        monkeypatch.setenv("POLYP_GN_Q8", gn_q8)
        block = ResnetBlock2D(out_channels=128, dropout=0.1)
        key = jax.random.PRNGKey(11)
        x = _rand(key, (2, 8, 8, 128), 1.0, 0.0)
        temb = _rand(jax.random.fold_in(key, 1), (2, 64), 1.0, 0.0)
        params = block.init(jax.random.PRNGKey(0), x, temb)
        # top-level module: quant paths are just the conv names
        scales = {"conv1": 0.021, "conv2": 0.017}
        with quant.override("w8a8_static", scales=scales):
            return block.apply(params, x, temb, deterministic=True)

    def test_handoff_matches_consumer_side(self, monkeypatch):
        producer = self._block_apply(monkeypatch, "1")
        consumer = self._block_apply(monkeypatch, "0")
        np.testing.assert_allclose(np.asarray(producer),
                                   np.asarray(consumer),
                                   rtol=1e-6, atol=1e-6)

    def test_handoff_changes_nothing_without_quant(self, monkeypatch):
        monkeypatch.setenv("POLYP_GN_Q8", "1")
        block = ResnetBlock2D(out_channels=128)
        key = jax.random.PRNGKey(12)
        x = _rand(key, (2, 8, 8, 128), 1.0, 0.0)
        temb = _rand(jax.random.fold_in(key, 1), (2, 64), 1.0, 0.0)
        params = block.init(jax.random.PRNGKey(0), x, temb)
        plain = block.apply(params, x, temb)
        with quant.override(None):
            under_none = block.apply(params, x, temb)
        np.testing.assert_array_equal(np.asarray(plain),
                                      np.asarray(under_none))

    def test_missing_scale_keeps_full_precision(self, monkeypatch):
        """A layer with no calibration record must not be handed int8."""
        monkeypatch.setenv("POLYP_GN_Q8", "1")
        block = ResnetBlock2D(out_channels=128)
        key = jax.random.PRNGKey(13)
        x = _rand(key, (2, 8, 8, 128), 1.0, 0.0)
        temb = _rand(jax.random.fold_in(key, 1), (2, 64), 1.0, 0.0)
        params = block.init(jax.random.PRNGKey(0), x, temb)
        plain = block.apply(params, x, temb)
        with quant.override("w8a8_static", scales={"conv2": 0.02}):
            mixed = block.apply(params, x, temb)
        # conv1 full precision, conv2 quantized — still finite and close
        assert np.isfinite(np.asarray(mixed)).all()
        rel = (np.linalg.norm(np.asarray(mixed) - np.asarray(plain))
               / np.linalg.norm(np.asarray(plain)))
        assert rel < 0.1
