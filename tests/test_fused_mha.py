"""Fused MHA Pallas kernel (ops/fused_mha.py): numerics vs the unfused
reference, masked cross-attention padding, gradients through the custom_vjp,
and the Attention-module dispatch contract (param tree unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.ops import fused_mha as fm


def _weights(key, c, ckv, h, d, co):
    wq = jax.random.normal(jax.random.fold_in(key, 1), (c, h * d)) * 0.1
    wk = jax.random.normal(jax.random.fold_in(key, 2), (ckv, h * d)) * 0.1
    wv = jax.random.normal(jax.random.fold_in(key, 3), (ckv, h * d)) * 0.1
    wo = jax.random.normal(jax.random.fold_in(key, 4), (h * d, co)) * 0.1
    return wq, wk, wv, wo


@pytest.mark.parametrize("tk,ckv", [(1024, 64), (77, 48), (256, 64)])
def test_fused_matches_reference(tk, ckv):
    """Self- and cross-attention (incl. the 77→128 kv pad+mask path) match
    the unfused math; interpret mode runs the exact TPU grid/scratch flow."""
    key = jax.random.PRNGKey(0)
    b, tq, c, h, d = 2, 1024, 64, 2, 24  # d=24 pads to 64 in-kernel
    x = jax.random.normal(key, (b, tq, c), jnp.float32) * 0.3
    ctx = x if (tk == tq and ckv == c) else \
        jax.random.normal(jax.random.fold_in(key, 9), (b, tk, ckv)) * 0.3
    wq, wk, wv, wo = _weights(key, c, ckv, h, d, c)
    ours = fm.fused_mha(x, ctx, wq, wk, wv, wo, num_heads=h, head_dim=d,
                        block_q=256, block_k=256, interpret=True)
    ref = fm.reference_mha(x, ctx, wq, wk, wv, wo, num_heads=h, head_dim=d)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_mha_grads_match_reference():
    """custom_vjp backward (reference recompute) gives exact grads for x,
    ctx AND all four projection weights — the training contract."""
    key = jax.random.PRNGKey(1)
    b, tq, tk, c, ckv, h, d = 1, 256, 77, 32, 24, 2, 16
    x = jax.random.normal(key, (b, tq, c)) * 0.3
    ctx = jax.random.normal(jax.random.fold_in(key, 9), (b, tk, ckv)) * 0.3
    wq, wk, wv, wo = _weights(key, c, ckv, h, d, c)
    g = jax.random.normal(jax.random.fold_in(key, 8), (b, tq, c))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * g)

    fused = loss(lambda *a: fm.fused_mha(*a, num_heads=h, head_dim=d,
                                         block_q=128, block_k=128,
                                         interpret=True))
    ref = loss(lambda *a: fm.reference_mha(*a, num_heads=h, head_dim=d))
    ga = jax.grad(fused, argnums=tuple(range(6)))(x, ctx, wq, wk, wv, wo)
    gb = jax.grad(ref, argnums=tuple(range(6)))(x, ctx, wq, wk, wv, wo)
    for ours, want in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)


def test_attention_module_param_tree_unchanged():
    """The Attention rewrite (explicit _ProjParams + fused dispatch) must
    keep the exact nn.Dense param tree: to_q/to_k/to_v[/kernel] and
    to_out/{kernel,bias} — the LoRA-surgery and importer contract."""
    from polyp_tpu.models.unet_blocks import Attention

    attn = Attention(num_heads=2, head_dim=8, qkv_bias=False)
    params = attn.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)))["params"]
    assert set(params) == {"to_q", "to_k", "to_v", "to_out"}
    for name in ("to_q", "to_k", "to_v"):
        assert set(params[name]) == {"kernel"}
        assert params[name]["kernel"].shape == (16, 16)
    assert set(params["to_out"]) == {"kernel", "bias"}

    biased = Attention(num_heads=1, head_dim=16, qkv_bias=True)
    bparams = biased.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)))["params"]
    assert set(bparams["to_q"]) == {"kernel", "bias"}


def test_dispatch_policy(monkeypatch):
    from polyp_tpu.ops.attention import use_fused_mha

    x = jnp.zeros((2, 1024, 320))
    # measured-parity negative result: OFF unless explicitly opted in
    # (delenv: the developer running the suite may have the opt-in exported)
    monkeypatch.delenv("POLYP_FUSED_MHA", raising=False)
    assert not use_fused_mha(x, x, 8, 40, False, is_self=True)
    monkeypatch.setenv("POLYP_FUSED_MHA", "1")
    on_tpu = jax.default_backend() == "tpu"
    # opted in, self-attention at 1024 tokens: engages on TPU only
    assert use_fused_mha(x, x, 8, 40, False, is_self=True) == on_tpu
    # cross-attention: measured slower than XLA -> never fused
    ctx = jnp.zeros((2, 77, 768))
    assert not use_fused_mha(x, ctx, 8, 40, False, is_self=False)
    # biased projections (VAE) and short sequences stay on XLA
    assert not use_fused_mha(x, x, 8, 40, True, is_self=True)
    short = jnp.zeros((2, 256, 320))
    assert not use_fused_mha(short, short, 8, 40, False, is_self=True)


def test_non_divisible_block_q():
    """tq not divisible by block_q (e.g. 384px latents → 2304 tokens with
    block_q=1024): the impl must shrink block_q to a divisor instead of
    silently leaving trailing query rows uncomputed."""
    key = jax.random.PRNGKey(5)
    b, tq, c, h, d = 1, 384, 32, 2, 16  # gcd(256, 384) = 128
    x = jax.random.normal(key, (b, tq, c), jnp.float32) * 0.3
    wq, wk, wv, wo = _weights(key, c, c, h, d, c)
    ours = fm.fused_mha(x, x, wq, wk, wv, wo, num_heads=h, head_dim=d,
                        block_q=256, block_k=128, interpret=True)
    ref = fm.reference_mha(x, x, wq, wk, wv, wo, num_heads=h, head_dim=d)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_dispatch_skips_fused_under_quantization(monkeypatch):
    """--quantize w8a8 + POLYP_FUSED_MHA=1: the bf16-only fused kernel must
    yield to the quant-aware unfused path."""
    from polyp_tpu.ops import quant
    from polyp_tpu.ops.attention import use_fused_mha

    monkeypatch.setenv("POLYP_FUSED_MHA", "1")
    x = jnp.zeros((2, 1024, 320))
    with quant.override("w8a8"):
        assert not use_fused_mha(x, x, 8, 40, False, is_self=True)
