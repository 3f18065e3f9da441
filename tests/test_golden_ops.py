"""Closed-form golden tests for core ops (SURVEY §4 plan item b): each op is
checked against an independent NumPy computation, not a snapshot."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.models.unet_blocks import sinusoidal_time_embedding
from polyp_tpu.ops import dot_product_attention, group_norm


def test_sinusoidal_embedding_closed_form():
    dim, t = 8, np.array([0, 1, 1000])
    emb = np.asarray(sinusoidal_time_embedding(jnp.asarray(t), dim))
    half = dim // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = t[:, None] * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # fp32 sin/cos at t·f up to 1000 → ~1e-5 absolute error
    np.testing.assert_allclose(emb, expected, rtol=1e-4, atol=1e-5)


def test_group_norm_matches_manual():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    scale = rng.normal(size=8).astype(np.float32)
    bias = rng.normal(size=8).astype(np.float32)
    got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias), num_groups=2, eps=1e-5))
    xg = x.reshape(2, 4, 4, 2, 4)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    norm = ((xg - mean) / np.sqrt(var + 1e-5)).reshape(2, 4, 4, 8)
    np.testing.assert_allclose(got, norm * scale + bias, rtol=1e-4, atol=1e-5)


def test_group_norm_silu_fusion():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2, 2, 4)),
                    jnp.float32)
    ones, zeros = jnp.ones(4), jnp.zeros(4)
    plain = np.asarray(group_norm(x, ones, zeros, 2))
    fused = np.asarray(group_norm(x, ones, zeros, 2, act="silu"))
    np.testing.assert_allclose(fused, plain / (1 + np.exp(-plain)),
                               rtol=1e-5, atol=1e-6)


def test_attention_matches_manual_softmax():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(1, 5, 2, 4)).astype(np.float32)
    k = rng.normal(size=(1, 7, 2, 4)).astype(np.float32)
    v = rng.normal(size=(1, 7, 2, 4)).astype(np.float32)
    got = np.asarray(dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                           jnp.asarray(v)))
    expected = np.empty_like(q[:, :, :, :])
    for h in range(2):
        s = q[0, :, h] @ k[0, :, h].T / math.sqrt(4)
        p = np.exp(s - s.max(axis=1, keepdims=True))
        p /= p.sum(axis=1, keepdims=True)
        expected[0, :, h] = p @ v[0, :, h]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_causal_attention_masks_future():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 4, 1, 4)), jnp.float32)
    k, v = q, q
    got = np.asarray(dot_product_attention(q, k, v, is_causal=True))
    # position 0 attends only to itself → output = v[0]
    np.testing.assert_allclose(got[0, 0, 0], np.asarray(v)[0, 0, 0],
                               rtol=1e-5)
