"""Pallas flash-attention kernel vs XLA reference (interpret mode on CPU;
the same kernel compiles natively on TPU via ops.attention dispatch)."""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polyp_tpu.ops import flash_attention as fa


def _interpret_flash(q, k, v, block_q=128, block_k=128):
    """Run the real wrapper in interpreter mode (no TPU needed) — exercises
    the K/V-streaming grid (K blocks innermost + scratch carry) exactly as
    compiled on TPU."""
    return fa.flash_attention(q, k, v, block_q=block_q, block_k=block_k,
                              interpret=True)


@pytest.mark.parametrize("tq,tk,d", [(256, 256, 64), (256, 128, 64),
                                     (512, 512, 64)])
def test_flash_matches_xla(tq, tk, d):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, tq, 2, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, tk, 2, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, tk, 2, d))
    ours = _interpret_flash(q, k, v)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_supported_predicate():
    q = jnp.zeros((1, 1024, 8, 64))
    assert not fa.supported(q, q, q, mask=jnp.ones(1), is_causal=False)
    assert not fa.supported(q, q, q, None, is_causal=True)
    # off-TPU backend → unsupported even with good shapes
    supported_here = fa.supported(q, q, q, None, False)
    assert supported_here == (jax.default_backend() == "tpu")


def test_profitable_threshold():
    small = jnp.zeros((1, 256, 8, 64))
    big = jnp.zeros((1, 1024, 8, 64))
    assert not fa.profitable(small, small, small)
    assert fa.profitable(big, big, big)


def test_unaligned_head_dim_padding_math():
    """d=40 path (SD level-1): padded flash == XLA attention exactly
    (interpret mode)."""
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (1, 256, 2, 40), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 256, 2, 40))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 256, 2, 40))
    ours = _interpret_flash(q, k, v)  # wrapper pads 40 -> 64 internally
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_supported_now_includes_sd_head_dims():
    q40 = jnp.zeros((1, 1024, 8, 40))
    q160 = jnp.zeros((1, 64, 8, 160))
    on_tpu = jax.default_backend() == "tpu"
    assert fa.supported(q40, q40, q40, None, False) == on_tpu
    assert not fa.supported(q160, q160, q160, None, False)  # d>128 & T%128


def _geglu_case(key, n=1, t=256, c=64, h2=256):
    x = jax.random.normal(key, (n, t, c), jnp.float32)
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (c, h2)) * 0.05
    b1 = jax.random.normal(jax.random.fold_in(key, 2), (h2,)) * 0.05
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (h2 // 2, c)) * 0.05
    b2 = jax.random.normal(jax.random.fold_in(key, 4), (c,)) * 0.05
    return x, w1, b1, w2, b2


def test_fused_geglu_matches_reference_interpret():
    """Fused GEGLU kernel == plain XLA math (interpret mode) — including a
    case where the hidden dim is TILED across grid steps (block_h < H), the
    accumulation path that lets SD level-1/2 weight slices fit VMEM."""
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg

    args = _geglu_case(jax.random.PRNGKey(0))
    ref = fg.reference_geglu(*args)
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        one = fg.fused_geglu.__wrapped__(*args, block_t=128, block_h=128)
        tiled = fg.fused_geglu.__wrapped__(*args, block_t=128, block_h=64)
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_geglu_erf_polynomial_is_exact_enough():
    """The in-kernel erf (Mosaic lowers exp but not erf/erfc) must stay far
    below bf16 output resolution: |err| ≤ 1.5e-7 per A&S 7.1.26."""
    from polyp_tpu.ops.fused_geglu import _erf, _exact_gelu

    x = jnp.linspace(-6.0, 6.0, 48001, dtype=jnp.float32)
    # A&S bounds the method error at 1.5e-7; f32 arithmetic rounding in the
    # Horner chain brings the observed max to ~2.7e-6 — still ~100× below
    # the bf16 output ulp around |gelu|≈1.
    assert float(jnp.max(jnp.abs(_erf(x) - jax.lax.erf(x)))) < 5e-6
    assert float(jnp.max(jnp.abs(
        _exact_gelu(x) - jax.nn.gelu(x, approximate=False)))) < 2e-6


def test_fused_geglu_is_differentiable():
    """geglu (the dispatch entry) carries a custom_vjp that recomputes the
    backward through the XLA reference — grads through the fused FF match
    the unfused path (training with the dispatch ON must be exact)."""
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg

    args = _geglu_case(jax.random.PRNGKey(3))
    g = jax.random.normal(jax.random.PRNGKey(4), args[0].shape)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * g)

    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        ours = jax.grad(loss(fg.geglu), argnums=(0, 1, 2, 3, 4))(*args)
    ref = jax.grad(loss(fg.reference_geglu), argnums=(0, 1, 2, 3, 4))(*args)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_fused_geglu_w8a8_matches_per_layer_path_interpret():
    """The int8 fused FF == the per-layer w8a8_dense composition it
    replaces (interpret mode), including a hidden-tiled case exercising
    the int32 accumulation across grid steps."""
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg

    x, w1, b1, w2, b2 = _geglu_case(jax.random.PRNGKey(7))
    # calibrated-style scales: amax/127 with a little headroom
    s1 = float(jnp.max(jnp.abs(x))) * 1.05 / 127.0
    href = x @ w1 + b1
    a, gate = jnp.split(href, 2, axis=-1)
    s2 = float(jnp.max(jnp.abs(a * jax.nn.gelu(gate, approximate=False)))
               ) * 1.05 / 127.0

    ref = fg.reference_geglu_w8a8(x, w1, b1, w2, b2, s1, s2)
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        one = fg.fused_geglu_w8a8.__wrapped__(x, w1, b1, w2, b2, s1, s2,
                                              block_t=128, block_h=128)
        tiled = fg.fused_geglu_w8a8.__wrapped__(x, w1, b1, w2, b2, s1, s2,
                                                block_t=128, block_h=64)
    # both are int8 programs; they differ from each other only by f32-vs-
    # bf16 dequant rounding, and from full precision by quantization noise
    full = fg.reference_geglu(x, w1, b1, w2, b2)

    def rel(p, q):
        return float(np.linalg.norm(np.asarray(p - q))
                     / np.linalg.norm(np.asarray(q)))

    assert rel(one, ref) < 0.01, rel(one, ref)
    assert rel(tiled, ref) < 0.01, rel(tiled, ref)
    assert rel(one, full) < 3 * max(rel(ref, full), 1e-3), \
        (rel(one, full), rel(ref, full))


def test_fused_geglu_w8a8_pt_matches_oracle_interpret():
    """The per-token int8 fused FF == its plain-XLA oracle (row-wise
    activation scales, tile-mirrored h quantize), in both the one-tile and
    hidden-tiled configs — and its quantization noise vs full precision is
    no worse than the per-tensor static kernel's (the row max is ≤ the
    tensor max, so the quantization grid is finer)."""
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg

    x, w1, b1, w2, b2 = _geglu_case(jax.random.PRNGKey(11))
    full = fg.reference_geglu(x, w1, b1, w2, b2)

    def rel(p, q):
        return float(np.linalg.norm(np.asarray(p - q))
                     / np.linalg.norm(np.asarray(q)))

    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        one = fg.fused_geglu_w8a8_pt.__wrapped__(x, w1, b1, w2, b2,
                                                 block_t=128, block_h=128)
        tiled = fg.fused_geglu_w8a8_pt.__wrapped__(x, w1, b1, w2, b2,
                                                   block_t=128, block_h=64)
    # oracle mirrors _BLOCKS tiling for c=64 → block_h = min(128, hidden)
    ref = fg.reference_geglu_w8a8_pt(x, w1, b1, w2, b2)
    assert rel(one, ref) < 0.01, rel(one, ref)
    assert np.isfinite(np.asarray(tiled)).all()

    # per-tensor static baseline with amax-derived (clipping-free) scales
    s1 = float(jnp.max(jnp.abs(x))) * 1.05 / 127.0
    h = x @ w1 + b1
    a, gate = jnp.split(h, 2, axis=-1)
    s2 = float(jnp.max(jnp.abs(a * jax.nn.gelu(gate, approximate=False)))
               ) * 1.05 / 127.0
    static = fg.reference_geglu_w8a8(x, w1, b1, w2, b2, s1, s2)
    assert rel(one, full) <= rel(static, full) * 1.05, \
        (rel(one, full), rel(static, full))


def test_fused_geglu_w8a8_pt_refuses_gradients():
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg

    x, w1, b1, w2, b2 = _geglu_case(jax.random.PRNGKey(12))
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        with pytest.raises(NotImplementedError, match="inference-only"):
            jax.grad(lambda x: jnp.sum(
                fg.geglu_w8a8_pt(x, w1, b1, w2, b2)))(x)


def test_feedforward_dispatches_per_token_kernel(monkeypatch):
    """POLYP_GEGLU_PT=1 routes BOTH quant modes' FF through geglu_w8a8_pt
    (the dynamic mode has no other fused option — its activation scale
    depends on the intermediate); with the flag off (default) the dynamic
    mode keeps the per-layer dense path."""
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg
    from polyp_tpu.models.unet_blocks import FeedForward
    from polyp_tpu.ops import dispatch, quant

    ff = FeedForward(dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 64), jnp.float32)
    params = ff.init(jax.random.PRNGKey(1), x)
    plain = ff.apply(params, x)

    calls = []
    real = fg.geglu_w8a8_pt

    def spy(*a):
        calls.append(1)
        return real(*a)

    monkeypatch.setattr(fg, "supported", lambda *a: True)
    monkeypatch.setattr(fg, "geglu_w8a8_pt", spy)
    monkeypatch.setattr(quant, "MIN_QUANT_CHANNELS", 8)
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)), \
            dispatch.inference():
        monkeypatch.setenv("POLYP_GEGLU_PT", "1")
        with quant.override("w8a8"):
            out = ff.apply(params, x)
        assert calls, "per-token kernel not dispatched for dynamic w8a8"
        rel = (np.linalg.norm(np.asarray(out - plain))
               / np.linalg.norm(np.asarray(plain)))
        assert rel < 0.05, rel  # int8 noise, not a wrong program

        calls.clear()
        monkeypatch.delenv("POLYP_GEGLU_PT")
        with quant.override("w8a8"):
            ff.apply(params, x)
        assert not calls, "flag off must keep the per-layer dynamic path"

        # static mode with the flag: per-token takes precedence over the
        # calibrated-scalar kernel
        calls.clear()
        monkeypatch.setenv("POLYP_GEGLU_PT", "1")
        scales = {"/ff_net_0_proj": 0.05, "/ff_net_2": 0.05}
        with quant.override("w8a8_static", scales=scales):
            ff.apply(params, x)
        assert calls, "per-token kernel not dispatched for static mode"


def test_fused_geglu_w8a8_refuses_gradients():
    """geglu_w8a8 sits on the inference-only int8 path: differentiating
    through it must raise, not silently return zero-ish grads."""
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg

    x, w1, b1, w2, b2 = _geglu_case(jax.random.PRNGKey(8))
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        with pytest.raises(NotImplementedError, match="inference-only"):
            jax.grad(lambda x: jnp.sum(
                fg.geglu_w8a8(x, w1, b1, w2, b2, 0.01, 0.01)))(x)


def test_feedforward_dispatches_fused_geglu(monkeypatch):
    """FeedForward routes through ops/fused_geglu.geglu when supported,
    the flag is on, AND the trace is inside ops/dispatch.inference() (the
    samplers set it); outside that scope — i.e. every training trace —
    POLYP_FUSED_GEGLU=0, and any active quant mode all bypass.
    (CPU: `supported` is forced True and the kernel runs interpreted.)"""
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg
    from polyp_tpu.models.unet_blocks import FeedForward
    from polyp_tpu.ops import dispatch, quant

    ff = FeedForward(dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 64), jnp.float32)
    params = ff.init(jax.random.PRNGKey(1), x)
    plain = ff.apply(params, x)

    calls = []
    real_geglu = fg.geglu

    def spy(*a):
        calls.append(1)
        return real_geglu(*a)

    monkeypatch.setattr(fg, "supported", lambda *a: True)
    monkeypatch.setattr(fg, "geglu", spy)
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)), \
            dispatch.inference():
        monkeypatch.setenv("POLYP_FUSED_GEGLU", "1")
        fused = ff.apply(params, x)
        assert calls, "fused GEGLU was not dispatched"
        np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                                   rtol=1e-4, atol=1e-4)

        calls.clear()
        monkeypatch.setenv("POLYP_FUSED_GEGLU", "0")
        ff.apply(params, x)
        assert not calls, "kill switch ignored"

        calls.clear()
        monkeypatch.setenv("POLYP_FUSED_GEGLU", "1")
        with quant.override("w8a8"):
            ff.apply(params, x)
        assert not calls, "dynamic quant must use the per-layer dense path"

        # static quant routes to the int8 kernel when BOTH layers have
        # calibrated scales and pass the filters…
        qcalls = []
        real_q = fg.geglu_w8a8

        def qspy(*a):
            qcalls.append(1)
            return real_q(*a)

        monkeypatch.setattr(fg, "geglu_w8a8", qspy)
        monkeypatch.setattr(quant, "MIN_QUANT_CHANNELS", 8)
        # amax-derived scales (what calibration would produce): clipping-
        # free, so the int8 output stays near the full-precision one
        w0 = params["params"]["ff_net_0_proj"]["kernel"]
        b0 = params["params"]["ff_net_0_proj"]["bias"]
        h = x @ w0 + b0
        a_half, gate = jnp.split(h, 2, axis=-1)
        mid = a_half * jax.nn.gelu(gate, approximate=False)
        scales = {
            "/ff_net_0_proj": float(jnp.max(jnp.abs(x))) * 1.05 / 127.0,
            "/ff_net_2": float(jnp.max(jnp.abs(mid))) * 1.05 / 127.0,
        }
        with quant.override("w8a8_static", scales=scales):
            q_out = ff.apply(params, x)
        assert qcalls, "static quant did not dispatch the int8 kernel"
        q_rel = (np.linalg.norm(np.asarray(q_out - plain))
                 / np.linalg.norm(np.asarray(plain)))
        assert q_rel < 0.05, q_rel  # int8 noise, not a wrong program

        # …and falls back per-layer when a filter excludes one of them
        qcalls.clear()
        with quant.override("w8a8_static", scales=scales,
                            skip=("ff_net_2",)):
            ff.apply(params, x)
        assert not qcalls, "mixed skip/only config must not fuse"

    # OUTSIDE dispatch.inference() — a training trace — the fused kernel
    # must not dispatch even with the flag on: its backward is strictly
    # worse than XLA AD of the plain path (BASELINE.md round-3 A/B)
    calls.clear()
    monkeypatch.setenv("POLYP_FUSED_GEGLU", "1")
    out = ff.apply(params, x)
    assert not calls, "fused GEGLU dispatched outside inference scope"
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)


def test_flash_attention_is_differentiable():
    """LoRA/fine-tune train steps at 256px (1024-token latents) hit the
    flash forward on TPU; grads must flow. The custom_vjp backward
    recomputes through XLA's exact attention, so grads match XLA's to fp
    rounding (interpret mode exercises the same custom_vjp wiring)."""
    key = jax.random.PRNGKey(7)
    shape = (1, 256, 2, 40)
    q = jax.random.normal(key, shape, jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), shape)
    v = jax.random.normal(jax.random.fold_in(key, 2), shape)
    g = jax.random.normal(jax.random.fold_in(key, 3), shape)

    def loss_flash(q, k, v):
        return jnp.sum(_interpret_flash(q, k, v) * g)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) * g)

    grads = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for ours, want in zip(grads, ref):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)


def test_non_divisible_block_sizes_shrink_to_divisor():
    """T not a multiple of the block size (e.g. 384px latents -> 2304 tokens
    vs the 1024 defaults): blocks must shrink to a divisor instead of the
    grid silently dropping trailing q rows / k blocks."""
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (1, 384, 1, 32), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 384, 1, 32))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 384, 1, 32))
    ours = fa.flash_attention(q, k, v, block_q=256, block_k=256,
                              interpret=True)  # gcd(256, 384) = 128
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_causal_flag_refused():
    """flash_attention has no causal mask; silently computing full attention
    (while the custom_vjp backward IS causal) must be impossible."""
    q = jnp.zeros((1, 128, 1, 32))
    with pytest.raises(NotImplementedError, match="causal"):
        fa.flash_attention(q, q, q, is_causal=True, interpret=True)


def test_sampler_trace_enables_fused_geglu(monkeypatch):
    """The inference-scope contract END TO END: a sampler trace reaches
    FeedForward with dispatch.in_inference() set, so the fused GEGLU
    dispatches there — while a direct (training-style) forward of the
    same model does not. Tiny conditional UNet, interpret-mode kernel."""
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg
    from polyp_tpu.diffusion import DiffusionSchedule, sample
    from polyp_tpu.models import tiny_condition_unet

    unet = tiny_condition_unet(dtype=jnp.float32)
    x = jnp.zeros((2, 8, 8, 4), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 5, 32), jnp.float32)
    params = jax.jit(unet.init)({"params": jax.random.PRNGKey(0)},
                                x[:1], t[:1], ctx[:1])["params"]
    sched = DiffusionSchedule.create(50, "scaled_linear", 0.00085, 0.012)

    calls = []
    real_geglu = fg.geglu

    def spy(*a):
        calls.append(1)
        return real_geglu(*a)

    monkeypatch.setattr(fg, "supported", lambda *a: True)
    monkeypatch.setattr(fg, "geglu", spy)
    monkeypatch.setenv("POLYP_FUSED_GEGLU", "1")

    def model_fn(z, tt):
        return unet.apply({"params": params}, z, tt, ctx)

    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        out = sample("ddim", model_fn, sched, (2, 8, 8, 4),
                     jax.random.PRNGKey(1), 2)
        assert calls, "sampler trace did not enable the fused GEGLU"
        assert bool(jnp.isfinite(out).all())

        calls.clear()
        unet.apply({"params": params}, x, t, ctx)  # training-style trace
        assert not calls, "direct forward must not dispatch fused GEGLU"


def test_multi_device_trace_disables_pallas_dispatch(monkeypatch):
    """ops/dispatch.multi_device_trace(): mesh-partitioned traces must
    compile to XLA primitives only — flash attention and the fused GEGLU
    both bypass (GSPMD has no partitioning rule for the kernels)."""
    from unittest import mock

    import polyp_tpu.ops.fused_geglu as fg
    from polyp_tpu.models.unet_blocks import FeedForward
    from polyp_tpu.ops import attention as att
    from polyp_tpu.ops import dispatch

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 2, 64))
    fcalls = []
    monkeypatch.setattr(fa, "supported", lambda *a, **k: True)
    monkeypatch.setattr(fa, "profitable", lambda *a, **k: True)
    monkeypatch.setattr(
        fa, "flash_attention",
        lambda *a, **k: (fcalls.append(1),
                         fa.flash_attention.__wrapped__(*a, interpret=True,
                                                        **k))[1]
        if hasattr(fa.flash_attention, "__wrapped__")
        else (fcalls.append(1), jax.nn.dot_product_attention(*a[:3]))[1])

    att.dot_product_attention(q, q, q)
    assert fcalls, "flash did not dispatch in the baseline case"
    fcalls.clear()
    with dispatch.multi_device_trace():
        out = att.dot_product_attention(q, q, q)
    assert not fcalls, "flash dispatched inside a multi-device trace"
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jax.nn.dot_product_attention(q, q, q)),
        rtol=1e-5, atol=1e-5)

    # fused GEGLU: inference scope alone dispatches; + multi-device doesn't
    ff = FeedForward(dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 64), jnp.float32)
    params = ff.init(jax.random.PRNGKey(2), x)
    gcalls = []
    real_geglu = fg.geglu
    monkeypatch.setattr(fg, "supported", lambda *a: True)
    monkeypatch.setattr(fg, "geglu",
                        lambda *a: (gcalls.append(1), real_geglu(*a))[1])
    monkeypatch.setenv("POLYP_FUSED_GEGLU", "1")
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        with dispatch.inference():
            ff.apply(params, x)
        assert gcalls
        gcalls.clear()
        with dispatch.inference(), dispatch.multi_device_trace():
            ff.apply(params, x)
        assert not gcalls, "fused GEGLU dispatched inside multi-device trace"
