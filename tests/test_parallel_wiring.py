"""Parallelism wired into the real entry points (VERDICT r1 item 1):

* DP-N train steps must match single-device numerics (classifier + SD-LoRA),
* TP train step (Megatron-sharded frozen UNet, LoRA grads) must match,
* sharded quota sampling must match unsharded and actually span devices,
* Loader(mesh=...) must yield batch-dim-sharded arrays.

All on the 8 fake CPU devices from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyp_tpu.configs import ClassificationConfig, DiffusionConfig
from polyp_tpu.data.pipeline import Loader
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.lora import LoRAConfig, init_lora
from polyp_tpu.parallel import (
    data_sharding,
    make_mesh,
    mesh_from_spec,
    replicate_to,
    shard_batch,
    shard_params,
)

pytestmark = pytest.mark.slow  # jit-compiles SPMD programs; ~minutes on 1 core


def tree_allclose(a, b, rtol=2e-4, atol=2e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol)


def test_mesh_from_spec():
    assert mesh_from_spec(None) is None
    assert mesh_from_spec("") is None
    m = mesh_from_spec("data=8")
    assert dict(m.shape) == {"data": 8}
    m = mesh_from_spec("data=4,model=2")
    assert dict(m.shape) == {"data": 4, "model": 2}
    m = mesh_from_spec("data=-1")
    assert m.shape["data"] == len(jax.devices())
    with pytest.raises(ValueError):
        mesh_from_spec("bogus")


def test_loader_yields_sharded_batches():
    mesh = make_mesh({"data": 8})
    images = np.zeros((32, 8, 8, 3), np.uint8)
    labels = np.arange(32) % 3
    loader = Loader(images, labels, 16, seed=0, shuffle=False, mesh=mesh)
    imgs, labs, valid = next(iter(loader))
    assert len(imgs.sharding.device_set) == 8
    assert imgs.addressable_shards[0].data.shape[0] == 2  # 16/8
    assert len(labs.sharding.device_set) == 8
    with pytest.raises(ValueError):
        Loader(images, labels, 12, mesh=mesh)  # 12 % 8 != 0


class TestClassifierDP:
    def _setup(self):
        from polyp_tpu.train.classifier import (create_classifier_state,
                                                train_step)
        cfg = ClassificationConfig(image_size=32, batch_size=16,
                                   mixed_precision="f32")
        state, _ = create_classifier_state(cfg, 3, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (2, 16, 32, 32, 3), dtype=np.uint8)
        labels = rng.integers(0, 3, (2, 16)).astype(np.int32)
        return train_step, state, images, labels

    def test_dp8_matches_single_device(self):
        """Two DP-8 train steps == two single-device steps (same batches,
        same keys), per VERDICT r1 'done' criterion (a)."""
        train_step, state0, images, labels = self._setup()
        mesh = make_mesh({"data": 8})

        losses = {}
        params = {}
        for mode in ("single", "dp8"):
            state = state0 if mode == "single" else replicate_to(state0, mesh)
            ls = []
            for i in range(2):
                b = (images[i], labels[i])
                if mode == "dp8":
                    b = shard_batch(b, mesh)
                state, loss, _ = train_step(state, b[0], b[1],
                                            jax.random.PRNGKey(i), None, "f32")
                ls.append(float(loss))
            losses[mode] = ls
            params[mode] = jax.device_get(state.params)

        # step 1 is pre-update → tight; step 2 sees one Adam+BatchNorm update
        # whose reduction-order noise amplifies (measured ~2e-4 on CPU)
        np.testing.assert_allclose(losses["single"][0], losses["dp8"][0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(losses["single"], losses["dp8"],
                                   rtol=1e-3, atol=1e-5)
        # Adam's step-1 update is sign-like (m̂/√v̂ ≈ ±lr) so near-zero-grad
        # params can flip on reduction-order noise; bound by a few lr instead
        # of relative error (a wrong grad aggregation would blow way past it).
        tree_allclose(params["single"], params["dp8"], rtol=5e-3, atol=5e-3)


class TestSDLoRAParallel:
    def _setup(self, dtype=jnp.float32):
        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.sd_common import make_components
        from polyp_tpu.train.sd_finetune import (create_sd_train_state,
                                                 init_trainable,
                                                 sd_lora_train_step)
        stack = load_sd_stack(None, dtype=dtype, tiny=True)
        lcfg = LoRAConfig(rank=2, alpha=2, dropout=0.0)
        adapter = init_lora(stack.unet_params, lcfg, jax.random.PRNGKey(1))
        cfg = DiffusionConfig(image_size=16, train_batch_size=8,
                              num_train_timesteps=50).with_schedule(2)
        sched = DiffusionSchedule.create(50)
        frozen = make_components(stack)
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (2, 8, 16, 16, 3), dtype=np.uint8)
        ids = jnp.zeros((1, 16), jnp.int32)
        return (sd_lora_train_step, create_sd_train_state, init_trainable,
                stack, lcfg, adapter, cfg, sched, frozen, images, ids)

    def _run_steps(self, setup, mesh):
        (step_fn, mk_state, mk_trainable, stack, lcfg, adapter, cfg, sched,
         frozen, images, ids) = setup
        # fresh copy per run — sd_lora_train_step donates the state, which
        # would delete a shared adapter's buffers after the first run
        adapter = jax.tree_util.tree_map(jnp.array, adapter)
        state = mk_state(cfg, mk_trainable(adapter))
        if mesh is not None:
            frozen = frozen.replace(
                unet_params=shard_params(frozen.unet_params, mesh),
                vae_params=replicate_to(frozen.vae_params, mesh),
                text_params=shard_params(frozen.text_params, mesh))
            state = replicate_to(state, mesh)
        losses = []
        for i in range(2):
            imgs = jnp.asarray(images[i])
            if mesh is not None:
                imgs = shard_batch(imgs, mesh)
            state, loss = step_fn(state, frozen, sched, imgs, ids,
                                  jnp.zeros((1,), jnp.int32),
                                  jax.random.PRNGKey(10 + i), lcfg)
            losses.append(float(loss))
        return losses, jax.device_get(state.trainable["unet_lora"])

    def test_dp8_train_matches_single(self):
        setup = self._setup()
        base_losses, base_adapter = self._run_steps(setup, None)
        mesh = make_mesh({"data": 8})
        dp_losses, dp_adapter = self._run_steps(setup, mesh)
        np.testing.assert_allclose(base_losses, dp_losses, rtol=2e-5, atol=1e-6)
        # adapter entries after one Adam step are O(lr·1e-2)≈1e-6; CPU
        # reduction-order noise reaches ~1.5e-6 on individual near-zero
        # elements (a wrong grad aggregation is orders of magnitude off)
        tree_allclose(base_adapter, dp_adapter, rtol=5e-4, atol=5e-6)

    def test_tp_train_step_with_lora_grads_matches(self):
        """TP *train step* equivalence — the VERDICT r1 'done' criterion (b):
        Megatron-sharded frozen attention/FF kernels, gradient flow through
        the LoRA merge, optimizer update — all under a data=2,model=4 mesh."""
        setup = self._setup()
        base_losses, base_adapter = self._run_steps(setup, None)
        mesh = make_mesh({"data": 2, "model": 4})
        tp_losses, tp_adapter = self._run_steps(setup, mesh)
        np.testing.assert_allclose(base_losses, tp_losses, rtol=2e-5, atol=1e-6)
        tree_allclose(base_adapter, tp_adapter, rtol=5e-4, atol=1e-6)


class TestShardedSampling:
    def test_sd_sampler_sharded_matches_unsharded(self):
        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.sd_common import make_sampler
        stack = load_sd_stack(None, dtype=jnp.float32, tiny=True)
        cfg = DiffusionConfig(image_size=64, num_inference_steps=3,
                              eval_batch_size=8)
        plain = make_sampler(stack, stack.unet_params,
                             stack.text_params["params"], cfg)
        mesh = make_mesh({"data": 8})
        sharded = make_sampler(stack, stack.unet_params,
                               stack.text_params["params"], cfg, mesh)
        key = jax.random.PRNGKey(3)
        a = plain.for_prompt("polyp")(8, key)
        b = sharded.for_prompt("polyp")(8, key)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
        # ragged quota tail: padded to the mesh internally, sliced back
        c = sharded.for_prompt("polyp")(5, key)
        assert c.shape[0] == 5

    def test_generate_batch_sharded_matches_unsharded(self):
        """The serving micro-batch path (per-sample prompts + keys,
        pipeline.generate_batch) composes with a data mesh: padded to the
        mesh, spans all devices, matches the mesh-less output."""
        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.sd_common import make_sampler
        stack = load_sd_stack(None, dtype=jnp.float32, tiny=True)
        cfg = DiffusionConfig(image_size=32, num_inference_steps=2,
                              sampler="unipc")
        plain = make_sampler(stack, stack.unet_params,
                             stack.text_params["params"], cfg)
        sharded = make_sampler(stack, stack.unet_params,
                               stack.text_params["params"], cfg,
                               make_mesh({"data": 8}))
        keys = list(jax.random.split(jax.random.PRNGKey(5), 3))
        prompts = ["polyp", "polyp", "another"]
        a = plain.generate_batch(prompts, keys, pad_to=8)
        # 3 samples pad to 8 (pad_to and the mesh agree here)
        b = sharded.generate_batch(prompts, keys, pad_to=8)
        assert np.asarray(b).shape[0] == 3
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    def test_pixel_sampler_spans_devices(self):
        from polyp_tpu.models.unet2d import UNet2D
        from polyp_tpu.pipeline import PixelDiffusionSampler
        model = UNet2D(block_out_channels=(8, 16),
                       down_block_types=("DownBlock2D", "DownBlock2D"),
                       up_block_types=("UpBlock2D", "UpBlock2D"),
                       layers_per_block=1)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                            jnp.asarray([0]))["params"]
        sched = DiffusionSchedule.create(20)
        mesh = make_mesh({"data": 8})
        sampler = PixelDiffusionSampler(model, params, sched, 8,
                                        sampler="ddim", num_steps=4, mesh=mesh)
        out = sampler._generate(sampler.params, None, jax.random.PRNGKey(0),
                                batch_size=8)
        assert len(out.sharding.device_set) == 8  # actually fanned out
        plain = PixelDiffusionSampler(model, params, sched, 8,
                                      sampler="ddim", num_steps=4)
        np.testing.assert_allclose(
            np.asarray(plain(8, jax.random.PRNGKey(0))),
            np.asarray(sampler(8, jax.random.PRNGKey(0))),
            rtol=2e-4, atol=2e-4)


class TestFoldedGuidanceSharded:
    def test_cond_only_sampler_sharded_matches_unsharded(self):
        """A distilled student's sampler (guidance_scale=None — cond-only
        1x-batch forwards, trailing DDIM, cli/distill_sd.py) composes with
        a data mesh exactly like the CFG sampler does."""
        from types import SimpleNamespace

        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.distill_sd import make_student_sampler
        stack = load_sd_stack(None, dtype=jnp.float32, tiny=True)
        cfg = DiffusionConfig(image_size=32, num_train_timesteps=8)
        student = SimpleNamespace(params=stack.unet_params, num_steps=2,
                                  prediction_type="epsilon")
        plain = make_student_sampler(stack, student,
                                     stack.text_params["params"], cfg)
        sharded = make_student_sampler(stack, student,
                                       stack.text_params["params"], cfg,
                                       mesh=make_mesh({"data": 8}))
        assert plain.guidance_scale is None
        key = jax.random.PRNGKey(11)
        a = plain.for_prompt("polyp")(8, key)
        b = sharded.for_prompt("polyp")(8, key)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
        keys = list(jax.random.split(key, 3))
        c = plain.generate_batch(["polyp", "x", "y"], keys, pad_to=8)
        d = sharded.generate_batch(["polyp", "x", "y"], keys, pad_to=8)
        np.testing.assert_allclose(np.asarray(c), np.asarray(d),
                                   rtol=2e-4, atol=2e-4)


class TestQuantizedShardedSampling:
    def test_mesh_and_w8a8_compose(self, monkeypatch):
        """--mesh data=8 together with --quantize w8a8: the trace-time quant
        context must survive pjit partitioning — sharded quantized sampling
        runs, spans the mesh, and matches the unsharded quantized output."""
        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.sd_common import make_sampler
        from polyp_tpu.ops import quant

        monkeypatch.setattr(quant, "MIN_QUANT_CHANNELS", 8)
        stack = load_sd_stack(None, dtype=jnp.float32, tiny=True)
        cfg = DiffusionConfig(image_size=32, num_inference_steps=2,
                              sampler="ddim", quantize="w8a8")
        key = jax.random.PRNGKey(4)
        plain = make_sampler(stack, stack.unet_params,
                             stack.text_params["params"], cfg)
        mesh = make_mesh({"data": 8})
        sharded = make_sampler(stack, stack.unet_params,
                               stack.text_params["params"], cfg, mesh)
        a = np.asarray(plain.for_prompt("polyp")(8, key), np.float32)
        b = np.asarray(sharded.for_prompt("polyp")(8, key), np.float32)
        assert np.isfinite(b).all()
        # looser than the bf16 sharding test: the dynamic activation amax
        # reduces in a different order under pjit, and a 1-ulp scale change
        # flips int8 rounding on near-tie values — bounded, not bitwise.
        np.testing.assert_allclose(a, b, rtol=0.05, atol=0.02)
        assert np.abs(a - b).mean() < 2e-3

    def test_mesh_and_w8a8_static_compose(self, monkeypatch, tmp_path):
        """--mesh data=8 with --quantize w8a8_static: calibration + the
        per-timestep scale gathers + the producer-side GN→int8 handoff
        (POLYP_GN_Q8 default, pure-XLA under SPMD since Pallas dispatch is
        mesh-gated) must all survive pjit partitioning. Static scales are
        trace-constant (no cross-device amax reduction order), so sharded
        must match unsharded TIGHTER than the dynamic test above."""
        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.sd_common import make_sampler
        from polyp_tpu.ops import quant

        monkeypatch.setattr(quant, "MIN_QUANT_CHANNELS", 8)
        monkeypatch.setenv("POLYP_QUANT_CACHE", str(tmp_path))
        monkeypatch.setenv("POLYP_GN_Q8", "1")  # opt-in producer handoff
        stack = load_sd_stack(None, dtype=jnp.float32, tiny=True)
        cfg = DiffusionConfig(image_size=32, num_inference_steps=2,
                              sampler="ddim", quantize="w8a8_static")
        key = jax.random.PRNGKey(4)
        plain = make_sampler(stack, stack.unet_params,
                             stack.text_params["params"], cfg)
        mesh = make_mesh({"data": 8})
        sharded = make_sampler(stack, stack.unet_params,
                               stack.text_params["params"], cfg, mesh)
        a = np.asarray(plain.for_prompt("polyp")(8, key), np.float32)
        b = np.asarray(sharded.for_prompt("polyp")(8, key), np.float32)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def test_promoted_hybrid_split_sharded_matches(self, monkeypatch,
                                                   tmp_path):
        """The PROMOTED full-trajectory config's structure under the mesh
        (VERDICT r4 weak #2): w8a8_static with an fp head — the
        fp->int8 segment-list split, the calibration trace, and the
        per-timestep scale gathers all partitioned by pjit. 3 steps with
        head 1 keeps the promoted shape at test size."""
        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.sd_common import make_sampler
        from polyp_tpu.ops import quant

        monkeypatch.setattr(quant, "MIN_QUANT_CHANNELS", 8)
        monkeypatch.setenv("POLYP_QUANT_CACHE", str(tmp_path))
        stack = load_sd_stack(None, dtype=jnp.float32, tiny=True)
        cfg = DiffusionConfig(image_size=32, num_inference_steps=3,
                              sampler="ddim", quantize="w8a8_static",
                              quant_fp_head=1)
        key = jax.random.PRNGKey(4)
        plain = make_sampler(stack, stack.unet_params,
                             stack.text_params["params"], cfg)
        assert plain._split == (1, 0), "fp head must survive config plumbing"
        sharded = make_sampler(stack, stack.unet_params,
                               stack.text_params["params"], cfg,
                               make_mesh({"data": 8}))
        bf16 = make_sampler(stack, stack.unet_params,
                            stack.text_params["params"],
                            DiffusionConfig(image_size=32,
                                            num_inference_steps=3,
                                            sampler="ddim"))
        a = np.asarray(plain.for_prompt("polyp")(8, key), np.float32)
        b = np.asarray(sharded.for_prompt("polyp")(8, key), np.float32)
        c = np.asarray(bf16.for_prompt("polyp")(8, key), np.float32)
        assert np.isfinite(b).all()

        def rel(x, y):
            return np.linalg.norm(x - y) / np.linalg.norm(y)

        # Bounded, not bitwise: static scales are SHARED (one calibration
        # cache), but pjit's different fp reduction order flips int8
        # rounding on near-tie activations and the trajectory amplifies a
        # +-1-code flip chaotically. The contract: sharding's perturbation
        # stays well inside quantization's own error budget, and sharded
        # quantized sampling is as faithful to bf16 as unsharded is.
        # Measured on this config: rel(shard, plain)=0.038 vs
        # rel(plain, bf16)=0.137 (aggressive MIN_QUANT_CHANNELS=8 on the
        # tiny model — far coarser than the production gate's 0.03).
        assert rel(b, a) < 0.5 * rel(a, c), (rel(b, a), rel(a, c))
        assert rel(b, c) < 1.3 * rel(a, c), (rel(b, c), rel(a, c))
        assert np.abs(a - b).mean() < 0.02

    def test_promoted_distilled_folded_sharded_matches(self, monkeypatch,
                                                       tmp_path):
        """The PROMOTED distilled config under the mesh: pure w8a8_static
        on the folded cond-only few-step path (trailing DDIM, guidance
        None) — what `polyp-serve --distilled-dir --quantize promoted
        --mesh data=N` runs."""
        from types import SimpleNamespace

        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.distill_sd import make_student_sampler
        from polyp_tpu.ops import quant

        monkeypatch.setattr(quant, "MIN_QUANT_CHANNELS", 8)
        monkeypatch.setenv("POLYP_QUANT_CACHE", str(tmp_path))
        stack = load_sd_stack(None, dtype=jnp.float32, tiny=True)
        cfg = DiffusionConfig(image_size=32, num_train_timesteps=8,
                              quantize="w8a8_static")
        student = SimpleNamespace(params=stack.unet_params, num_steps=2,
                                  prediction_type="epsilon")
        key = jax.random.PRNGKey(7)
        plain = make_student_sampler(stack, student,
                                     stack.text_params["params"], cfg)
        sharded = make_student_sampler(stack, student,
                                       stack.text_params["params"], cfg,
                                       mesh=make_mesh({"data": 8}))
        assert plain.guidance_scale is None and plain.quantize == "w8a8_static"
        keys = list(jax.random.split(key, 3))
        a = np.asarray(plain.generate_batch(["polyp", "x", "y"], keys,
                                            pad_to=8), np.float32)
        b = np.asarray(sharded.generate_batch(["polyp", "x", "y"], keys,
                                              pad_to=8), np.float32)
        assert np.isfinite(b).all()
        # tight: the 2-step folded trajectory with shared static scales
        # measured no near-tie flips (unlike the 3-step hybrid above)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def test_quant_composes_with_tp_mesh(self, monkeypatch, tmp_path):
        """data=4,model=2 (DP x Megatron-TP) with w8a8_static: in-graph
        int8 weight quantization over TP-SHARDED kernels must partition,
        not gather — the dryrun's mesh shape, proven equivalent here."""
        from polyp_tpu.cli.common import load_sd_stack
        from polyp_tpu.cli.sd_common import make_sampler
        from polyp_tpu.ops import quant

        monkeypatch.setattr(quant, "MIN_QUANT_CHANNELS", 8)
        monkeypatch.setenv("POLYP_QUANT_CACHE", str(tmp_path))
        stack = load_sd_stack(None, dtype=jnp.float32, tiny=True)
        cfg = DiffusionConfig(image_size=32, num_inference_steps=2,
                              sampler="ddim", quantize="w8a8_static")
        key = jax.random.PRNGKey(4)
        plain = make_sampler(stack, stack.unet_params,
                             stack.text_params["params"], cfg)
        sharded = make_sampler(stack, stack.unet_params,
                               stack.text_params["params"], cfg,
                               make_mesh({"data": 4, "model": 2}))
        bf16 = make_sampler(stack, stack.unet_params,
                            stack.text_params["params"],
                            DiffusionConfig(image_size=32,
                                            num_inference_steps=2,
                                            sampler="ddim"))
        a = np.asarray(plain.for_prompt("polyp")(8, key), np.float32)
        b = np.asarray(sharded.for_prompt("polyp")(8, key), np.float32)
        c = np.asarray(bf16.for_prompt("polyp")(8, key), np.float32)
        assert np.isfinite(b).all()

        def rel(x, y):
            return np.linalg.norm(x - y) / np.linalg.norm(y)

        # TP changes EVERY matmul's reduction order (sharded partials +
        # collectives), so near-tie int8 rounding flips everywhere and the
        # pointwise trajectories decorrelate: measured rel(shard, plain)
        # = 0.78 ~ sqrt(2) x rel(plain, bf16) = 0.51 at this test's
        # aggressive tiny-model quantization — two independent draws
        # around the same bf16 reference, NOT a bias. The contract that
        # survives topology changes is EQUAL FIDELITY: TP-sharded
        # quantized sampling must be as faithful to bf16 as unsharded
        # quantized sampling is. (Pointwise reproducibility across mesh
        # topologies is not promised for int8, same as across batch
        # sizes; the bf16 path's own sharding equivalence is ~1e-6,
        # test_sd_sampler_sharded_matches_unsharded.)
        assert rel(b, c) < 1.3 * rel(a, c), (rel(b, c), rel(a, c))


class TestMultiHostBatchCoherence:
    """Multi-host semantics of Loader (simulated — this host is one process):
    when the mesh spans processes, hosts must NOT stride whole batches
    (each global SPMD step would otherwise mix different hosts' batches,
    dropping (pc-1)/pc of the data); striding remains for independent
    per-host training without a cross-process mesh."""

    def _loader(self, mesh, **kw):
        from polyp_tpu.data.pipeline import Loader

        images = np.arange(32 * 2 * 2 * 3, dtype=np.uint8).reshape(32, 2, 2, 3)
        labels = np.arange(32, dtype=np.int64) % 3
        return Loader(images, labels, 8, shuffle=False, mesh=mesh,
                      process_shard=True, **kw)

    def test_cross_process_mesh_disables_striding(self, monkeypatch):
        from polyp_tpu.data.pipeline import Loader

        mesh = make_mesh({"data": 8})
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        monkeypatch.setattr(Loader, "_mesh_spans_processes", lambda self: True)
        loader = self._loader(mesh)
        # all 4 batches belong to every host's stream — no 1/pc truncation
        assert len(loader) == 4
        batches = list(loader._host_batches())
        assert len(batches) == 4
        np.testing.assert_array_equal(batches[0][1], np.arange(8) % 3)

    def test_no_mesh_keeps_per_host_striding(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        loader = self._loader(None)
        assert len(loader) == 2  # 4 batches / 2 hosts
        batches = list(loader._host_batches())
        assert len(batches) == 2
        # host 1 takes the strided slice [1::2] -> batches 1 and 3
        np.testing.assert_array_equal(batches[0][1], (np.arange(8, 16)) % 3)

    def test_shardwise_assembly_matches_device_put(self):
        """Single-process equivalence: the make_array_from_callback path
        yields the same global arrays as shard_batch's device_put."""
        mesh = make_mesh({"data": 8})
        loader = self._loader(mesh)
        # force the shard-wise assembly path
        loader._spans_processes = True
        got = next(iter(loader))
        from polyp_tpu.parallel.mesh import shard_batch

        loader2 = self._loader(mesh)
        want = next(iter(loader2))
        for g, w in zip(got, want):
            assert len(g.sharding.device_set) == 8
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
