"""End-to-end CLI smoke tests on a fabricated mini corpus (SURVEY §4 plan
item e — the `--generate_subsamples`-grade fast path, as pytest)."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # compile-heavy


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    for split, csv_name, classes in [
            ("m_train2/m_train", "train.csv", ["AD"] * 8 + ["HP"] * 3 + ["ASS"] * 3),
            ("m_valid/m_valid", "valid.csv", ["AD"] * 3 + ["HP"] * 2 + ["ASS"] * 2),
            ("m_test/m_test", "gt_test.csv", ["AD"] * 3 + ["HP"] * 2 + ["ASS"] * 2)]:
        img_dir = root / split / "images"
        img_dir.mkdir(parents=True)
        rows = []
        for i, cls in enumerate(classes):
            base = {"AD": 40, "HP": 130, "ASS": 210}[cls]
            arr = np.clip(base + rng.integers(0, 40, (40, 40, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(img_dir / f"x{i}.tif")
            rows.append(f"x{i},{cls}")
        (root / split / csv_name).write_text(
            "image_id,cls\n" + "\n".join(rows) + "\n")
    return root


def test_train_classifier_cli(corpus, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from polyp_tpu.cli.train_classifier import main

    metrics = main([
        "--data-root", str(corpus), "--cache-dir", str(tmp_path / "cache"),
        "--tracker-root", str(tmp_path / "runs"),
        "--image_size", "32", "--batch_size", "4", "--num_epochs", "1",
        "--hidden_features", "8", "--weighted_sampling",
        "--output-dir", str(tmp_path / "models"),
        "--register", str(tmp_path / "reg.csv"),
    ])
    assert 0.0 <= metrics["f1_score"] <= 1.0
    assert (tmp_path / "reg.csv").exists()
    # loss plot + confusion matrix artifacts written
    assert list((tmp_path / "results").glob("loss_*.png"))


def test_lora_per_class_cli_tiny_train_and_resume(corpus, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from polyp_tpu.cli.lora_per_class import main

    args = ["--data-root", str(corpus), "--cache-dir", str(tmp_path / "cache"),
            "--tracker-root", str(tmp_path / "runs"),
            "--folder", str(tmp_path / "lorarun"), "--tiny",
            "--classes_to_train", "AD", "--num_imgs_to_generate", "2",
            "--dreambooth", "--num_epochs", "1", "--image_size", "32"]
    main(args)
    samples = tmp_path / "lorarun/samples/AD"
    assert sorted(p.name for p in samples.iterdir()) == ["1.png", "2.png"]
    assert (tmp_path / "lorarun/lora_AD").exists()

    # resume branch: raise quota → only the top-up runs (no retraining)
    args[args.index("2")] = "3"
    main(args)
    assert sorted(p.name for p in samples.iterdir()) == ["1.png", "2.png",
                                                         "3.png"]


def test_lora_all_classes_cli(corpus, tmp_path, monkeypatch):
    """C13 e2e: one run loops every class, computes its own quotas, trains
    with gradient accumulation, and --generate_subsamples caps generation at
    5/class (train_with_lora_all_classes.py:77-95,121-176,278-283)."""
    monkeypatch.chdir(tmp_path)
    from polyp_tpu.cli.lora_all_classes import main

    main(["--data-root", str(corpus), "--cache-dir", str(tmp_path / "cache"),
          "--tracker-root", str(tmp_path / "runs"),
          "--folder", str(tmp_path / "allrun"), "--tiny", "--one_vs_rest",
          "--generate_subsamples", "--accumulation_steps", "2",
          "--unfreeze_layers",  # reference :229 — trains conv_out too
          "--num_epochs", "1", "--image_size", "32"])
    for cls in ("AD", "REST"):
        samples = tmp_path / "allrun/samples" / cls
        assert len(list(samples.glob("*.png"))) == 5, cls
        assert (tmp_path / f"allrun/lora_{cls}").exists()
    assert (tmp_path / "allrun/loss_history_AD.png").exists()
    # post-generation fidelity metric logged into the tracker run
    logged = "".join(p.read_text()
                     for p in (tmp_path / "runs").rglob("*.jsonl"))
    assert "frechet_AD" in logged and "frechet_REST" in logged


def test_finetune_pretrained_cli(corpus, tmp_path, monkeypatch):
    """C11 e2e: whole-corpus latent LoRA fine-tune, fixed polyp prompt,
    final-epoch sample grid + adapter save (train_from_pretrained.py)."""
    monkeypatch.chdir(tmp_path)
    from polyp_tpu.cli.finetune_pretrained import main

    main(["--data-root", str(corpus), "--cache-dir", str(tmp_path / "cache"),
          "--tracker-root", str(tmp_path / "runs"), "--tiny",
          "--num_epochs", "1", "--image_size", "32",
          "--eval_batch_size", "2", "--num_inference_steps", "2",
          "--output-dir", str(tmp_path / "ft")])
    assert (tmp_path / "ft/lora_weights").exists()
    assert len(list((tmp_path / "ft/samples/0000").glob("*.png"))) == 2


def test_train_scratch_cli(corpus, tmp_path, monkeypatch):
    """C10 e2e: per-class pixel DDPM training with quota-driven final-epoch
    generation and per-class model checkpoints (train_from_scratch.py)."""
    monkeypatch.chdir(tmp_path)
    from polyp_tpu.cli.train_scratch import main
    from polyp_tpu.eval.quota import get_num_images_to_generate

    main(["--data-root", str(corpus), "--cache-dir", str(tmp_path / "cache"),
          "--tracker-root", str(tmp_path / "runs"), "--tiny",
          "--num_epochs", "1", "--image_size", "32",
          "--train_batch_size", "4",
          "--num_train_timesteps", "8", "--sample_steps", "2",
          "--ad_minimum", "9", "--output-dir", str(tmp_path / "scratch")])
    quotas = get_num_images_to_generate({"AD": 8, "HP": 3, "ASS": 3},
                                        (0.4, 0.3, 0.3), ad_minimum=9)
    for cls in ("AD", "HP", "ASS"):
        n = len(list((tmp_path / "scratch/samples" / cls).glob("*.png")))
        assert n == quotas[cls], (cls, n, quotas)
        assert (tmp_path / f"scratch/models/model_{cls}").exists()


@pytest.mark.parametrize("student_head", ["v_prediction", "epsilon"])
def test_distill_cli(corpus, tmp_path, monkeypatch, student_head):
    """polyp-distill e2e: progressive distillation of (fabricated)
    per-class scratch checkpoints, distilled checkpoint + meta + few-step
    sample generation (train/distill.py; no reference analogue). Both
    student heads: v_prediction (reparam warmup) and epsilon (exact warm
    start, no warmup — cli/distill.py docstring)."""
    monkeypatch.chdir(tmp_path)
    import jax
    import jax.numpy as jnp
    from polyp_tpu.cli.distill import main
    from polyp_tpu.models.unet2d import tiny_scratch_unet
    from polyp_tpu.utils.checkpoint import save_pytree

    # fabricate teacher checkpoints in the train_scratch output layout
    model = tiny_scratch_unet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1,), jnp.int32))["params"]
    for cls in ("AD", "HP", "ASS"):
        save_pytree(tmp_path / "scratch/models" / f"model_{cls}",
                    {"params": params})

    main(["--data-root", str(corpus), "--cache-dir", str(tmp_path / "cache"),
          "--tracker-root", str(tmp_path / "runs"), "--tiny",
          "--model-dir", str(tmp_path / "scratch"),
          "--image_size", "32", "--train_batch_size", "4",
          "--num_train_timesteps", "8", "--start_steps", "4",
          "--end_steps", "2", "--steps_per_phase", "3",
          "--reparam_steps", "2", "--generate", "2",
          "--student_prediction_type", student_head,
          "--output-dir", str(tmp_path / "dist")])
    for cls in ("AD", "HP", "ASS"):
        assert (tmp_path / "dist/models" / f"distilled_{cls}").exists()
        meta = json.loads((tmp_path / "dist/models"
                           / f"distilled_{cls}_meta.json").read_text())
        assert meta["num_steps"] == 2
        assert meta["prediction_type"] == student_head
        assert meta["sampler_kwargs"] == {"spacing": "trailing",
                                          "steps_offset": 0}
        n = len(list((tmp_path / "dist/samples" / cls).glob("*.png")))
        assert n == 2, (cls, n)


def test_eval_augmentation_cli(corpus, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(1)
    for cls in ("AD", "HP"):
        d = tmp_path / "genrun/samples" / cls
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i + 1}.png")

    from polyp_tpu.cli.eval_augmentation import main

    metrics = main([
        "--data-root", str(corpus), "--cache-dir", str(tmp_path / "cache"),
        "--tracker-root", str(tmp_path / "runs"),
        "--path_model", str(tmp_path / "genrun"),
        "--image_size", "32", "--batch_size", "4", "--num_epochs", "1",
    ])
    assert metrics["train_size"] == 14 + 4  # real + synthetic
    assert (tmp_path / "genrun/confusion_matrix_augmented.png").exists()
    # per-class sample-fidelity signal (eval/fid.py) rides the harness run
    assert set(metrics["frechet"]["per_class"]) == {"AD", "HP"}
    assert all(np.isfinite(v) for v in metrics["frechet"]["per_class"].values())


def test_dreambooth_resume_rebinds_token_id(corpus, tmp_path, monkeypatch):
    """A fresh process assigns the special token a different id than the
    multi-class training run did; resume must scatter the trained row at the
    CURRENT tokenizer id, not the saved one."""
    import jax
    import jax.numpy as jnp

    from polyp_tpu.cli.common import load_sd_stack
    from polyp_tpu.cli.sd_common import SDFlags, resume_class
    from polyp_tpu.configs import DiffusionConfig
    from polyp_tpu.lora import LoRAConfig, init_lora, save_lora

    monkeypatch.chdir(tmp_path)
    stack = load_sd_stack(None, tiny=True)
    cfg = DiffusionConfig(image_size=32, eval_batch_size=4,
                          num_inference_steps=2)
    lcfg = LoRAConfig(cfg.lora_rank, cfg.lora_alpha, cfg.lora_dropout,
                      cfg.modules_lora)
    folder = tmp_path / "run"
    (folder).mkdir()
    base_vocab = stack.text.config.vocab_size
    trained_row = jnp.full((1, stack.text.config.width), 0.123)
    bundle = {
        "unet_lora": init_lora(stack.unet_params, lcfg, jax.random.PRNGKey(0)),
        "special_rows": trained_row,
        # simulate: ASS trained 3rd in a multi-class run → saved id base+2
        "special_ids": jnp.asarray([base_vocab + 2], jnp.int32),
    }
    save_lora(folder / "lora_ASS", bundle)

    handled = resume_class(stack, cfg, folder, "ASS", quota=1,
                           flags=SDFlags(dreambooth=True))
    assert handled
    # fresh tokenizer assigned base+0; the trained row must live there
    current = stack.tokenizer.convert_tokens_to_ids("mjt")
    assert current == base_vocab
    assert (folder / "samples/ASS/1.png").exists()


@pytest.mark.parametrize("student_head", ["epsilon"])
def test_distill_sd_cli(corpus, tmp_path, monkeypatch, student_head):
    """polyp-distill-sd e2e: distill per-class SD LoRA models (fabricated
    lora bundles in the lora-per-class output layout) into few-step
    guidance-folded students; distilled checkpoint + meta + cond-only
    sampling through the real StableDiffusionSampler (guidance_scale=None).
    No reference analogue — the scratch twin is test_distill_cli."""
    monkeypatch.chdir(tmp_path)
    import jax
    from polyp_tpu.cli.common import load_sd_stack
    from polyp_tpu.cli.distill_sd import main
    from polyp_tpu.configs import DiffusionConfig
    from polyp_tpu.lora import LoRAConfig, init_lora, save_lora

    # fabricate trained bundles in the lora-per-class output layout
    stack = load_sd_stack(None, tiny=True)
    cfg = DiffusionConfig()
    adapter = init_lora(stack.unet_params,
                        LoRAConfig(cfg.lora_rank, cfg.lora_alpha,
                                   cfg.lora_dropout, cfg.modules_lora),
                        jax.random.PRNGKey(1))
    for cls in ("AD", "HP", "ASS"):
        save_lora(tmp_path / "lorarun" / f"lora_{cls}",
                  {"unet_lora": adapter})

    main(["--data-root", str(corpus), "--cache-dir", str(tmp_path / "cache"),
          "--tracker-root", str(tmp_path / "runs"), "--tiny",
          "--model-dir", str(tmp_path / "lorarun"),
          "--image_size", "32", "--train_batch_size", "4",
          "--num_train_timesteps", "8", "--start_steps", "4",
          "--end_steps", "2", "--steps_per_phase", "3",
          "--reparam_steps", "2", "--learning_rate", "1e-4",
          "--student_prediction_type", student_head,
          "--generate", "2", "--output-dir", str(tmp_path / "distsd")])
    for cls in ("AD", "HP", "ASS"):
        out = tmp_path / "distsd/models" / f"distilled_{cls}"
        assert out.exists(), cls
        meta = json.loads(
            (tmp_path / "distsd/models" / f"distilled_{cls}_meta.json")
            .read_text())
        assert meta["num_steps"] == 2
        assert meta["prediction_type"] == student_head
        assert meta["guidance"] == "folded"
        samples = tmp_path / "distsd/samples" / cls
        assert sorted(p.name for p in samples.glob("*.png")) == ["1.png",
                                                                 "2.png"]

    # --- serving-path reload: load_student_sampler + generate_batch -------
    from polyp_tpu.cli.common import load_sd_stack as _lss
    from polyp_tpu.cli.distill_sd import load_student_sampler
    from polyp_tpu.configs import DiffusionConfig as _DC
    from polyp_tpu.serve import request_sample_key

    stack2 = _lss(None, tiny=True)
    sampler = load_student_sampler(stack2, tmp_path / "distsd", "AD",
                                   _DC(image_size=32))
    assert sampler.num_steps == 2 and sampler.guidance_scale is None
    meta = json.loads((tmp_path / "distsd/models/distilled_AD_meta.json")
                      .read_text())
    keys = [request_sample_key(5, j) for j in range(2)]
    imgs = sampler.generate_batch([meta["prompt"]] * 2, keys, pad_to=4)
    assert imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()


class TestKillResume:
    """The crash-recovery contract end-to-end (VERDICT r4 next-round #2):
    a REAL training CLI process is SIGKILLed right after an epoch snapshot
    (fault injection, utils/faults.py), re-invoked with the same flags, and
    must produce a final checkpoint byte-identical to an uninterrupted
    twin run."""

    def _run_cli(self, corpus, workdir, out_dir, crash_at=None,
                 ckpt_every=1):
        import os
        import subprocess
        import sys

        from polyp_tpu.utils.host import host_fingerprint

        env = dict(os.environ)
        # APPEND the repo root (never overwrite: the base env's PYTHONPATH
        # registers the TPU PJRT plugin)
        repo = str(Path(__file__).resolve().parents[1])
        env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        # share the suite's persistent compile cache so the three runs pay
        # one compile
        env["JAX_COMPILATION_CACHE_DIR"] = \
            f"/tmp/jax_cache_tests_{host_fingerprint()}"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
        if crash_at is not None:
            env["POLYP_TPU_CRASH_AT"] = crash_at
        else:
            env.pop("POLYP_TPU_CRASH_AT", None)
        args = [sys.executable, "-m", "polyp_tpu.cli.train_classifier",
                "--data-root", str(corpus),
                "--cache-dir", str(workdir / "cache"),
                "--tracker-root", str(workdir / "runs"),
                "--image_size", "32", "--batch_size", "4",
                "--num_epochs", "3", "--hidden_features", "8",
                "--variant", "tiny",
                "--output-dir", str(out_dir),
                "--register", str(workdir / "reg.csv")]
        if ckpt_every:
            args += ["--ckpt-every", str(ckpt_every)]
        return subprocess.run(args, cwd=workdir, env=env,
                              capture_output=True, text=True, timeout=900)

    def _best_ckpt(self, out_dir):
        from polyp_tpu.utils.checkpoint import load_pytree

        dirs = [p for p in Path(out_dir).iterdir()
                if p.is_dir() and p.name.startswith("classifier_")]
        assert len(dirs) == 1, dirs
        return load_pytree(dirs[0])

    def test_sigkill_then_resume_matches_uninterrupted(self, corpus,
                                                       tmp_path):
        work = tmp_path
        # 1) armed run: SIGKILLed right after epoch 0's snapshot
        killed = self._run_cli(corpus, work, work / "resumed",
                               crash_at="epoch:0")
        assert killed.returncode == -9, (killed.returncode, killed.stderr[-2000:])
        ck = work / "resumed" / "ckpt"
        assert (ck / "latest.json").exists(), "no snapshot before the kill"
        assert not list(Path(work / "resumed").glob("classifier_*")), \
            "final checkpoint must not exist after the kill"

        # 2) re-invoke with the same flags: resumes epoch 1, completes
        resumed = self._run_cli(corpus, work, work / "resumed")
        assert resumed.returncode == 0, resumed.stderr[-2000:]

        # 3) uninterrupted twin in a fresh output dir
        twin = self._run_cli(corpus, work, work / "twin", ckpt_every=0)
        assert twin.returncode == 0, twin.stderr[-2000:]

        a = self._best_ckpt(work / "resumed")
        b = self._best_ckpt(work / "twin")
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb) and len(la) > 0
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
