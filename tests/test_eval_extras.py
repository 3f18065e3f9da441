"""Register CSV, dataset analysis, augmentation harness, LoRA introspection
CLI."""

import numpy as np
import pytest
from PIL import Image

import jax

from polyp_tpu.eval.analysis import class_distribution, imbalance_ratio, split_stats
from polyp_tpu.eval.register import append_run, best_run, read_register


class TestRegister:
    def test_append_and_read(self, tmp_path):
        reg = tmp_path / "register.csv"
        params = {"transformations": ["resize"], "image_size": 224,
                  "hidden_features": 256, "batch_size": 16, "dropout": 0.5,
                  "learning_rate": 1e-3, "weight_decay": 1e-3,
                  "num_epochs": 100, "early_stopping": 10,
                  "other_techniques": ["weighted loss"]}
        append_run(reg, "classifier_a", params, 0.5478)
        append_run(reg, "classifier_b", params, 0.6069)
        rows = read_register(reg)
        assert len(rows) == 2
        assert rows[0]["f1_score"] == "0.5478"
        assert best_run(reg)["model_name"] == "classifier_b"


class TestAnalysis:
    @pytest.fixture
    def csvs(self, tmp_path):
        (tmp_path / "train.csv").write_text(
            "image_id,cls\n" + "\n".join(
                [f"a{i},AD" for i in range(6)] + [f"h{i},HP" for i in range(2)]
                + [f"s{i},ASS" for i in range(2)]) + "\n")
        (tmp_path / "test.csv").write_text("image_id,cls\nx0,AD\nx1,HP\n")
        return tmp_path

    def test_split_stats(self, csvs):
        df = split_stats({"train": csvs / "train.csv",
                          "test": csvs / "test.csv"})
        train = df[df.split == "train"].iloc[0]
        assert train.total == 10 and train.n_AD == 6

    def test_distribution_and_imbalance(self, csvs):
        dist = class_distribution(csvs / "train.csv")
        assert dist["AD"] == pytest.approx(0.6)
        assert imbalance_ratio(csvs / "train.csv") == pytest.approx(3.0)


@pytest.mark.slow
class TestHarness:
    def test_closed_loop_smoke(self, synth_polyp_dir, tmp_path):
        """generate(fake) → augment → retrain → F1, with run-linking."""
        from polyp_tpu.configs import ClassificationConfig
        from polyp_tpu.eval.harness import AugmentedDataDirs, run_augmentation_eval
        from polyp_tpu.track import JsonlTracker

        samples = tmp_path / "samples" / "HP"
        samples.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
                samples / f"{i + 1}.png")

        d = synth_polyp_dir
        dirs = AugmentedDataDirs(
            str(d["image_dir"]), str(d["csv"]), str(d["image_dir"]),
            str(d["csv"]), str(d["image_dir"]), str(d["csv"]),
            str(tmp_path / "samples"))
        config = ClassificationConfig(image_size=16, batch_size=4,
                                      num_epochs=1, hidden_features=8,
                                      mixed_precision="fp32")
        tracker = JsonlTracker(tmp_path / "runs")
        tracker.set_experiment("gen")
        with tracker.start_run(run_name="gen") as run:
            gen_run_id = run.run_id
        metrics = run_augmentation_eval(config, dirs, tracker, gen_run_id)
        assert 0.0 <= metrics["f1_score"] <= 1.0
        assert metrics["train_size"] == 6 + 3  # real + synthetic
        logged = {m["key"] for m in tracker.read_metrics(gen_run_id)}
        assert {"f1_score", "test_accuracy"} <= logged


class TestInspectLoraCLI:
    def test_lists_modules(self, tmp_path, capsys):
        import jax.numpy as jnp

        from polyp_tpu.cli.inspect_lora import main
        from polyp_tpu.lora import save_lora

        bundle = {
            "unet_lora": {"attn1": {"to_q": {
                "lora_A": jnp.zeros((8, 4)), "lora_B": jnp.zeros((4, 8))}}},
            "special_ids": jnp.asarray([500]),
        }
        save_lora(tmp_path / "lora", bundle)
        main([str(tmp_path / "lora")])
        out = capsys.readouterr().out
        assert "attn1.to_q" in out
        assert "rank(s) [4]" in out
        assert "special_ids" in out
