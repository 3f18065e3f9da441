"""MlflowTracker against a REAL mlflow file store (VERDICT r1 item 7).

The reference's observability backbone is mlflow (classifier.py:21-24); the
parity claim must not rest on dead code. These tests exercise the
MlflowTracker end-to-end against a local `file:` store — params, metrics
(with steps), file AND directory artifacts, run-linking by run_id across
tracker instances/experiments (test_diffusion_model.py:259,366) — and assert
contract parity with the JsonlTracker on the same operation sequence.

mlflow is not installed in every image; the module skips cleanly when absent
(the JSONL backend is the tested default there).
"""

import numpy as np
import pytest

mlflow = pytest.importorskip("mlflow")

from polyp_tpu.track.tracker import JsonlTracker, MlflowTracker  # noqa: E402


@pytest.fixture()
def store(tmp_path):
    return f"file://{tmp_path}/mlruns"


def drive(tracker, artifact_file, artifact_dir):
    """The reference's logging sequence, shared across backends."""
    tracker.set_experiment("generator_model")
    with tracker.start_run(run_name="polyp_run") as run:
        tracker.log_params({"learning_rate": 1e-4, "optimizer": "AdamW",
                            "modules_lora": ["to_q", "to_k"]})
        tracker.log_param("prompt_AD", "a realistic photo of colon polyp")
        for step, loss in enumerate([0.9, 0.5, 0.3]):
            tracker.log_metric("train_loss_AD", loss, step)
        tracker.log_artifact(str(artifact_file))
        tracker.log_artifact(str(artifact_dir), "models")
        run_id = run.info.run_id
    return run_id


@pytest.fixture()
def artifacts(tmp_path):
    f = tmp_path / "loss.png"
    f.write_bytes(b"png-bytes")
    d = tmp_path / "lora_AD"
    d.mkdir()
    (d / "weights.bin").write_bytes(b"w")
    return f, d


def test_mlflow_logging_roundtrip(store, artifacts):
    t = MlflowTracker(store)
    run_id = drive(t, *artifacts)

    params = t.read_params(run_id)
    assert params["learning_rate"] == "0.0001"  # mlflow stringifies
    assert params["optimizer"] == "AdamW"
    assert params["prompt_AD"] == "a realistic photo of colon polyp"

    hist = sorted((m["step"], m["value"]) for m in t.read_metrics(run_id)
                  if m["key"] == "train_loss_AD")
    assert hist == [(0, 0.9), (1, 0.5), (2, 0.3)]

    client = mlflow.tracking.MlflowClient(store)
    top = {a.path for a in client.list_artifacts(run_id)}
    assert "loss.png" in top and "models" in top
    nested = {a.path for a in client.list_artifacts(run_id, "models/lora_AD")}
    assert "models/lora_AD/weights.bin" in nested


def test_run_linking_across_experiments(store, artifacts):
    """The downstream eval logs into the GENERATOR's run by run_id
    (test_diffusion_model.py:259,366) — even with a different experiment
    set on the second tracker."""
    t1 = MlflowTracker(store)
    run_id = drive(t1, *artifacts)

    t2 = MlflowTracker(store)
    t2.set_experiment("test_diffusion_model")
    with t2.start_run(run_id=run_id):
        t2.log_metric("f1_score", 0.6069)
    hist = [m for m in t2.read_metrics(run_id) if m["key"] == "f1_score"]
    assert len(hist) == 1 and np.isclose(hist[0]["value"], 0.6069)
    # and the original run's metrics are still there
    assert any(m["key"] == "train_loss_AD" for m in t2.read_metrics(run_id))


def test_contract_parity_with_jsonl(store, artifacts, tmp_path):
    """Same operation sequence → same observable contract on both backends:
    identical param keys, identical metric histories, identical artifact
    layout under the run."""
    mt = MlflowTracker(store)
    jt = JsonlTracker(tmp_path / "jsonl_store")
    m_run = drive(mt, *artifacts)
    j_run = drive(jt, *artifacts)

    assert set(mt.read_params(m_run)) == set(jt.read_params(j_run))
    m_hist = sorted((m["key"], m["step"], m["value"])
                    for m in mt.read_metrics(m_run))
    j_hist = sorted((m["key"], m["step"], m["value"])
                    for m in jt.read_metrics(j_run))
    assert m_hist == j_hist

    # artifact layout: run root has loss.png + models/lora_AD/weights.bin
    jdir = jt._dir_for(j_run) / "artifacts"
    assert (jdir / "loss.png").exists()
    assert (jdir / "models" / "lora_AD" / "weights.bin").exists()
    client = mlflow.tracking.MlflowClient(store)
    assert {a.path for a in client.list_artifacts(m_run)} == {"loss.png",
                                                              "models"}


def test_nested_runs_do_not_raise(store):
    t = MlflowTracker(store)
    t.set_experiment("outer")
    with t.start_run(run_name="outer") as outer:
        with t.start_run(run_name="inner") as inner:
            t.log_metric("inner_metric", 1.0)
        assert outer.run_id != inner.run_id
