"""bench.py CLI argument contract — the driver-parsed entry point.

These tests exercise main()'s flag handling WITHOUT running any bench:
the rejection paths exit before any model is built, and the promoted-
alias resolution is observed by monkeypatching the bench functions.
Mirrors the CLI surfaces' `--quantize promoted` semantics
(polyp_tpu/ops/quant.py::resolve_quantize_arg): bench.py is distilled-
aware like polyp-serve/bench_serve.
"""

import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture
def bench_mod():
    sys.path.insert(0, str(ROOT))
    try:
        import bench
    finally:
        sys.path.pop(0)
    return bench


def _run_main(bench, monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["bench.py", "--watchdog", "0"] + argv)
    bench.main()


class TestDistilledFlagRejections:
    """Silently-ignored combinations must refuse loudly (round-4 batch)."""

    def test_fp_head_rejected(self, bench_mod, monkeypatch):
        with pytest.raises(SystemExit, match="hybrid-precision"):
            _run_main(bench_mod, monkeypatch,
                      ["--distilled", "8", "--quantize", "w8a8_static",
                       "--quant-fp-head", "2"])

    def test_fp_tail_rejected(self, bench_mod, monkeypatch):
        with pytest.raises(SystemExit, match="hybrid-precision"):
            _run_main(bench_mod, monkeypatch,
                      ["--distilled", "4", "--quantize", "w8a8_static",
                       "--quant-fp-tail", "1"])

    def test_train_combo_rejected(self, bench_mod, monkeypatch):
        with pytest.raises(SystemExit, match="standalone"):
            _run_main(bench_mod, monkeypatch, ["--distilled", "8", "--train"])


class TestPromotedAlias:
    """--quantize promoted resolves through the vendored gate verdict,
    distilled-aware — and the resolved fp_head=0 passes the distilled
    rejection (the full-trajectory verdict's head must NOT leak onto a
    few-step grid)."""

    def test_distilled_promoted_resolves_to_distilled_verdict(
            self, bench_mod, monkeypatch, capsys):
        from polyp_tpu.ops.quant import promoted_config
        pd = promoted_config(distilled=True)
        if pd is None:
            pytest.skip("no gate-passing distilled config vendored")
        seen = {}

        def fake_distilled(batch, image_size, steps, quick, quantize=None,
                           quantize_vae=False, **kw):
            seen.update(batch=batch, steps=steps, quantize=quantize)
            return {"samples_per_sec": 1.0, "steps": steps,
                    "batch_size": batch, "unet_scan_sec": 0.1,
                    "vae_decode_sec": 0.05, "vae_share": 0.33}

        monkeypatch.setattr(bench_mod, "bench_distilled", fake_distilled)
        _run_main(bench_mod, monkeypatch,
                  ["--distilled", "8", "--quantize", "promoted"])
        assert seen["quantize"] == pd["mode"]
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["unit"] == "samples/sec/chip"
        assert out["distilled_steps"] == 8

    def test_full_trajectory_promoted_carries_fp_head(
            self, bench_mod, monkeypatch, capsys):
        from polyp_tpu.ops.quant import promoted_config
        promo = promoted_config()
        if promo is None:
            pytest.skip("no gate-passing config vendored (demoted state)")
        calls = []

        def fake_sampling(batch, image_size, steps, sampler, quick,
                          quantize=None, quant_fp_head=0, quant_fp_tail=0):
            calls.append((quantize, quant_fp_head, quant_fp_tail))
            return {"samples_per_sec": 1.0, "batch_size": batch}

        monkeypatch.setattr(bench_mod, "bench_sampling", fake_sampling)
        # --quick keeps main() off the companion/promoted-headline path:
        # ONE bench_sampling call with the user's resolved flags
        _run_main(bench_mod, monkeypatch,
                  ["--quick", "--quantize", "promoted"])
        assert calls == [(promo["mode"],
                          int(promo.get("quant_fp_head", 0)),
                          int(promo.get("quant_fp_tail", 0)))]

    def test_explicit_batch_not_overridden_by_verdict(
            self, bench_mod, monkeypatch, capsys):
        """Default-batch runs adopt the promoted verdict's measured batch;
        an explicit --batch must win (round-4 batch)."""
        promo = bench_mod._promoted_quant()
        if promo is None or "batch" not in promo:
            pytest.skip("no promoted verdict with a measured batch")
        batches = []

        def fake_sampling(batch, image_size, steps, sampler, quick,
                          quantize=None, quant_fp_head=0, quant_fp_tail=0):
            batches.append((batch, quantize))
            return {"samples_per_sec": 1.0, "batch_size": batch}

        def fake_distilled(batch, image_size, steps, quick, quantize=None,
                           quantize_vae=False):
            # the distilled companions always ride the default run; they
            # use their own measured batch optima, not --batch
            return {"samples_per_sec": 1.0, "steps": steps,
                    "batch_size": batch, "unet_scan_sec": 0.1,
                    "vae_decode_sec": 0.05, "vae_share": 0.33,
                    "quant_rel_l2": 0.01}

        monkeypatch.setattr(bench_mod, "bench_sampling", fake_sampling)
        monkeypatch.setattr(bench_mod, "bench_distilled", fake_distilled)
        monkeypatch.setattr(bench_mod, "_promoted_quant", lambda: promo)
        _run_main(bench_mod, monkeypatch, ["--batch", "4"])
        # headline (promoted @ explicit batch) + bf16 companion @ batch 4
        assert (4, promo["mode"]) in batches
        assert all(b == 4 for b, _ in batches)
        # and with the default batch, the verdict's measured batch applies
        batches.clear()
        _run_main(bench_mod, monkeypatch, [])
        assert (int(promo["batch"]), promo["mode"]) in batches
