"""bench.py `bench_distilled` contract (quick mode, CPU): the distilled
few-step bench decomposes UNet-scan vs VAE-decode time, and the quantized
composition reports image-level fidelity (`quant_rel_l2` — the fixed-key
quantized trajectory vs the bf16 trajectory through the same bf16 decode).

The chip numbers live in BASELINE.md (round 4: 54.8 samples/sec 8-step /
86.2 4-step); these tests pin the *shape* of what bench.py emits so the
driver-parsed JSON line cannot silently lose fields.
"""

import math
import runpy
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def bench():
    sys.path.insert(0, str(REPO_ROOT))
    try:
        return runpy.run_path(str(REPO_ROOT / "bench.py"))
    finally:
        sys.path.remove(str(REPO_ROOT))


@pytest.mark.slow
def test_bench_distilled_quick_decomposition(bench):
    d = bench["bench_distilled"](2, 64, 4, quick=True, repeats=1)
    assert d["steps"] == 4 and d["batch_size"] == 2
    assert d["samples_per_sec"] > 0
    # the decomposition must account for the whole sample
    assert d["unet_scan_sec"] > 0 and d["vae_decode_sec"] > 0
    assert 0.0 < d["vae_share"] < 1.0
    assert "quant_rel_l2" not in d and "vae_q_rel_l2" not in d


@pytest.mark.slow
def test_bench_distilled_quant_fidelity_fields(bench):
    d = bench["bench_distilled"](2, 64, 4, quick=True, repeats=1,
                                 quantize="w8a8", quantize_vae=True)
    # the UNet trajectory probe: the tiny UNet has >=64-channel layers, so
    # int8 engages and the fixed-key images must differ from bf16 — but
    # they live on the same scale, so rel L2 stays well under 1
    assert "quant_rel_l2" in d
    assert math.isfinite(d["quant_rel_l2"])
    assert 0.0 < d["quant_rel_l2"] < 1.0, d["quant_rel_l2"]
    # the VAE probe rides along too — and pins the channel gate: every
    # tiny_vae conv sits below quant.MIN_QUANT_CHANNELS (64), so the int8
    # decode is a deliberate no-op there and the fidelity probe proves it
    # (bit-identical to bf16). On the real AutoencoderKL (128-512 ch) the
    # chip-measured value is 0.080 (BASELINE.md round-4 VAE verdict).
    assert "vae_q_rel_l2" in d
    assert d["vae_q_rel_l2"] == 0.0, d["vae_q_rel_l2"]
