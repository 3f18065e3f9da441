"""polyp-verify-assets: the asset-arrival runbook (VERDICT r4 missing #2),
tested against FABRICATED assets — a tiny diffusers-layout checkpoint
written with the same export mapping the importer round-trip tests use."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_importers import CLIP_SUBS, UNET_SUBS, VAE_SUBS, _export

pytestmark = pytest.mark.slow  # compile-heavy (builds samplers)


@pytest.fixture(scope="module")
def fabricated_checkpoint(tmp_path_factory):
    """A tiny SD checkpoint in the diffusers on-disk layout (torch .bin),
    with values DISTINCT from load_sd_stack's random init so the test
    proves the files were actually read."""
    import torch

    from polyp_tpu.models import (CLIPTextModel, TINY_TEXT_CONFIG,
                                  tiny_condition_unet, tiny_vae)

    root = tmp_path_factory.mktemp("sd_ckpt")
    k = jax.random.PRNGKey(42)  # NOT the loader's PRNGKey(0)
    unet = tiny_condition_unet()
    unet_params = unet.init(
        {"params": k}, jnp.zeros((1, 4, 4, 4)), jnp.asarray([0]),
        jnp.zeros((1, TINY_TEXT_CONFIG.max_length,
                   TINY_TEXT_CONFIG.width)))["params"]
    vae = tiny_vae()
    vae_params = vae.init(k, jnp.zeros((1, 32, 32, 3)),
                          jax.random.PRNGKey(1))["params"]
    text = CLIPTextModel(TINY_TEXT_CONFIG)
    text_params = text.init(
        k, jnp.zeros((1, TINY_TEXT_CONFIG.max_length), jnp.int32))["params"]

    for sub, params, subs, stem in [
            ("unet", unet_params, UNET_SUBS, "diffusion_pytorch_model"),
            ("vae", vae_params, VAE_SUBS, "diffusion_pytorch_model"),
            ("text_encoder", text_params, CLIP_SUBS, "model")]:
        d = root / sub
        d.mkdir()
        sd = {k2: torch.as_tensor(np.asarray(v, np.float32))
              for k2, v in _export(params, subs).items()}
        torch.save(sd, d / f"{stem}.bin")
    return root


def test_runbook_passes_on_valid_fabricated_assets(fabricated_checkpoint,
                                                   tmp_path, monkeypatch):
    monkeypatch.setenv("POLYP_QUANT_CACHE", str(tmp_path / "qc"))
    from polyp_tpu.cli.verify_assets import main

    rc = main(["--pretrained-dir", str(fabricated_checkpoint), "--tiny",
               "--image_size", "32", "--steps", "2", "--gate_batch", "2",
               "--fixtures-dir", str(tmp_path / "out")])
    assert rc == 0
    report = json.loads((tmp_path / "out" / "report.json").read_text())
    by = {r["check"]: r for r in report}
    assert by["checkpoint-leaves"]["status"] == "pass"
    assert by["sampler-fixtures"]["status"] == "pass"
    assert by["quant-gate"]["status"] == "pass"
    assert by["tokenizer-assets"]["status"] == "skip"
    assert by["downstream-f1"]["status"] == "skip"
    # fixtures landed with hashes + a re-measured gate verdict beside them
    fx = json.loads(
        (tmp_path / "out" / "sampler_fixtures.json").read_text())
    assert fx["pretrained"] is True
    assert len(fx["sha256_16"]) == 3
    assert (tmp_path / "out" / "sampler_seed0.npy").exists()
    regate = json.loads(
        (tmp_path / "out" / "quant_gate_remeasured.json").read_text())
    assert "rel_l2_real" in regate["promoted"]
    assert regate["promoted_distilled"]["gate_pass"] is True


def test_runbook_fails_on_corrupt_checkpoint(fabricated_checkpoint,
                                             tmp_path):
    import shutil

    import torch

    broken = tmp_path / "broken"
    shutil.copytree(fabricated_checkpoint, broken)
    p = broken / "unet" / "diffusion_pytorch_model.bin"
    sd = torch.load(p, map_location="cpu", weights_only=True)
    key = sorted(sd)[0]
    sd[key] = torch.zeros(3, 3, 3)  # wrong shape -> leaf validation fails
    torch.save(sd, p)

    from polyp_tpu.cli.verify_assets import main

    rc = main(["--pretrained-dir", str(broken), "--tiny",
               "--image_size", "32", "--steps", "2",
               "--skip-quant-gate", "--skip-fixtures",
               "--fixtures-dir", str(tmp_path / "out2")])
    assert rc == 1
    report = json.loads((tmp_path / "out2" / "report.json").read_text())
    by = {r["check"]: r for r in report}
    assert by["checkpoint-leaves"]["status"] == "fail"


def test_runbook_reports_random_init_as_fail(tmp_path):
    # a --pretrained-dir that doesn't exist must NOT silently pass on the
    # random-init fallback
    from polyp_tpu.cli.verify_assets import main

    rc = main(["--pretrained-dir", str(tmp_path / "nope"), "--tiny",
               "--image_size", "32", "--steps", "2",
               "--skip-quant-gate", "--skip-fixtures",
               "--fixtures-dir", str(tmp_path / "out3")])
    assert rc == 1
