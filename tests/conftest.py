"""Test env: force an 8-device CPU platform so mesh/sharding tests run
without TPU hardware (SURVEY §4 plan item d). Must run before jax imports."""

import os

# FORCE cpu: the base environment exports JAX_PLATFORMS=axon (the real TPU)
# and a sitecustomize imports jax at interpreter startup, so env-var edits
# here are too late — use jax.config.update, which works any time before
# backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: repeat suite runs on this 1-core host reload
# compiled graphs in seconds instead of recompiling for minutes. Keyed by a
# host fingerprint (CPU features + jax version) so a CPU AOT artifact
# compiled on one machine's ISA extensions is never deserialized on a host
# that lacks them (latent SIGILL — VERDICT r3 #6).
from polyp_tpu.utils.host import host_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache_tests_{host_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from PIL import Image  # noqa: E402


@pytest.fixture
def synth_polyp_dir(tmp_path):
    """A miniature polyp dataset on disk: CSV-labeled .tif images + masks,
    mirroring the reference data layout (m_train/images + train.csv)."""
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rows = []
    classes = ["AD", "AD", "AD", "HP", "HP", "ASS"]
    for i, cls in enumerate(classes):
        image_id = f"img_{i:03d}"
        arr = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{image_id}.tif")
        mask = np.zeros((40, 48), dtype=np.uint8)
        mask[10:30, 12:36] = 255
        Image.fromarray(mask).save(mask_dir / f"{image_id}.tif")
        rows.append((image_id, cls))
    csv_path = tmp_path / "train.csv"
    csv_path.write_text("image_id,cls\n" + "\n".join(f"{a},{b}" for a, b in rows) + "\n")
    return {"image_dir": img_dir, "mask_dir": mask_dir, "csv": csv_path,
            "classes": classes}


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Long single-process runs of the compile-heavy suite accumulate live
    CPU executables until jaxlib segfaults/aborts inside a late pjit compile
    (observed at >200 tests on this host). Dropping compiled-computation
    caches at module boundaries bounds that accumulation; the persistent
    on-disk cache keeps repeat compiles cheap."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
