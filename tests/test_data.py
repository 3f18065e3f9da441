"""Data layer: label semantics, mask multiply, cache, sampling, transforms."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from polyp_tpu.data import (
    ArrayDataset,
    AugmentedTable,
    ClassificationTable,
    DiffusionTable,
    Loader,
    augment_classifier_batch,
    augment_diffusion_batch,
    epoch_batches,
    weighted_sample_weights,
)
from polyp_tpu.data.io import apply_mask, decode_mask, load_preprocessed


class TestClassificationTable:
    def test_label_map_three_class(self, synth_polyp_dir):
        t = ClassificationTable.from_csv(synth_polyp_dir["image_dir"],
                                         synth_polyp_dir["csv"])
        assert t.label2idx == {"AD": 0, "ASS": 1, "HP": 2}
        assert t.labels == [0, 0, 0, 2, 2, 1]
        assert t.num_classes == 3

    def test_label_map_one_vs_rest(self, synth_polyp_dir):
        t = ClassificationTable.from_csv(synth_polyp_dir["image_dir"],
                                         synth_polyp_dir["csv"], one_vs_rest=True)
        assert t.label2idx == {"AD": 0, "ASS": 1, "HP": 1}
        assert t.labels == [0, 0, 0, 1, 1, 1]
        assert t.num_classes == 2
        # inverted map: later duplicate wins (reference parity)
        assert t.idx2label[1] == "HP"


class TestDiffusionTable:
    def test_keep_one_class(self, synth_polyp_dir):
        t = DiffusionTable.from_dirs([synth_polyp_dir["image_dir"]],
                                     [synth_polyp_dir["csv"]],
                                     keep_one_class="HP")
        assert len(t) == 2
        assert t.label2idx == {"HP": 0}

    def test_rest_merge(self, synth_polyp_dir):
        t = DiffusionTable.from_dirs([synth_polyp_dir["image_dir"]],
                                     [synth_polyp_dir["csv"]],
                                     keep_one_class=["HP", "ASS"])
        # HP is primary, ASS collapses into REST
        assert t.label2idx == {"HP": 0, "REST": 1}
        assert len(t) == 3

    def test_multi_dir_concat(self, synth_polyp_dir):
        t = DiffusionTable.from_dirs(
            [synth_polyp_dir["image_dir"], synth_polyp_dir["image_dir"]],
            [synth_polyp_dir["csv"], synth_polyp_dir["csv"]])
        assert len(t) == 12


class TestAugmentedTable:
    def _make_synth_dir(self, tmp_path, name, n):
        d = tmp_path / "samples" / name
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / f"{i}.png")
        return d

    def test_mixed_real_synthetic(self, synth_polyp_dir, tmp_path):
        hp_dir = self._make_synth_dir(tmp_path, "HP", 4)
        t = AugmentedTable.from_dirs([
            (synth_polyp_dir["image_dir"], synth_polyp_dir["csv"]),
            (hp_dir, None),
        ])
        assert len(t) == 10
        assert t.labels[-4:] == [2, 2, 2, 2]  # HP → 2 in 3-class map

    def test_ad_vs_rest_dir_label(self, synth_polyp_dir, tmp_path):
        # non-AD dir basename maps to REST when REST exists
        ass_dir = self._make_synth_dir(tmp_path, "ASS", 2)
        t = AugmentedTable.from_dirs([
            (synth_polyp_dir["image_dir"], synth_polyp_dir["csv"]),
            (ass_dir, None),
        ], ad_vs_rest=True)
        assert t.label2idx == {"AD": 0, "REST": 1}
        assert t.labels[:6] == [0, 0, 0, 1, 1, 1]
        assert t.labels[-2:] == [1, 1]


class TestIO:
    def test_mask_multiply(self, synth_polyp_dir):
        mask = decode_mask(synth_polyp_dir["mask_dir"] / "img_000.tif")
        img = np.full((40, 48, 3), 100, np.uint8)
        out = apply_mask(img, mask)
        assert out[0, 0].tolist() == [0, 0, 0]
        assert out[20, 20].tolist() == [100, 100, 100]

    def test_load_preprocessed_shape(self, synth_polyp_dir):
        out = load_preprocessed(synth_polyp_dir["image_dir"] / "img_000.tif", 32)
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8


class TestCacheAndLoader:
    def test_cache_roundtrip(self, synth_polyp_dir, tmp_path):
        t = ClassificationTable.from_csv(synth_polyp_dir["image_dir"],
                                         synth_polyp_dir["csv"])
        ds1 = ArrayDataset.from_table(t, 32, cache_dir=tmp_path)
        ds2 = ArrayDataset.from_table(t, 32, cache_dir=tmp_path)  # from npz
        np.testing.assert_array_equal(ds1.images, ds2.images)
        np.testing.assert_array_equal(ds1.labels, ds2.labels)
        assert ds1.images.shape == (6, 32, 32, 3)

    def test_weighted_sampling_balances_classes(self):
        labels = np.array([0] * 90 + [1] * 10)
        w = weighted_sample_weights(labels)
        rng = np.random.default_rng(0)
        batches = epoch_batches(100, 10, rng, weights=w)
        drawn = np.concatenate(batches)
        frac_minority = np.mean(labels[drawn] == 1)
        assert 0.3 < frac_minority < 0.7  # ≈0.5 when balanced

    def test_loader_padding_and_mask(self):
        images = np.zeros((5, 4, 4, 3), np.uint8)
        labels = np.arange(5, dtype=np.int32)
        loader = Loader(images, labels, batch_size=4, shuffle=False)
        batches = list(loader)
        assert len(batches) == 2
        _, _, valid = batches[1]
        assert np.asarray(valid).tolist() == [True, False, False, False]

    def test_loader_drop_last(self):
        images = np.zeros((5, 4, 4, 3), np.uint8)
        labels = np.arange(5, dtype=np.int32)
        loader = Loader(images, labels, batch_size=4, shuffle=False, drop_last=True)
        assert len(list(loader)) == 1

    def test_loader_deterministic_given_seed(self):
        images = np.arange(6 * 4 * 4 * 3, dtype=np.uint8).reshape(6, 4, 4, 3)
        labels = np.arange(6, dtype=np.int32)
        a = [np.asarray(b[1]) for b in Loader(images, labels, 2, seed=7)]
        b = [np.asarray(b[1]) for b in Loader(images, labels, 2, seed=7)]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestTransforms:
    def test_classifier_normalization(self):
        x = jnp.full((2, 8, 8, 3), 128, jnp.uint8)
        out = augment_classifier_batch(x, jax.random.PRNGKey(0), train=False,
                                       dtype=jnp.float32)
        expected = (128 / 255.0 - 0.485) / 0.229
        assert out.shape == (2, 8, 8, 3)
        np.testing.assert_allclose(out[0, 0, 0, 0], expected, rtol=1e-5)

    def test_diffusion_range(self):
        x = jnp.stack([jnp.zeros((8, 8, 3), jnp.uint8),
                       jnp.full((8, 8, 3), 255, jnp.uint8)])
        out = augment_diffusion_batch(x, jax.random.PRNGKey(0), train=False)
        np.testing.assert_allclose(out[0].min(), -1.0, atol=1e-6)
        np.testing.assert_allclose(out[1].max(), 1.0, atol=1e-6)

    def test_flip_is_deterministic_per_key(self):
        x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (4, 8, 8, 3),
                                                          dtype=np.uint8))
        k = jax.random.PRNGKey(42)
        a = augment_diffusion_batch(x, k, train=True)
        b = augment_diffusion_batch(x, k, train=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestProcessSharding:
    """Multi-host data sharding contract (ADVICE r1 low): equal step counts
    per host and a __len__ that matches reality."""

    def _loader(self, n, batch, shard):
        from polyp_tpu.data.pipeline import Loader
        images = np.zeros((n, 4, 4, 3), np.float32)
        labels = np.arange(n) % 3
        return Loader(images, labels, batch, seed=0, shuffle=False,
                      process_shard=shard)

    def test_equal_batches_per_host(self, monkeypatch):
        import polyp_tpu.data.pipeline as pl
        # 10 batches over 3 fake hosts: 3 each, 1 dropped
        monkeypatch.setattr(pl.jax, "process_count", lambda: 3)
        counts = []
        for rank in range(3):
            monkeypatch.setattr(pl.jax, "process_index", lambda r=rank: r)
            loader = self._loader(40, 4, shard=True)
            batches = list(loader)
            counts.append(len(batches))
            assert len(loader) == len(batches)
        assert counts == [3, 3, 3]

    def test_hosts_disjoint_cover(self, monkeypatch):
        import polyp_tpu.data.pipeline as pl
        monkeypatch.setattr(pl.jax, "process_count", lambda: 2)
        seen = []
        for rank in range(2):
            monkeypatch.setattr(pl.jax, "process_index", lambda r=rank: r)
            for _, labels, valid in self._loader(24, 4, shard=True):
                seen.append(np.asarray(labels))
        flat = np.concatenate(seen)
        assert flat.shape[0] == 24  # all 6 batches, no dup, no loss
