"""Batching, class-balanced sampling, and a prefetching device loader.

TPU-first input pipeline: index sampling happens on host with a seeded NumPy
generator, batches are uint8 slices of the in-memory cache, and transfers are
double-buffered (`device_put` one batch ahead) so the H2D copy overlaps the
previous step's compute. Per-pixel augmentation runs on device (transforms.py),
not here.

Weighted sampling reproduces torch's `WeightedRandomSampler(weights,
num_samples=len, replacement=True)` semantics (classifier.py:330-337):
draws-with-replacement proportional to 'balanced' class weights.
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

from polyp_tpu.eval.metrics import balanced_class_weights


def weighted_sample_weights(labels) -> np.ndarray:
    """Per-sample draw weights = balanced class weight of the label
    (classifier.py:331-332)."""
    weights = balanced_class_weights(labels)
    return np.asarray([weights[int(l)] for l in np.asarray(labels)], dtype=np.float64)


def epoch_batches(
    n: int,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
    drop_last: bool = False,
    weights: np.ndarray | None = None,
) -> list[np.ndarray]:
    """Index batches for one epoch.

    With `weights`, draws n samples with replacement ∝ weights (weighted
    sampling); otherwise a permutation (shuffle) or arange. `drop_last`
    matches the reference train loader (classifier.py:326).
    """
    if weights is not None:
        p = weights / weights.sum()
        order = rng.choice(n, size=n, replace=True, p=p)
    elif shuffle:
        order = rng.permutation(n)
    else:
        order = np.arange(n)
    end = (n // batch_size) * batch_size if drop_last else n
    return [order[i:i + batch_size] for i in range(0, end, batch_size)
            if drop_last is False or i + batch_size <= n]


class Loader:
    """Iterates device-resident (images, labels) batches with one-batch-ahead
    prefetch. Batches keep a static shape (required under jit): when
    `drop_last=False` the tail batch is padded by wrapping around, and a
    boolean `valid` mask marks real rows — eval loops mask the padding out
    instead of recompiling for a ragged tail."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 *, seed: int = 0, shuffle: bool = True, drop_last: bool = False,
                 weights: np.ndarray | None = None, device=None,
                 process_shard: bool = False, mesh=None):
        """`process_shard=True` gives each host its own 1/process_count slice
        of every epoch's index stream (identical seeded order on all hosts,
        disjoint strided selection) — the DCN-side data sharding for
        multi-host pods (SURVEY §2 parallelism plan).

        `mesh` (a jax.sharding.Mesh with a 'data' axis) makes every yielded
        batch land batch-dim-sharded over the mesh's ICI — jitted steps then
        run data-parallel with XLA inserting the gradient psum."""
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.weights = weights
        self.device = device
        self.mesh = mesh
        if mesh is not None:
            from polyp_tpu.parallel.mesh import validate_batch_for_mesh
            validate_batch_for_mesh(batch_size, mesh)
        self.process_shard = process_shard
        self._rng = np.random.default_rng(seed)
        # Fixed for the Loader's lifetime — computed once, not per batch.
        # When True, every host participates in the same global SPMD step,
        # so hosts must feed the SAME global batch (assembled shard-wise in
        # __iter__) — strided whole-batch sharding would make each global
        # step a mixture of different hosts' batches, silently dropping
        # (pc-1)/pc of the data. Per-host striding stays for independent
        # training (process_shard without a cross-process mesh).
        self._spans_processes = self._mesh_spans_processes()
        self._stride_hosts = (process_shard and jax.process_count() > 1
                              and not self._spans_processes)

    def _mesh_spans_processes(self) -> bool:
        """Does `mesh` include devices of OTHER processes?"""
        if self.mesh is None or jax.process_count() == 1:
            return False
        me = jax.process_index()
        return any(d.process_index != me for d in self.mesh.devices.flat)

    def __len__(self) -> int:
        n = len(self.labels)
        total = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        if self._stride_hosts:
            # every host runs the same (truncated) number of steps — see
            # _host_batches; with_schedule step counts must match reality.
            return total // jax.process_count()
        return total

    def _host_batches(self):
        n = len(self.labels)
        batches = epoch_batches(n, self.batch_size, self._rng, self.shuffle,
                                self.drop_last, self.weights)
        if self._stride_hosts:
            # Independent per-host training (no cross-process mesh): each
            # host takes a disjoint strided slice of the epoch, truncated to
            # a multiple of process_count so step counts agree across hosts.
            pc = jax.process_count()
            batches = batches[: (len(batches) // pc) * pc]
            batches = batches[jax.process_index()::pc]
        for idx in batches:
            valid = np.ones(self.batch_size, dtype=bool)
            if len(idx) < self.batch_size:
                pad = self.batch_size - len(idx)
                valid[len(idx):] = False
                idx = np.concatenate([idx, np.arange(pad) % n])
            yield (self.images[idx], self.labels[idx], valid)

    def skip_epochs(self, k: int) -> None:
        """Advance the index RNG past `k` epochs without materializing any
        batch — crash-resume replay (train/resume.py): a Loader's per-epoch
        order is a function of how many epochs were drawn before it, so a
        resumed run fast-forwards to `start_epoch` and then yields exactly
        the batches the uninterrupted run would have."""
        n = len(self.labels)
        for _ in range(max(k, 0)):
            epoch_batches(n, self.batch_size, self._rng, self.shuffle,
                          self.drop_last, self.weights)

    def __iter__(self) -> Iterator[tuple[jax.Array, jax.Array, jax.Array]]:
        pending = None
        for host_batch in self._host_batches():
            if self._spans_processes:
                # every host holds the identical full batch (same seed, no
                # striding); each contributes exactly its addressable shards.
                from polyp_tpu.parallel.mesh import data_sharding

                def put(x):
                    x = np.asarray(x)
                    sh = data_sharding(self.mesh, x.ndim)
                    return jax.make_array_from_callback(
                        x.shape, sh, lambda idx: x[idx])

                nxt = tuple(put(a) for a in host_batch)
            elif self.mesh is not None:
                from polyp_tpu.parallel.mesh import shard_batch
                nxt = shard_batch(host_batch, self.mesh)
            else:
                nxt = jax.device_put(host_batch, self.device)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending
