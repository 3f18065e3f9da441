"""PRNG discipline: splittable-key threading replacing torch global RNG.

The reference relies on torch's global RNG plus per-batch seeded CPU
generators for sampling reproducibility (`seed + batch_id`,
train_with_lora_per_class.py:78; train_from_scratch.py:54). We preserve that
contract — generation batch `i` is a pure function of `(seed, i)` — so the
idempotent sample top-up resume (train_with_lora_per_class.py:264-290)
regenerates identical images.
"""

from __future__ import annotations

import hashlib

import jax


def _stream_hash(name: str) -> int:
    """Stable 31-bit hash of a stream name (process-independent)."""
    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little") & 0x7FFFFFFF


def key_for(seed: int, *streams: str | int) -> jax.Array:
    """Derive a PRNG key from a base seed and a path of stream names/indices.

    `key_for(0, "train", epoch, step)` gives a unique, reproducible key per
    train step; string components are hashed so streams can't collide with
    integer indices.
    """
    key = jax.random.PRNGKey(seed)
    for s in streams:
        key = jax.random.fold_in(key, _stream_hash(s) if isinstance(s, str) else s)
    return key


def batch_seed_key(seed: int, batch_id: int) -> jax.Array:
    """The sampling-loop key contract: batch `i` of a generation run uses
    exactly `PRNGKey(seed + batch_id)` — the JAX analogue of
    `torch.Generator('cpu').manual_seed(config.seed + batch_id)`
    (train_with_lora_per_class.py:78). Keeping it additive (not folded)
    makes top-up resume regenerate byte-identical batches."""
    return jax.random.PRNGKey(seed + batch_id)
