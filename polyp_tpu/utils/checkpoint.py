"""Orbax-backed checkpointing of parameter pytrees.

Replaces the reference's `torch.save(state_dict)` best-checkpoint flow
(classifier.py:189-192, reload at :227) and HF `save_pretrained` layouts
(train_from_scratch.py:128-131). Adapter (LoRA) pytrees are saved through the
same helpers as separate small trees (see polyp_tpu.lora).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_pytree(path: str | Path, tree: Any) -> None:
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_pytree(path: str | Path, like: Any | None = None) -> Any:
    """Restore a pytree; `like` (a matching abstract/concrete tree) restores
    with correct dtypes/shapes and sharding."""
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, like)
        return ckptr.restore(path, args=ocp.args.PyTreeRestore(abstract))


def exists(path: str | Path) -> bool:
    return Path(path).exists()
