"""Trainability partitioning by parameter path.

The JAX replacement for torch `requires_grad` toggling
(PolypGeneratorModel.unfreeze_layers, PolypGeneratorModel.py:61-63;
`--unfreeze_layers` at train_with_lora_per_class.py:318-321): build a boolean
mask pytree from substring predicates and hand it to `optax.masked` (or use
it to zero gradients), leaving the model untouched.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax


def path_mask(params: Any, substrings: Sequence[str]) -> Any:
    """Mask pytree: True where any substring appears in the '/'-joined
    parameter path (matching the reference's `any(x in name ...)`)."""

    def walk(node: Any, path: str) -> Any:
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}" if path else str(k))
                    for k, v in node.items()}
        return any(s in path for s in substrings)

    return walk(params, "")


def trainable_count(params: Any, mask: Any) -> tuple[int, int]:
    """(trainable, total) parameter counts under a mask — for the
    trainable-% printout parity (PolypGeneratorModel.py:56-58)."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = sum(x.size for _, x in leaves)
    mask_leaves = jax.tree_util.tree_leaves(mask)
    param_leaves = jax.tree_util.tree_leaves(params)
    trainable = sum(p.size for p, m in zip(param_leaves, mask_leaves) if m)
    return trainable, total
