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


def extract_by_mask(params: Any, mask: Any) -> Any:
    """Subtree of `params` keeping only mask-True leaves (empty branches
    dropped) — the trainable subset for unfreeze_layers."""

    def walk(p, m):
        if isinstance(p, dict):
            out = {}
            for k, v in p.items():
                sub = walk(v, m[k])
                if sub is not None and (not isinstance(sub, dict) or sub):
                    out[k] = sub
            return out
        return p if m else None

    return walk(params, mask)


def overlay_params(base: Any, subset: Any) -> Any:
    """Base tree with `subset` leaves substituted (functional update);
    gradients flow only into the subset when it is the traced argument."""
    if not isinstance(base, dict):
        return subset if subset is not None else base
    out = {}
    for k, v in base.items():
        if isinstance(subset, dict) and k in subset:
            out[k] = overlay_params(v, subset[k])
        else:
            out[k] = v
    return out


def trainable_count(params: Any, mask: Any) -> tuple[int, int]:
    """(trainable, total) parameter counts under a mask — for the
    trainable-% printout parity (PolypGeneratorModel.py:56-58)."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = sum(x.size for _, x in leaves)
    mask_leaves = jax.tree_util.tree_leaves(mask)
    param_leaves = jax.tree_util.tree_leaves(params)
    trainable = sum(p.size for p, m in zip(param_leaves, mask_leaves) if m)
    return trainable, total
