"""Tensor-parallel parameter sharding rules for the UNet/CLIP stacks.

Megatron-style sharding of the transformer sub-layers, expressed as
PartitionSpecs applied by parameter-path pattern (the pytree analogue of a
GSPMD annotation pass):

* attention to_q/to_k/to_v and FF up-projection kernels: shard the *output*
  features on 'model' (column parallel);
* to_out and FF down-projection kernels: shard the *input* features
  (row parallel) — XLA inserts the psum on ICI at the row-parallel edge;
* everything else (convs, norms, embeddings) replicated — convs dominate
  FLOPs but not memory, and replicating them keeps halo exchanges out of
  the conv path.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("to_q", "to_k", "to_v", "ff_net_0_proj", "q_proj",
                   "k_proj", "v_proj", "fc1")
ROW_PARALLEL = ("to_out", "ff_net_2", "out_proj", "fc2")


def _spec_for(path: tuple[str, ...], leaf, model_axis: str) -> P:
    if len(path) >= 2 and path[-1] == "kernel" and leaf.ndim == 2:
        module = path[-2]
        if module in COLUMN_PARALLEL:
            return P(None, model_axis)
        if module in ROW_PARALLEL:
            return P(model_axis, None)
    if len(path) >= 2 and path[-1] == "bias" and path[-2] in COLUMN_PARALLEL:
        return P(model_axis)
    return P()


def _sharding_tree(tree: Any, mesh: Mesh, model_axis: str, spec_fn) -> Any:
    """Walk a param pytree building NamedShardings from `spec_fn(path, leaf)`
    when the mesh has a >1 'model' axis, replicating otherwise (pure DP)."""
    has_model = model_axis in mesh.axis_names and mesh.shape[model_axis] > 1

    def walk(node, path=()):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        spec = spec_fn(path, node) if has_model else P()
        return NamedSharding(mesh, spec)

    return walk(tree)


def unet_param_sharding(params: Any, mesh: Mesh,
                        model_axis: str = "model") -> Any:
    """NamedSharding tree for a param pytree under `mesh`. With no 'model'
    axis in the mesh, everything is replicated (pure DP)."""
    return _sharding_tree(params, mesh, model_axis,
                          lambda path, leaf: _spec_for(path, leaf, model_axis))


def shard_params(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """device_put params according to the sharding rules."""
    shardings = unet_param_sharding(params, mesh, model_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def _lora_spec_for(path: tuple[str, ...], model_axis: str) -> P:
    """Adapter factors must shard consistently with their target kernel:
    column-parallel targets shard B's output features; row-parallel targets
    shard A's input features; the r-dim stays replicated (r≤16 — far below
    a useful shard size)."""
    if len(path) >= 2:
        module, leaf = path[-2], path[-1]
        if module in COLUMN_PARALLEL and leaf == "lora_B":
            return P(None, model_axis)
        if module in ROW_PARALLEL and leaf == "lora_A":
            return P(model_axis, None)
    return P()


def lora_param_sharding(adapter: Any, mesh: Mesh,
                        model_axis: str = "model") -> Any:
    """NamedSharding tree for a LoRA adapter pytree, matching
    unet_param_sharding's TP layout so base+(A@B) merges without resharding."""
    return _sharding_tree(adapter, mesh, model_axis,
                          lambda path, leaf: _lora_spec_for(path, model_axis))


def shard_lora(adapter: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """device_put a LoRA adapter according to the TP-consistent rules."""
    shardings = lora_param_sharding(adapter, mesh, model_axis)
    return jax.tree_util.tree_map(jax.device_put, adapter, shardings)
