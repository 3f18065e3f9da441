"""LoRA as pytree parameter surgery.

The reference attaches PEFT adapters to torch modules
(`unet.add_adapter(LoraConfig(r=8, lora_alpha=8,
target_modules=["to_q","to_k","to_v","to_out.0"], lora_dropout=0.3,
init_lora_weights="gaussian"))`, train_with_lora_per_class.py:310-323) and
filters trainable params by `requires_grad`. The JAX-native design keeps the
frozen base params and the adapter as *separate pytrees*:

* `init_lora(params, config, rng)` walks the base tree and creates
  {A:[in,r], B:[r,out]} factors for every Dense/1×1-conv kernel whose module
  name matches a target (B zero-init, A gaussian — PEFT parity, so the
  adapter starts as an exact no-op).
* `merge_lora(params, adapter, ...)` returns base + (α/r)·A@B merged kernels
  — used inside the jitted train step (differentiating through the merge
  w.r.t. the adapter gives exactly the LoRA gradients) and for inference.
* dropout: torch applies dropout to the adapter's input activations
  per-token; the kernel-space equivalent used here drops input *features*
  (rows of A@B) with one mask per step — same expectation, coarser
  granularity; documented deviation.
* `lorarized_layers` reproduces the introspection tool
  (get_lorarized_layers.py:7-24) on saved adapter trees.

Only the adapter pytree is handed to the optimizer, replacing torch's
requires_grad filtering (train_from_pretrained.py:156-159).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from polyp_tpu.utils.checkpoint import load_pytree, save_pytree
from polyp_tpu.utils.rng import _stream_hash


@dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float | None = None  # None → = rank (reference parity)
    dropout: float = 0.0
    target_modules: Sequence[str] = ("to_q", "to_k", "to_v", "to_out")

    @property
    def scale(self) -> float:
        return (self.alpha if self.alpha is not None else self.rank) / self.rank


def _is_target(path: tuple[str, ...], targets: Sequence[str]) -> bool:
    """A leaf `.../<module>/kernel` is targeted when <module> matches."""
    return len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets


def _flatten(tree: Any, prefix: tuple[str, ...] = ()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (str(k),))
    else:
        yield prefix, tree


def _kernel_in_out(kernel: jax.Array) -> tuple[int, int]:
    """(fan_in, fan_out) for Dense [in,out] or 1×1 conv [1,1,in,out]."""
    if kernel.ndim == 2:
        return kernel.shape
    if kernel.ndim == 4 and kernel.shape[0] == kernel.shape[1] == 1:
        return kernel.shape[2], kernel.shape[3]
    raise ValueError(f"LoRA target kernel has unsupported shape {kernel.shape}")


def init_lora(params: Any, config: LoRAConfig, rng: jax.Array) -> Any:
    """Adapter pytree mirroring `params` structure at targeted kernels:
    {..., module: {"lora_A": [in, r], "lora_B": [r, out]}}."""
    adapter: dict = {}
    for path, leaf in _flatten(params):
        if not _is_target(path, config.target_modules):
            continue
        fan_in, fan_out = _kernel_in_out(leaf)
        rng, k = jax.random.split(rng)
        node = adapter
        for p in path[:-1]:
            node = node.setdefault(p, {})
        # PEFT "gaussian" init: A ~ N(0, 1/r), B = 0 → adapter starts as no-op
        node["lora_A"] = (jax.random.normal(k, (fan_in, config.rank), jnp.float32)
                          / config.rank)
        node["lora_B"] = jnp.zeros((config.rank, fan_out), jnp.float32)
    return adapter


def apply_lora_to_kernels(params: Any, adapter: Any, scale: float,
                          dropout_rate: float = 0.0,
                          dropout_rng: jax.Array | None = None) -> Any:
    """Pure function: new params tree with kernel += scale·A@B at adapted
    leaves. Differentiable w.r.t. `adapter`."""

    def walk(p_node: Any, a_node: Any, rng: jax.Array | None) -> Any:
        if not isinstance(p_node, dict):
            return p_node
        if isinstance(a_node, dict) and "lora_A" in a_node:
            a, b = a_node["lora_A"], a_node["lora_B"]
            if dropout_rate > 0.0 and rng is not None:
                keep = 1.0 - dropout_rate
                mask = jax.random.bernoulli(rng, keep, (a.shape[0], 1))
                a = a * mask / keep
            delta = (a @ b) * scale
            kernel = p_node["kernel"]
            if kernel.ndim == 4:  # 1×1 conv
                delta = delta[None, None]
            new = dict(p_node)
            new["kernel"] = kernel + delta.astype(kernel.dtype)
            return new
        out = {}
        for k, v in p_node.items():
            sub_rng = None
            if rng is not None:
                # sha256-based stream hash (utils/rng.py) — builtin hash() of
                # str is salted per process (PYTHONHASHSEED), which would make
                # dropout masks irreproducible across runs/hosts.
                sub_rng = jax.random.fold_in(rng, _stream_hash(k))
            out[k] = walk(v, a_node.get(k) if isinstance(a_node, dict) else None,
                          sub_rng)
        return out

    return walk(params, adapter, dropout_rng)


def merge_lora(params: Any, adapter: Any, config: LoRAConfig,
               dropout_rng: jax.Array | None = None,
               train: bool = False) -> Any:
    """Merge with the config's α/r scale; dropout only when `train`."""
    return apply_lora_to_kernels(
        params, adapter, config.scale,
        dropout_rate=config.dropout if train else 0.0,
        dropout_rng=dropout_rng if train else None)


def lorarized_layers(adapter: Any) -> list[str]:
    """Sorted module paths carrying lora_A/lora_B factors — the
    get_lorarized_layers.py equivalent."""
    modules = set()
    for path, _ in _flatten(adapter):
        if path[-1] in ("lora_A", "lora_B"):
            modules.add(".".join(path[:-1]))
    return sorted(modules)


def count_lora_params(adapter: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(adapter))


def save_lora(path, adapter: Any) -> None:
    """Adapter-only checkpoint — the analogue of filtering state-dict keys on
    "lora_" (train_with_lora_per_class.py:30-35)."""
    save_pytree(path, adapter)


def load_lora(path, like: Any | None = None) -> Any:
    return load_pytree(path, like)
