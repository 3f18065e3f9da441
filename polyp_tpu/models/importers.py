"""Pretrained-weight importers: diffusers / transformers checkpoints → our
Flax pytrees.

The reference pulls SD-v1-4 parts from the HF hub at runtime
(train_with_lora_per_class.py:304-308). This environment has no network, so
importers are file-driven: point them at a local diffusers-layout directory
(`unet/diffusion_pytorch_model.safetensors`, `vae/...`,
`text_encoder/model.safetensors`, `tokenizer/{vocab.json,merges.txt}`) and
they translate names + layouts:

* conv weights: torch OIHW → flax HWIO;
* linear weights: [out,in] → kernel [in,out];
* norm weight/bias → scale/bias;
* diffusers `to_out.0` → our `to_out`; `ff.net.0.proj` → `ff_net_0_proj`;
  transformer/resnet/attention block paths → our flattened block names.

Every imported tree is validated leaf-by-leaf against the target module's
init shapes; missing or shape-mismatched keys raise with a readable report.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Callable, Iterable

import jax
import numpy as np


# ---------------------------------------------------------------------------
# low-level loading
# ---------------------------------------------------------------------------

def load_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Load a .safetensors or torch .bin state dict as numpy arrays."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file
        try:
            return load_file(path)
        except Exception:
            # bf16 tensors need the torch loader
            from safetensors.torch import load_file as load_torch
            return {k: v.float().numpy() for k, v in load_torch(path).items()}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def find_weights(model_dir: str | Path, stem: str) -> Path:
    """Locate `{stem}.safetensors` or `{stem}.bin` in a checkpoint dir."""
    model_dir = Path(model_dir)
    for suffix in (".safetensors", ".bin"):
        p = model_dir / f"{stem}{suffix}"
        if p.exists():
            return p
    raise FileNotFoundError(f"no {stem}.(safetensors|bin) in {model_dir}")


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)  # [out,in] → [in,out]


def t_id(w: np.ndarray) -> np.ndarray:
    return w


Rule = tuple[str, str, Callable[[np.ndarray], np.ndarray]]


def apply_rules(sd: dict[str, np.ndarray],
                rules: Iterable[Rule]) -> dict[str, np.ndarray]:
    """Rename every torch key via the first matching regex rule; values get
    the rule's transform. Unmatched keys are collected and reported."""
    out: dict[str, np.ndarray] = {}
    unmatched: list[str] = []
    compiled = [(re.compile(pat), repl, tf) for pat, repl, tf in rules]
    for key, val in sd.items():
        for pat, repl, tf in compiled:
            if pat.fullmatch(key):
                out[pat.sub(repl, key)] = tf(val)
                break
        else:
            unmatched.append(key)
    if unmatched:
        raise KeyError("unmapped checkpoint keys (first 10): "
                       + ", ".join(sorted(unmatched)[:10]))
    return out


def to_pytree(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def validate_against(tree: Any, reference: Any, path: str = "") -> list[str]:
    """Shape-compare an imported tree with a model's init tree."""
    problems: list[str] = []
    if isinstance(reference, dict):
        if not isinstance(tree, dict):
            return [f"{path}: expected subtree"]
        for k, ref_v in reference.items():
            if k not in tree:
                problems.append(f"missing {path}/{k}")
            else:
                problems += validate_against(tree[k], ref_v, f"{path}/{k}")
        for k in tree:
            if k not in reference:
                problems.append(f"unexpected {path}/{k}")
        return problems
    if tuple(np.shape(tree)) != tuple(np.shape(reference)):
        problems.append(f"{path}: shape {np.shape(tree)} != {np.shape(reference)}")
    return problems


def _finish(flat: dict[str, np.ndarray], like: Any | None, what: str) -> dict:
    tree = to_pytree(flat)
    if like is not None:
        problems = validate_against(tree, like)
        if problems:
            raise ValueError(f"{what} import mismatch ({len(problems)}): "
                             + "; ".join(problems[:10]))
        tree = jax.tree_util.tree_map(
            lambda imported, ref: np.asarray(imported, dtype=ref.dtype),
            tree, like)
    return tree


# ---------------------------------------------------------------------------
# norm / resnet / attention shared sub-rules
# ---------------------------------------------------------------------------

def _norm(src: str, dst: str) -> list[Rule]:
    return [(rf"{src}\.weight", rf"{dst}/scale", t_id),
            (rf"{src}\.bias", rf"{dst}/bias", t_id)]


def _conv(src: str, dst: str) -> list[Rule]:
    return [(rf"{src}\.weight", rf"{dst}/kernel", t_conv),
            (rf"{src}\.bias", rf"{dst}/bias", t_id)]


def _linear(src: str, dst: str) -> list[Rule]:
    return [(rf"{src}\.weight", rf"{dst}/kernel", t_linear),
            (rf"{src}\.bias", rf"{dst}/bias", t_id)]


def _resnet_rules(src: str, dst: str) -> list[Rule]:
    return (_norm(rf"{src}\.norm1", rf"{dst}/norm1")
            + _conv(rf"{src}\.conv1", rf"{dst}/conv1")
            + _linear(rf"{src}\.time_emb_proj", rf"{dst}/time_emb_proj")
            + _norm(rf"{src}\.norm2", rf"{dst}/norm2")
            + _conv(rf"{src}\.conv2", rf"{dst}/conv2")
            + _conv(rf"{src}\.conv_shortcut", rf"{dst}/conv_shortcut"))


def _transformer_rules(src: str, dst: str) -> list[Rule]:
    rules: list[Rule] = (_norm(rf"{src}\.norm", rf"{dst}/norm")
                         + _conv(rf"{src}\.proj_in", rf"{dst}/proj_in")
                         + _conv(rf"{src}\.proj_out", rf"{dst}/proj_out"))
    blk = rf"{src}\.transformer_blocks\.(\d+)"
    # the transformer-block index is the group AFTER any groups in `src`
    blk_group = re.compile(src).groups + 1
    dblk = rf"{dst}/transformer_blocks_\{blk_group}"
    for attn in ("attn1", "attn2"):
        rules += [
            (rf"{blk}\.{attn}\.to_q\.weight", rf"{dblk}/{attn}/to_q/kernel", t_linear),
            (rf"{blk}\.{attn}\.to_k\.weight", rf"{dblk}/{attn}/to_k/kernel", t_linear),
            (rf"{blk}\.{attn}\.to_v\.weight", rf"{dblk}/{attn}/to_v/kernel", t_linear),
            (rf"{blk}\.{attn}\.to_out\.0\.weight", rf"{dblk}/{attn}/to_out/kernel", t_linear),
            (rf"{blk}\.{attn}\.to_out\.0\.bias", rf"{dblk}/{attn}/to_out/bias", t_id),
        ]
    rules += _linear(rf"{blk}\.ff\.net\.0\.proj", rf"{dblk}/ff/ff_net_0_proj")
    rules += _linear(rf"{blk}\.ff\.net\.2", rf"{dblk}/ff/ff_net_2")
    for i in (1, 2, 3):
        rules += _norm(rf"{blk}\.norm{i}", rf"{dblk}/norm{i}")
    return rules


def _vae_attention_rules(src: str, dst: str) -> list[Rule]:
    """diffusers ≥0.18 VAE attention (group_norm + to_q/to_k/to_v/to_out.0)
    and the legacy (query/key/value/proj_attn) naming. VAE attention carries
    q/k/v biases (our SpatialSelfAttention uses qkv_bias=True there)."""
    rules = _norm(rf"{src}\.group_norm", rf"{dst}/group_norm")
    for new, old, ours in (("to_q", "query", "to_q"), ("to_k", "key", "to_k"),
                           ("to_v", "value", "to_v")):
        rules += _linear(rf"{src}\.{new}", rf"{dst}/attention/{ours}")
        rules += _linear(rf"{src}\.{old}", rf"{dst}/attention/{ours}")
    rules += [(rf"{src}\.to_out\.0\.weight", rf"{dst}/attention/to_out/kernel", t_linear),
              (rf"{src}\.to_out\.0\.bias", rf"{dst}/attention/to_out/bias", t_id),
              (rf"{src}\.proj_attn\.weight", rf"{dst}/attention/to_out/kernel", t_linear),
              (rf"{src}\.proj_attn\.bias", rf"{dst}/attention/to_out/bias", t_id)]
    return rules


# ---------------------------------------------------------------------------
# SD UNet
# ---------------------------------------------------------------------------

def unet_condition_rules() -> list[Rule]:
    rules: list[Rule] = []
    rules += _conv(r"conv_in", "conv_in")
    rules += _linear(r"time_embedding\.linear_1", "time_embedding/linear_1")
    rules += _linear(r"time_embedding\.linear_2", "time_embedding/linear_2")
    rules += _resnet_rules(r"down_blocks\.(\d+)\.resnets\.(\d+)", r"down_\1_res_\2")
    rules += _transformer_rules(r"down_blocks\.(\d+)\.attentions\.(\d+)",
                                r"down_\1_attn_\2")
    rules += _conv(r"down_blocks\.(\d+)\.downsamplers\.0\.conv",
                   r"down_\1_downsample/conv")
    rules += _resnet_rules(r"mid_block\.resnets\.0", "mid_res_0")
    rules += _resnet_rules(r"mid_block\.resnets\.1", "mid_res_1")
    rules += _transformer_rules(r"mid_block\.attentions\.0", "mid_attn")
    rules += _resnet_rules(r"up_blocks\.(\d+)\.resnets\.(\d+)", r"up_\1_res_\2")
    rules += _transformer_rules(r"up_blocks\.(\d+)\.attentions\.(\d+)",
                                r"up_\1_attn_\2")
    rules += _conv(r"up_blocks\.(\d+)\.upsamplers\.0\.conv", r"up_\1_upsample/conv")
    rules += _norm(r"conv_norm_out", "conv_norm_out")
    rules += _conv(r"conv_out", "conv_out")
    return rules


def import_unet_condition(weights_path: str | Path,
                          like: Any | None = None) -> dict:
    sd = load_state_dict(weights_path)
    return _finish(apply_rules(sd, unet_condition_rules()), like, "unet")


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def vae_rules() -> list[Rule]:
    rules: list[Rule] = []
    for side, blocks, n_res in (("encoder", "down_blocks", 2),
                                ("decoder", "up_blocks", 3)):
        rules += _conv(rf"{side}\.conv_in", rf"{side}/conv_in")
        rules += _resnet_rules(rf"{side}\.{blocks}\.(\d+)\.resnets\.(\d+)",
                               rf"{side}/" + ("down" if side == "encoder" else "up")
                               + r"_\1_res_\2")
        rules += _resnet_rules(rf"{side}\.mid_block\.resnets\.0",
                               rf"{side}/mid_res_0")
        rules += _resnet_rules(rf"{side}\.mid_block\.resnets\.1",
                               rf"{side}/mid_res_1")
        rules += _vae_attention_rules(rf"{side}\.mid_block\.attentions\.0",
                                      rf"{side}/mid_attn")
        rules += _norm(rf"{side}\.conv_norm_out", rf"{side}/conv_norm_out")
        rules += _conv(rf"{side}\.conv_out", rf"{side}/conv_out")
    rules += _conv(r"encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv",
                   r"encoder/down_\1_downsample/conv")
    rules += _conv(r"decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv",
                   r"decoder/up_\1_upsample/conv")
    rules += _conv(r"quant_conv", "quant_conv")
    rules += _conv(r"post_quant_conv", "post_quant_conv")
    return rules


def import_vae(weights_path: str | Path, like: Any | None = None) -> dict:
    sd = load_state_dict(weights_path)
    flat = apply_rules(sd, vae_rules())
    return _finish(flat, like, "vae")


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def clip_text_rules() -> list[Rule]:
    rules: list[Rule] = [
        (r"text_model\.embeddings\.token_embedding\.weight", "token_embedding", t_id),
        (r"text_model\.embeddings\.position_embedding\.weight",
         "position_embedding", t_id),
        # non-layer extras present in some checkpoints
        (r"text_model\.embeddings\.position_ids", "__drop", t_id),
        (r"text_projection\.weight", "__drop", t_id),
    ]
    layer = r"text_model\.encoder\.layers\.(\d+)"
    dlayer = r"layer_\1"
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        rules += _linear(rf"{layer}\.self_attn\.{proj}",
                         rf"{dlayer}/self_attn/{proj}")
    rules += _norm(rf"{layer}\.layer_norm1", rf"{dlayer}/layer_norm1")
    rules += _norm(rf"{layer}\.layer_norm2", rf"{dlayer}/layer_norm2")
    rules += _linear(rf"{layer}\.mlp\.fc1", rf"{dlayer}/fc1")
    rules += _linear(rf"{layer}\.mlp\.fc2", rf"{dlayer}/fc2")
    rules += _norm(r"text_model\.final_layer_norm", "final_layer_norm")
    return rules


def import_clip_text(weights_path: str | Path, like: Any | None = None) -> dict:
    sd = load_state_dict(weights_path)
    flat = apply_rules(sd, clip_text_rules())
    flat = {k: v for k, v in flat.items() if not k.startswith("__drop")}
    return _finish(flat, like, "clip_text")


# ---------------------------------------------------------------------------
# whole-pipeline loader (diffusers directory layout)
# ---------------------------------------------------------------------------

def load_sd_checkpoint(model_dir: str | Path, unet_like=None, vae_like=None,
                       text_like=None) -> dict[str, Any]:
    """Import unet/vae/text_encoder from a local SD-v1-4 diffusers layout
    (the `save_pretrained` format the reference logs to mlflow,
    train_with_lora_per_class.py:190-193)."""
    model_dir = Path(model_dir)
    return {
        "unet": import_unet_condition(
            find_weights(model_dir / "unet", "diffusion_pytorch_model"),
            unet_like),
        "vae": import_vae(
            find_weights(model_dir / "vae", "diffusion_pytorch_model"),
            vae_like),
        "text": import_clip_text(
            find_weights(model_dir / "text_encoder", "model"), text_like),
    }
