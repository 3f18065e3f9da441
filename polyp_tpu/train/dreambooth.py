"""DreamBooth token machinery as pytree surgery.

Reference flow (train_with_lora_per_class.py:361-398): add a special token
(sks/zbt/mjt), resize the embedding table, initialize the new row as
0.5·mean(class-phrase embeddings) + 0.5·embedding("polyp"), then register a
gradient hook that masks every embedding row except the special one.

JAX analogue: the special row becomes a *separate trainable parameter*; the
effective table is rebuilt functionally each step
(`embed_with_special_rows`), so only that row receives gradients — no hooks,
no in-place mutation, jit-safe by construction.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# The reference's class-token map (train_with_lora_per_class.py:229-234)
SPECIAL_TOKENS = {"AD": "sks", "HP": "zbt", "ASS": "mjt", "REST": "zbt"}
CLASS_PHRASES = {
    "AD": "adenomatous",
    "HP": "hyperplastic",
    "ASS": "sessile serrated",
    "REST": "hyperplastic and sessile serrated",
}


def resize_token_embeddings(text_params: Any, new_vocab_size: int,
                            rng: jax.Array) -> Any:
    """Grow the token embedding table to `new_vocab_size` rows (new rows
    normal-init) — `resize_token_embeddings` parity."""
    table = text_params["token_embedding"]
    old, width = table.shape
    if new_vocab_size <= old:
        return text_params
    extra = jax.random.normal(rng, (new_vocab_size - old, width),
                              table.dtype) * 0.02
    out = dict(text_params)
    out["token_embedding"] = jnp.concatenate([table, extra], axis=0)
    return out


def dreambooth_token_init(text_params: Any, tokenizer, cls: str,
                          weight_token_class: float = 0.5,
                          weight_token_polyp: float = 0.5,
                          class_condition: bool = False) -> jax.Array:
    """Initial embedding for the class's special token:
    w_class·mean(class-phrase token embeddings) + w_polyp·embedding("polyp")
    (train_with_lora_per_class.py:367-387)."""
    table = text_params["token_embedding"]
    polyp_id = tokenizer.convert_tokens_to_ids("polyp")
    polyp_emb = table[polyp_id]
    phrase = cls if class_condition else CLASS_PHRASES[cls]
    token_ids = np.asarray(tokenizer.convert_tokens_to_ids(
        tokenizer.tokenize(phrase)))
    class_avg = jnp.mean(table[token_ids], axis=0)
    return weight_token_class * class_avg + weight_token_polyp * polyp_emb


def embed_with_special_rows(text_params: Any, special_rows: jax.Array,
                            special_ids: jax.Array) -> Any:
    """Effective text params with trainable rows scattered into the (frozen)
    table — gradients flow only into `special_rows`."""
    table = jax.lax.stop_gradient(text_params["token_embedding"])
    table = table.at[special_ids].set(special_rows.astype(table.dtype))
    out = dict(text_params)
    out["token_embedding"] = table
    return out


def dreambooth_prompt(cls: str, unconditional: bool, class_condition: bool,
                      dreambooth: bool) -> str:
    """The prompt-selection matrix (train_with_lora_per_class.py:442-459)."""
    if unconditional:
        return ""
    special = SPECIAL_TOKENS[cls]
    phrase = CLASS_PHRASES[cls]
    if class_condition:
        # reference overwrites the dreambooth variant with bare cls (:448-449)
        return f"{cls}"
    if dreambooth:
        return f"a high-resolution endoscopic image of {special} {phrase} polyp"
    return f"a high-resolution endoscopic image of {phrase} polyp"


def resume_prompt(cls: str, unconditional: bool) -> str:
    """Prompt used on the resume/top-up branch
    (train_with_lora_per_class.py:255-260)."""
    if unconditional:
        return ""
    special = SPECIAL_TOKENS[cls]
    phrase = CLASS_PHRASES[cls]
    return (f"a realistic high-resolution medical endoscopy image of "
            f"{special} {phrase} polyp")
