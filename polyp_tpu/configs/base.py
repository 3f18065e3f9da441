"""Typed configuration tree with CLI overrides and named presets.

Replaces the reference's pair of mutable dataclasses + per-script argparse
(reference: generator_model/config_diffusion.py:4-37,
generator_model/config_classification.py:4-18) with frozen dataclasses,
explicit derived-field computation (`with_schedule`) instead of in-place
mutation, and named LoRA-target presets replacing the comment blocks at
config_diffusion.py:34-37.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field, fields, replace
from datetime import datetime
from typing import Any


# Named presets for LoRA target modules. The reference keeps these as
# commented-out alternatives (config_diffusion.py:34-37); here they are
# first-class. Names refer to sub-modules of attention / transformer blocks
# in polyp_tpu.models.unet_condition.
LORA_MODULE_PRESETS: dict[str, tuple[str, ...]] = {
    "attention": ("to_q", "to_k", "to_v", "to_out"),
    "attention_added_kv": ("to_q", "to_k", "to_v", "to_out", "add_k_proj", "add_v_proj"),
    "attention_mlp": (
        "to_q", "to_k", "to_v", "to_out",
        "proj_in", "proj_out", "ff_net_0_proj", "ff_net_2",
    ),
    "attention_mlp_time": (
        "to_q", "to_k", "to_v", "to_out",
        "proj_in", "proj_out", "ff_net_0_proj", "ff_net_2", "time_emb_proj",
    ),
    "text_encoder": ("q_proj", "k_proj", "v_proj", "out_proj"),
}


def _timestamp() -> str:
    return datetime.now().strftime("%Y%m%d_%H%M%S")


@dataclass(frozen=True)
class DiffusionConfig:
    """Diffusion training/sampling config.

    Mirrors the reference `TrainingConfig` (config_diffusion.py:4-37) field
    for field, with TPU-native replacements: bf16 instead of fp16+GradScaler
    (loss scaling is unnecessary in bf16), and warmup expressed as a fraction
    (train_with_lora_per_class.py:329-332 computes 3% dynamically).
    """

    image_size: int = 224
    train_batch_size: int = 8
    accumulation_steps: int = 1
    eval_batch_size: int = 20
    num_epochs: int = 200
    learning_rate: float = 1e-4
    mixed_precision: str = "bf16"  # "bf16" | "fp32"
    seed: int = 0
    device_count: int = 1  # data-parallel chips; 1 = single chip

    # Diffusion process
    num_train_timesteps: int = 1000
    beta_schedule: str = "linear"  # matches diffusers DDPMScheduler default
    prediction_type: str = "epsilon"

    # Sampling
    num_inference_steps: int = 25
    guidance_scale: float = 7.5
    sampler: str = "unipc"  # "ddpm" | "ddim" | "unipc"
    quantize: str | None = None  # "w8a8" UNet sampling (ops/quant.py); TPU extra
    # Hybrid-precision trajectory (pipeline._precision_split): run the
    # first / final N inference steps full precision while the middle uses
    # the quantized UNet. A small fp HEAD makes the quantized run track the
    # bf16 trajectory almost exactly (early evals set the trajectory on a
    # deterministic sampler); 0/0 = the pure quantized mode.
    quant_fp_head: int = 0
    quant_fp_tail: int = 0
    # provenance marker: True when `quantize` was the "promoted" alias —
    # lets few-step consumers (cli/distill_sd.load_student_sampler)
    # re-resolve to the DISTILLED verdict (pure int8, no fp head) instead
    # of carrying the full-trajectory fp_head onto a 4–8-step grid where
    # _precision_split would silently drop quantization entirely.
    quant_promoted: bool = False

    def __post_init__(self):
        # quantize="promoted" expands to the gate-passing config recorded
        # in package data (ops/quant.py::promoted_config — the measured
        # tools/quant_sensitivity.py verdict), so EVERY entry point that
        # builds a DiffusionConfig understands it uniformly. Explicit
        # modes pass through untouched; raises if nothing passes the gate.
        # This expansion is the FULL-TRAJECTORY (25/50-step) verdict;
        # surfaces that know they are few-step resolve
        # `resolve_quantize_arg(..., distilled=True)` themselves (serve,
        # bench_serve) or re-resolve via `quant_promoted` (distill_sd).
        if self.quantize == "promoted":
            from polyp_tpu.ops.quant import resolve_quantize_arg
            mode, head, tail = resolve_quantize_arg(
                "promoted", self.quant_fp_head, self.quant_fp_tail)
            object.__setattr__(self, "quantize", mode)
            object.__setattr__(self, "quant_fp_head", head)
            object.__setattr__(self, "quant_fp_tail", tail)
            object.__setattr__(self, "quant_promoted", True)

    # LoRA
    lora_rank: int = 8
    lora_alpha: float | None = None  # None → = lora_rank (reference parity)
    lora_dropout: float = 0.3
    lora_preset: str = "attention"

    # Aux-loss weights (train_with_lora_per_class.py:142-147, 361-398)
    weight_img: float = 1.0
    weight_text: float = 0.1
    weight_token_class: float = 0.5
    weight_token_polyp: float = 0.5

    # Derived schedule fields; computed via `with_schedule`, never mutated.
    total_train_steps: int = 0
    lr_warmup_steps: int = 0
    lr_warmup_frac: float = 0.03

    output_dir: str = field(default_factory=lambda: f"runs/diffusion_{_timestamp()}")
    experiment_name: str = "baseline_with_lora"

    @property
    def modules_lora(self) -> tuple[str, ...]:
        return LORA_MODULE_PRESETS[self.lora_preset]

    @property
    def effective_lora_alpha(self) -> float:
        return self.lora_rank if self.lora_alpha is None else self.lora_alpha

    def with_schedule(self, steps_per_epoch: int) -> "DiffusionConfig":
        """Derive the LR schedule lengths (warmup = lr_warmup_frac of total),
        the functional analogue of the in-place mutation at
        train_with_lora_per_class.py:329-332.

        With gradient accumulation (train_with_lora_all_classes.py:121-176)
        the horizon counts EFFECTIVE optimizer updates, not micro-steps:
        optax.MultiSteps advances the inner cosine schedule once per
        accumulated update, so a micro-step horizon would leave the
        schedule 1/N of the way through at the end of training
        (tests/test_accumulation.py)."""
        total = max(1, (steps_per_epoch * self.num_epochs)
                    // max(1, self.accumulation_steps))
        return replace(
            self,
            total_train_steps=total,
            lr_warmup_steps=int(self.lr_warmup_frac * total),
        )


@dataclass(frozen=True)
class ClassificationConfig:
    """Classifier config; mirrors `ConfigClassification`
    (config_classification.py:4-18) plus the argparse flags of
    classifier.py:298-309."""

    image_size: int = 224
    batch_size: int = 16
    num_epochs: int = 100
    patience: int = 10  # early stopping (classifier.py:197-199)
    learning_rate: float = 1e-3
    weight_decay: float = 1e-3
    hidden_features: int = 256
    dropout: float = 0.5
    # EfficientNet family b0..b7 (models/efficientnet.py VARIANTS; the
    # reference pins b0, PolypClassificationModel.py:8) + "tiny" for smoke
    variant: str = "b0"
    seed: int = 0

    weighted_sampling: bool = True
    weighted_loss: bool = False
    one_vs_rest: bool = False
    pretrained_backbone: bool = True  # HF/torchvision weight import if available

    mixed_precision: str = "bf16"
    device_count: int = 1

    output_dir: str = field(default_factory=lambda: f"runs/classifier_{_timestamp()}")
    experiment_name: str = "baseline_classification_model"


_CONFIG_TYPES = (DiffusionConfig, ClassificationConfig)


def add_config_flags(parser: argparse.ArgumentParser, config: Any) -> None:
    """Register one `--name` flag per (overridable) config field."""
    for f in fields(config):
        if f.name in ("output_dir", "experiment_name"):
            default = getattr(config, f.name)
        else:
            default = None  # None ⇒ keep dataclass default
        ftype = f.type if isinstance(f.type, type) else None
        name = "--" + f.name
        current = getattr(config, f.name)
        if isinstance(current, bool):
            parser.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=None)
        elif isinstance(current, int):
            parser.add_argument(name, type=int, default=None)
        elif isinstance(current, float):
            parser.add_argument(name, type=float, default=None)
        else:
            parser.add_argument(name, type=str, default=default if ftype is str else None)


def apply_cli_overrides(config: Any, args: argparse.Namespace) -> Any:
    """Return a copy of `config` with any non-None parsed flags applied."""
    known = {f.name for f in fields(config)}
    overrides = {
        k: v for k, v in vars(args).items()
        if k in known and v is not None
    }
    return replace(config, **overrides) if overrides else config


def config_as_params(config: Any) -> dict[str, Any]:
    """Flatten a config dataclass into a tracker-loggable param dict."""
    return {f.name: getattr(config, f.name) for f in dataclasses.fields(config)}
