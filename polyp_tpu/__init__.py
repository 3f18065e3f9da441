"""polyp_tpu — a TPU-native (JAX/XLA/Pallas) framework for diffusion-based
polyp image synthesis and imbalance-aware classification.

Re-implements, TPU-first, the capabilities of the reference
``nereaqing/Polyp-Image-Generator`` stack (see SURVEY.md): a polyp
classifier (EfficientNet-B0), a scratch-trained pixel-space DDPM, a
Stable-Diffusion-v1-4 latent LoRA/DreamBooth fine-tuning path, ``lax.scan``
DDPM/DDIM/UniPC samplers with Pallas-fused attention, and the closed-loop
generate → augment → retrain-classifier → F1 evaluation harness.

The compute path is pure JAX (jit/pjit/shard_map over a ``jax.sharding.Mesh``);
parameters are plain pytrees; adapters (LoRA) are separate pytrees applied by
parameter surgery.
"""

__version__ = "0.1.0"

from polyp_tpu.configs import ClassificationConfig, DiffusionConfig  # noqa: F401
