from polyp_tpu.diffusion.schedule import DiffusionSchedule  # noqa: F401
from polyp_tpu.diffusion.losses import epsilon_mse_loss  # noqa: F401
from polyp_tpu.diffusion.samplers import (  # noqa: F401
    ddpm_sample,
    ddim_sample,
    unipc_sample,
    sample,
    sampler_timesteps,
    with_cfg,
)
