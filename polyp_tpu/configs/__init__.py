from polyp_tpu.configs.base import (  # noqa: F401
    ClassificationConfig,
    DiffusionConfig,
    LORA_MODULE_PRESETS,
    apply_cli_overrides,
    add_config_flags,
)
