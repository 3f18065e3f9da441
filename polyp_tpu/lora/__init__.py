from polyp_tpu.lora.surgery import (  # noqa: F401
    LoRAConfig,
    init_lora,
    merge_lora,
    apply_lora_to_kernels,
    lorarized_layers,
    count_lora_params,
    save_lora,
    load_lora,
)
from polyp_tpu.lora.partition import path_mask, trainable_count  # noqa: F401
