from polyp_tpu.models.efficientnet import (  # noqa: F401
    EfficientNet,
    PolypClassifier,
    efficientnet_b0,
)
from polyp_tpu.models.unet2d import UNet2D, polyp_scratch_unet  # noqa: F401
from polyp_tpu.models.unet_condition import (  # noqa: F401
    UNet2DCondition,
    sd14_unet,
    tiny_condition_unet,
)
from polyp_tpu.models.vae import AutoencoderKL, DiagonalGaussian, tiny_vae, SD_VAE_SCALING  # noqa: F401
from polyp_tpu.models.clip_text import (  # noqa: F401
    CLIPTextModel,
    CLIPTextConfig,
    SD14_TEXT_CONFIG,
    VIT_B32_TEXT_CONFIG,
    TINY_TEXT_CONFIG,
)
from polyp_tpu.models.clip_tokenizer import (  # noqa: F401
    CLIPBPETokenizer,
    HashTokenizer,
    load_tokenizer,
)
