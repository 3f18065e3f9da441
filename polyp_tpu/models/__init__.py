from polyp_tpu.models.efficientnet import (  # noqa: F401
    EfficientNet,
    PolypClassifier,
    efficientnet_b0,
)
