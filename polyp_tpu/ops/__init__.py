from polyp_tpu.ops.attention import dot_product_attention  # noqa: F401
from polyp_tpu.ops.groupnorm import group_norm  # noqa: F401
