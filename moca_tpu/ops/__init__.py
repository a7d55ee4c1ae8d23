from moca_tpu.ops.attention import dot_product_attention  # noqa: F401
from moca_tpu.ops.norms import GroupNorm32  # noqa: F401
