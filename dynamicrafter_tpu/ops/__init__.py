from dynamicrafter_tpu.ops.norms import GroupNorm
from dynamicrafter_tpu.ops.attention import dot_product_attention
