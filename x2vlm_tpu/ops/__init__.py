from x2vlm_tpu.ops.attention import dot_product_attention, make_attention_mask
from x2vlm_tpu.ops.flash_attention import flash_attention
from x2vlm_tpu.ops.layers import LayerNorm, Mlp, DropPath, MultiHeadAttention, gelu_exact
from x2vlm_tpu.ops import box
