from madtp_tpu.ops.layers import (
    linear,
    layer_norm,
    gelu,
    quick_gelu,
    mlp,
    patch_embed,
)
from madtp_tpu.ops.attention import attention_core, AttnAux, NEG_INF
