from madtp_tpu.ckpt.torch_reader import load_state_dict
from madtp_tpu.ckpt.remap import (
    remap_vit,
    remap_med,
    remap_clip,
    interpolate_pos_embed,
)
