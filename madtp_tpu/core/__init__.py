from madtp_tpu.core.config import (
    MedConfig,
    ViTConfig,
    CLIPConfig,
    load_yaml_config,
)
from madtp_tpu.core.tree import (
    cast_tree,
    flatten_tree,
    unflatten_tree,
    tree_size,
)
