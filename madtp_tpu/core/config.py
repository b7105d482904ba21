"""Model/task configuration.

Mirrors the reference's configuration surface — BERT arch json
(reference ``configs/med_config.json``), task yamls (``configs/*.yaml``) and the
ViT base/large presets (``models/blip.py:228-247``) — as plain dataclasses.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """timm-style ViT used as the BLIP image encoder (reference ``models/vit.py:210-310``)."""

    image_size: int = 384
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    sd_dim: int = 768  # FDT codebook dim
    # stochastic depth at train time (reference create_vit drop_path_rate:
    # 0.1 for NLVR/VQA, 0 for caption/retrieval, models/blip.py:228-247)
    drop_path_rate: float = 0.0
    # rematerialize blocks in the backward pass (the reference's fairscale
    # checkpoint_wrapper, models/vit.py:119-121; configs ship it off:
    # vit_grad_ckpt False)
    grad_checkpoint: bool = False
    # reference yaml key vit_ckpt_layer (models/vit.py:255: blocks with
    # i >= depth - ckpt_layer are wrapped): remat only the LAST N blocks.
    # -1 = all blocks (this repo's memory-driven default); note the
    # reference quirk that vit_grad_ckpt=True + vit_ckpt_layer=0 remats
    # NOTHING — honored exactly.
    ckpt_layers: int = -1
    # DTP execution
    dtype: str = "float32"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def base(image_size: int = 384, **kw) -> "ViTConfig":
        return ViTConfig(image_size=image_size, embed_dim=768, depth=12, num_heads=12, **kw)

    @staticmethod
    def large(image_size: int = 384, **kw) -> "ViTConfig":
        return ViTConfig(image_size=image_size, embed_dim=1024, depth=24, num_heads=16, **kw)


@dataclasses.dataclass(frozen=True)
class MedConfig:
    """BERT-style mixture-of-encoder-decoder config (reference ``configs/med_config.json``)."""

    vocab_size: int = 30524
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    add_cross_attention: bool = True
    encoder_width: int = 768
    hidden_act: str = "gelu"
    # train-time dropout (reference configs/med_config.json: 0.1); active
    # only when a dropout rng is supplied to the forward
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    sd_dim: int = 768
    # NLVR twin-cross-attention variant (reference models/nlvr_encoder.py:274-282):
    # layers >= merge_start_layer concat the two cross-attn streams through a
    # merge Linear(2H -> H); earlier layers average them.
    twin_cross: bool = False
    merge_start_layer: int = 6
    dtype: str = "float32"

    @staticmethod
    def from_json(path: str, **overrides) -> "MedConfig":
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(MedConfig)}
        kw = {k: v for k, v in raw.items() if k in known}
        kw.update(overrides)
        return MedConfig(**kw)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """OpenAI-CLIP dual-tower config, normally inferred from a checkpoint's
    weight shapes (reference ``clip/model.py:678-701``)."""

    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    sd_dim: int = 768
    dtype: str = "float32"

    # 0 -> derive as vision_width // 64 (reference clip/model.py:361)
    vision_heads_override: int = 0

    # non-empty -> ModifiedResNet visual tower with these per-stage block
    # counts (reference clip/model.py:350-359; vision_width is then the RN
    # stem width, e.g. RN50 = (3,4,6,3) width 64).  RN towers run unpruned —
    # see models/clip_resnet.py docstring.
    resnet_layers: tuple = ()

    @property
    def is_resnet(self) -> bool:
        return bool(self.resnet_layers)

    @property
    def vision_heads(self) -> int:
        return self.vision_heads_override or max(1, self.vision_width // 64)

    @property
    def vision_num_patches(self) -> int:
        return (self.image_resolution // self.vision_patch_size) ** 2


@dataclasses.dataclass(frozen=True)
class DTPConfig:
    """Dynamic-token-pruning execution config.

    ``mode``:
      * ``"mask"``   — fixed-size token buffer + alive mask (exact reference
        semantics, zero recompiles; compute is not reduced).  Used for
        training and as the correctness reference.
      * ``"gather"`` — physically compacts to a static per-layer capacity
        schedule (``capacities``); the real eval-speed path.
    """

    mode: str = "mask"
    sd_num: int = 100
    sd_dim: int = 768
    # gather-mode static per-layer token capacities (incl. CLS + merge slot).
    capacities: Optional[Tuple[int, ...]] = None
    # round gather capacities up to this multiple (TPU lane alignment)
    capacity_multiple: int = 64


def load_yaml_config(path: str) -> dict:
    """Load a task yaml (same keys as the reference ``configs/*.yaml``)."""
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
