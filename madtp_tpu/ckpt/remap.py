"""Torch state_dict -> madtp_tpu param trees.

Covers the reference's checkpoint-compatibility behaviors:

* linear kernels transposed to [in, out]; conv stems flattened to matmul
  kernels (flatten order (c, kh, kw) so the conv is reproduced exactly);
* per-layer weights stacked along a leading axis for ``lax.scan``;
* position-embedding bicubic resize on image-size mismatch
  (reference ``models/vit.py:398-422``);
* NLVR cross-attention key duplication self->self0/self1, dense->dense0/dense1
  (reference ``models/blip_nlvr.py:146-156``);
* shape-mismatch keys dropped with a warning
  (reference ``models/blip.py:272-275``).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def _t(w):
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _f32(w):
    return np.asarray(w, np.float32)


def _lin(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": _f32(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"scale": _f32(sd[f"{prefix}.weight"]), "bias": _f32(sd[f"{prefix}.bias"])}


def _stack(trees: List[dict]) -> dict:
    out = {}
    for k in trees[0]:
        if isinstance(trees[0][k], dict):
            out[k] = _stack([t[k] for t in trees])
        else:
            out[k] = np.stack([t[k] for t in trees], axis=0)
    return out


def interpolate_pos_embed(
    pos_embed: np.ndarray, num_patches: int, num_extra: int = 1
) -> np.ndarray:
    """Bicubic grid resize of ViT position embeddings
    (reference models/vit.py:398-422).  pos_embed: [1, N_old, D]."""
    import jax
    import jax.numpy as jnp

    orig = int(round((pos_embed.shape[1] - num_extra) ** 0.5))
    new = int(round(num_patches ** 0.5))
    if orig == new:
        return pos_embed
    extra = pos_embed[:, :num_extra]
    grid = pos_embed[:, num_extra:].reshape(1, orig, orig, -1)
    resized = jax.image.resize(
        jnp.asarray(grid), (1, new, new, grid.shape[-1]), method="bicubic"
    )
    resized = np.asarray(resized).reshape(1, new * new, -1)
    return np.concatenate([extra, resized], axis=1).astype(pos_embed.dtype)


def remap_vit(
    sd: Dict[str, np.ndarray], prefix: str = "visual_encoder.",
    num_patches: Optional[int] = None,
) -> dict:
    """BLIP ViT weights (timm layout, reference models/vit.py)."""
    g = lambda k: sd[prefix + k]
    depth = 1 + max(
        int(k[len(prefix) + 7 :].split(".")[0])
        for k in sd if k.startswith(prefix + "blocks.")
    )
    pw = _f32(g("patch_embed.proj.weight"))  # [D, 3, p, p]
    D = pw.shape[0]
    pos = _f32(g("pos_embed"))
    if num_patches is not None:
        pos = interpolate_pos_embed(pos, num_patches)
    blocks = []
    for i in range(depth):
        b = f"blocks.{i}."
        blocks.append({
            "norm1": _ln(sd, prefix + b + "norm1"),
            "attn": {
                "qkv": _lin(sd, prefix + b + "attn.qkv"),
                "proj": _lin(sd, prefix + b + "attn.proj"),
            },
            "norm2": _ln(sd, prefix + b + "norm2"),
            "mlp": {
                "fc1": _lin(sd, prefix + b + "mlp.fc1"),
                "fc2": _lin(sd, prefix + b + "mlp.fc2"),
            },
        })
    return {
        "cls_token": _f32(g("cls_token")),
        "pos_embed": pos,
        "patch_embed": {
            "kernel": _t(pw.reshape(D, -1)),
            "bias": _f32(g("patch_embed.proj.bias")),
        },
        "blocks": _stack(blocks),
        "norm": _ln(sd, prefix + "norm"),
    }


def remap_med(
    sd: Dict[str, np.ndarray], prefix: str = "text_encoder.",
    *, twin_cross: bool = False, has_lm_head: bool = False,
    lm_prefix: Optional[str] = None,
) -> dict:
    """MED BertModel / BertLMHeadModel weights (reference models/med.py,
    models/nlvr_encoder.py).  ``lm_prefix`` e.g. ``text_decoder.`` maps a
    BertLMHeadModel whose bert. submodule carries the encoder weights."""
    bert = prefix + ("bert." if has_lm_head else "")
    g = lambda k: sd[bert + k]
    depth = 1 + max(
        int(k[len(bert) + 14 :].split(".")[0])
        for k in sd if k.startswith(bert + "encoder.layer.")
    )

    def cross(b):
        cb = bert + b + "crossattention."
        if twin_cross:
            def dup(key):
                # checkpoint may carry either self/dense (pretrained base,
                # duplicated at load like reference models/blip_nlvr.py:146-156)
                # or self0/self1 (compressed checkpoints)
                return key if (cb + key + ".weight") in sd else None

            def pick(twin_key, base_key):
                k = cb + twin_key
                if (k + ".weight") in sd:
                    return _lin(sd, k)
                return _lin(sd, cb + base_key)

            out = {
                "self0": {
                    "query": pick("self0.query", "self.query"),
                    "key": pick("self0.key", "self.key"),
                    "value": pick("self0.value", "self.value"),
                },
                "self1": {
                    "query": pick("self1.query", "self.query"),
                    "key": pick("self1.key", "self.key"),
                    "value": pick("self1.value", "self.value"),
                },
                "output": {
                    "dense0": pick("output.dense0", "output.dense"),
                    "dense1": pick("output.dense1", "output.dense"),
                    "LayerNorm": _ln(sd, cb + "output.LayerNorm"),
                },
            }
            mk = cb + "output.merge_layer"
            if (mk + ".weight") in sd:
                out["output"]["merge_layer"] = _lin(sd, mk)
            else:
                H = out["output"]["dense0"]["kernel"].shape[1]
                out["output"]["merge_layer"] = {
                    "kernel": np.zeros((2 * H, H), np.float32),
                    "bias": np.zeros((H,), np.float32),
                }
            return out
        return {
            "self": {
                "query": _lin(sd, cb + "self.query"),
                "key": _lin(sd, cb + "self.key"),
                "value": _lin(sd, cb + "self.value"),
            },
            "output": {
                "dense": _lin(sd, cb + "output.dense"),
                "LayerNorm": _ln(sd, cb + "output.LayerNorm"),
            },
        }

    layers = []
    has_cross = any(".crossattention." in k for k in sd if k.startswith(bert))
    for i in range(depth):
        b = f"encoder.layer.{i}."
        layer = {
            "attention": {
                "self": {
                    "query": _lin(sd, bert + b + "attention.self.query"),
                    "key": _lin(sd, bert + b + "attention.self.key"),
                    "value": _lin(sd, bert + b + "attention.self.value"),
                },
                "output": {
                    "dense": _lin(sd, bert + b + "attention.output.dense"),
                    "LayerNorm": _ln(sd, bert + b + "attention.output.LayerNorm"),
                },
            },
            "intermediate": {"dense": _lin(sd, bert + b + "intermediate.dense")},
            "output": {
                "dense": _lin(sd, bert + b + "output.dense"),
                "LayerNorm": _ln(sd, bert + b + "output.LayerNorm"),
            },
        }
        if has_cross:
            layer["crossattention"] = cross(b)
        layers.append(layer)

    out = {
        "embeddings": {
            "word_embeddings": _f32(g("embeddings.word_embeddings.weight")),
            "position_embeddings": _f32(g("embeddings.position_embeddings.weight")),
            "LayerNorm": _ln(sd, bert + "embeddings.LayerNorm"),
        },
        "layers": _stack(layers),
    }
    if bert + "pooler.dense.weight" in sd:
        out["pooler"] = {"dense": _lin(sd, bert + "pooler.dense")}
    if has_lm_head:
        cp = prefix + "cls.predictions."
        out["cls"] = {
            "transform": {
                "dense": _lin(sd, cp + "transform.dense"),
                "LayerNorm": _ln(sd, cp + "transform.LayerNorm"),
            },
            "bias": _f32(sd[cp + "bias"]),
        }
    return out


def _remap_resnet_visual(sd: Dict[str, np.ndarray]) -> dict:
    """ModifiedResNet visual keys -> models/clip_resnet.py tree (reference
    clip/model.py:97-156; conv kernels stay in torch OIHW layout)."""

    def bn(prefix):
        return {"scale": _f32(sd[prefix + ".weight"]),
                "bias": _f32(sd[prefix + ".bias"]),
                "mean": _f32(sd[prefix + ".running_mean"]),
                "var": _f32(sd[prefix + ".running_var"])}

    out = {"stem": {
        "conv1": _f32(sd["visual.conv1.weight"]), "bn1": bn("visual.bn1"),
        "conv2": _f32(sd["visual.conv2.weight"]), "bn2": bn("visual.bn2"),
        "conv3": _f32(sd["visual.conv3.weight"]), "bn3": bn("visual.bn3"),
    }}
    for li in range(1, 5):
        n_blocks = len({k.split(".")[2] for k in sd
                        if k.startswith(f"visual.layer{li}.")})
        blocks = []
        for bi in range(n_blocks):
            b = f"visual.layer{li}.{bi}."
            bp = {"conv1": _f32(sd[b + "conv1.weight"]), "bn1": bn(b + "bn1"),
                  "conv2": _f32(sd[b + "conv2.weight"]), "bn2": bn(b + "bn2"),
                  "conv3": _f32(sd[b + "conv3.weight"]), "bn3": bn(b + "bn3")}
            if (b + "downsample.0.weight") in sd:
                bp["downsample"] = {"conv": _f32(sd[b + "downsample.0.weight"]),
                                    "bn": bn(b + "downsample.1")}
            blocks.append(bp)
        out[f"layer{li}"] = blocks
    out["attnpool"] = {
        "positional_embedding": _f32(sd["visual.attnpool.positional_embedding"]),
        "q_proj": _lin(sd, "visual.attnpool.q_proj"),
        "k_proj": _lin(sd, "visual.attnpool.k_proj"),
        "v_proj": _lin(sd, "visual.attnpool.v_proj"),
        "c_proj": _lin(sd, "visual.attnpool.c_proj"),
    }
    return out


def remap_clip(sd: Dict[str, np.ndarray]) -> dict:
    """OpenAI-CLIP weights incl. per-block MAG q_map
    (reference clip/model.py:678-716 build_model key layout).  fp16 weights
    are upcast to fp32 like the reference load path (clip/clip.py:148)."""

    def blocks(prefix, depth):
        out = []
        for i in range(depth):
            b = f"{prefix}.resblocks.{i}."
            blk = {
                "ln_1": _ln(sd, b + "ln_1"),
                "attn": {
                    "in_proj": {
                        "kernel": _t(sd[b + "attn.in_proj_weight"]),
                        "bias": _f32(sd[b + "attn.in_proj_bias"]),
                    },
                    "out_proj": _lin(sd, b + "attn.out_proj"),
                },
                "ln_2": _ln(sd, b + "ln_2"),
                "mlp": {
                    "c_fc": _lin(sd, b + "mlp.c_fc"),
                    "c_proj": _lin(sd, b + "mlp.c_proj"),
                },
            }
            qk = b + "query_model.q_map.0"
            if (qk + ".weight") in sd:
                blk["query_model"] = {"q_map": _lin(sd, qk)}
            else:
                D = blk["ln_1"]["scale"].shape[0]
                blk["query_model"] = {"q_map": {
                    "kernel": np.zeros((D, 768), np.float32),
                    "bias": np.zeros((768,), np.float32),
                }}
            out.append(blk)
        return _stack(out)

    t_depth = len({k.split(".")[2] for k in sd
                   if k.startswith("transformer.resblocks")})
    if "visual.proj" in sd:  # ViT visual (reference build_model:679)
        v_depth = len({k.split(".")[3] for k in sd
                       if k.startswith("visual.transformer.resblocks")})
        conv = _f32(sd["visual.conv1.weight"])  # [W,3,p,p]
        W = conv.shape[0]
        visual = {
            "conv1": {"kernel": _t(conv.reshape(W, -1))},
            "class_embedding": _f32(sd["visual.class_embedding"]),
            "positional_embedding": _f32(sd["visual.positional_embedding"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "blocks": blocks("visual.transformer", v_depth),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": _f32(sd["visual.proj"]),
        }
    else:  # ModifiedResNet visual (reference build_model:687-694)
        visual = _remap_resnet_visual(sd)
    return {
        "visual": visual,
        "token_embedding": _f32(sd["token_embedding.weight"]),
        "positional_embedding": _f32(sd["positional_embedding"]),
        "blocks": blocks("transformer", t_depth),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _f32(sd["text_projection"]),
        "logit_scale": _f32(sd["logit_scale"]),
    }


def load_flax_vit_npz(path: str, *, num_patches: Optional[int] = None) -> dict:
    """Load an original Google-Brain flax ViT ``.npz`` checkpoint
    (reference ``models/vit.py:318-395`` ``_load_weights``) into our tree.
    Covers the non-hybrid layout (the hybrid ResNet-stem branch loads
    checkpoints MADTP never uses)."""
    w = np.load(path)
    prefix = "opt/target/" if "opt/target/embedding/kernel" in w else ""

    def g(k):
        return np.asarray(w[prefix + k], np.float32)

    conv = g("embedding/kernel")  # HWIO [ph,pw,3,D]
    ph, pw, C, D = conv.shape
    # matmul kernel rows flatten in torch (c, kh, kw) order
    kernel = conv.transpose(2, 0, 1, 3).reshape(C * ph * pw, D)
    pos = g("Transformer/posembed_input/pos_embedding")
    if num_patches is not None:
        pos = interpolate_pos_embed(pos, num_patches)
    depth = len({k.split("/")[1] for k in w.files
                 if k.startswith(prefix + "Transformer/encoderblock_")})
    blocks = []
    for i in range(depth):
        b = f"Transformer/encoderblock_{i}/"
        mha = b + "MultiHeadDotProductAttention_1/"
        qkv_k = np.concatenate(
            [g(mha + f"{n}/kernel").reshape(D, -1) for n in ("query", "key", "value")],
            axis=1)
        qkv_b = np.concatenate(
            [g(mha + f"{n}/bias").reshape(-1) for n in ("query", "key", "value")])
        blocks.append({
            "norm1": {"scale": g(b + "LayerNorm_0/scale"),
                      "bias": g(b + "LayerNorm_0/bias")},
            "attn": {
                "qkv": {"kernel": qkv_k, "bias": qkv_b},
                "proj": {"kernel": g(mha + "out/kernel").reshape(-1, D),
                         "bias": g(mha + "out/bias")},
            },
            "norm2": {"scale": g(b + "LayerNorm_2/scale"),
                      "bias": g(b + "LayerNorm_2/bias")},
            "mlp": {
                "fc1": {"kernel": g(b + "MlpBlock_3/Dense_0/kernel"),
                        "bias": g(b + "MlpBlock_3/Dense_0/bias")},
                "fc2": {"kernel": g(b + "MlpBlock_3/Dense_1/kernel"),
                        "bias": g(b + "MlpBlock_3/Dense_1/bias")},
            },
        })
    return {
        "cls_token": g("cls").reshape(1, 1, D),
        "pos_embed": pos,
        "patch_embed": {"kernel": kernel, "bias": g("embedding/bias")},
        "blocks": _stack(blocks),
        "norm": {"scale": g("Transformer/encoder_norm/scale"),
                 "bias": g("Transformer/encoder_norm/bias")},
    }
