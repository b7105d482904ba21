"""Param tree -> torch-layout state_dict export.

Makes our compressed checkpoints interchangeable with the reference's
(``{'model': state_dict, 'epoch', 'temperature'}`` .pth files,
reference ``compress_nlvr_dtp.py:229-236``): a model fine-tuned here can be
evaluated by the reference and vice versa.  Also the roundtrip oracle for
:mod:`madtp_tpu.ckpt.remap` tests.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _unstack(tree, depth):
    """Split scan-stacked leaves back into per-layer trees."""
    out = []
    for i in range(depth):
        def sl(t):
            return {k: (sl(v) if isinstance(v, dict) else np.asarray(v)[i])
                    for k, v in t.items()}
        out.append(sl(tree))
    return out


def _lin(sd, prefix, p):
    sd[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _ln(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def export_vit(tree, prefix: str = "visual_encoder.",
               patch_size: int = 16) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    sd[prefix + "cls_token"] = np.asarray(tree["cls_token"])
    sd[prefix + "pos_embed"] = np.asarray(tree["pos_embed"])
    k = np.asarray(tree["patch_embed"]["kernel"])  # [3*p*p, D]
    D = k.shape[1]
    sd[prefix + "patch_embed.proj.weight"] = np.ascontiguousarray(
        k.T.reshape(D, 3, patch_size, patch_size))
    sd[prefix + "patch_embed.proj.bias"] = np.asarray(tree["patch_embed"]["bias"])
    depth = np.asarray(tree["blocks"]["norm1"]["scale"]).shape[0]
    for i, blk in enumerate(_unstack(tree["blocks"], depth)):
        b = f"{prefix}blocks.{i}."
        _ln(sd, b + "norm1", blk["norm1"])
        _lin(sd, b + "attn.qkv", blk["attn"]["qkv"])
        _lin(sd, b + "attn.proj", blk["attn"]["proj"])
        _ln(sd, b + "norm2", blk["norm2"])
        _lin(sd, b + "mlp.fc1", blk["mlp"]["fc1"])
        _lin(sd, b + "mlp.fc2", blk["mlp"]["fc2"])
    _ln(sd, prefix + "norm", tree["norm"])
    return sd


def export_med(tree, prefix: str = "text_encoder.", *, twin_cross=False,
               has_lm_head=False, merge_start_layer: int = 6) -> Dict[str, np.ndarray]:
    """``merge_start_layer``: the reference's twin encoder only instantiates
    ``crossattention.output.merge_layer`` at layers >= 6
    (reference nlvr_encoder.py:282 ``merge=(... and layer_num>=6)``); weights
    below it are semantically dead in our scan-uniform tree and are not
    exported, so the reference's ``load_state_dict`` sees its exact shape."""
    sd: Dict[str, np.ndarray] = {}
    bert = prefix + ("bert." if has_lm_head else "")
    emb = tree["embeddings"]
    sd[bert + "embeddings.word_embeddings.weight"] = np.asarray(
        emb["word_embeddings"])
    sd[bert + "embeddings.position_embeddings.weight"] = np.asarray(
        emb["position_embeddings"])
    # registered arange buffer persisted by the reference's transformers
    # version (BertEmbeddings.position_ids)
    sd[bert + "embeddings.position_ids"] = np.arange(
        np.asarray(emb["position_embeddings"]).shape[0], dtype=np.int64)[None]
    _ln(sd, bert + "embeddings.LayerNorm", emb["LayerNorm"])
    depth = np.asarray(
        tree["layers"]["attention"]["output"]["LayerNorm"]["scale"]).shape[0]
    for i, layer in enumerate(_unstack(tree["layers"], depth)):
        b = f"{bert}encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            _lin(sd, b + f"attention.self.{nm}", layer["attention"]["self"][nm])
        _lin(sd, b + "attention.output.dense", layer["attention"]["output"]["dense"])
        _ln(sd, b + "attention.output.LayerNorm",
            layer["attention"]["output"]["LayerNorm"])
        if "crossattention" in layer:
            ca = layer["crossattention"]
            if twin_cross:
                for s in ("self0", "self1"):
                    for nm in ("query", "key", "value"):
                        _lin(sd, b + f"crossattention.{s}.{nm}", ca[s][nm])
                _lin(sd, b + "crossattention.output.dense0", ca["output"]["dense0"])
                _lin(sd, b + "crossattention.output.dense1", ca["output"]["dense1"])
                if i >= merge_start_layer:
                    _lin(sd, b + "crossattention.output.merge_layer",
                         ca["output"]["merge_layer"])
            else:
                for nm in ("query", "key", "value"):
                    _lin(sd, b + f"crossattention.self.{nm}", ca["self"][nm])
                _lin(sd, b + "crossattention.output.dense", ca["output"]["dense"])
            _ln(sd, b + "crossattention.output.LayerNorm", ca["output"]["LayerNorm"])
        _lin(sd, b + "intermediate.dense", layer["intermediate"]["dense"])
        _lin(sd, b + "output.dense", layer["output"]["dense"])
        _ln(sd, b + "output.LayerNorm", layer["output"]["LayerNorm"])
    if "pooler" in tree:
        _lin(sd, bert + "pooler.dense", tree["pooler"]["dense"])
    if has_lm_head and "cls" in tree:
        cp = prefix + "cls.predictions."
        _lin(sd, cp + "transform.dense", tree["cls"]["transform"]["dense"])
        _ln(sd, cp + "transform.LayerNorm", tree["cls"]["transform"]["LayerNorm"])
        sd[cp + "bias"] = np.asarray(tree["cls"]["bias"])
        # tied decoder weight, exported for reference compatibility
        sd[cp + "decoder.weight"] = np.asarray(emb["word_embeddings"])
        sd[cp + "decoder.bias"] = np.asarray(tree["cls"]["bias"])
    return sd


def save_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray],
                          *, epoch: int = 0, temperature: float = 0.0):
    """Write a reference-compatible .pth (requires torch, present in this
    environment as CPU build)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()}
    torch.save({"model": sd, "epoch": epoch, "temperature": temperature}, path)


ML_DTYPES_KEY = "__ml_dtypes_json__"


def encode_ml_dtypes(flat: dict) -> dict:
    """npz cannot represent ml_dtypes (bfloat16/fp8: numpy kind 'V' — the
    round trip silently degrades to void |V2); store the raw bits as uint8
    and record the true dtype/shape under ``ML_DTYPES_KEY`` for
    :func:`decode_ml_dtypes` to view back.  One codec shared by the native
    checkpoint format (save_native) and the serving wire protocol
    (serve/server.encode_arrays) so dtype-handling fixes cannot diverge.
    Returns a new dict; the input is not mutated."""
    import json

    out = dict(flat)
    ml_kinds = {}
    for k, v in out.items():
        if v.dtype.kind == "V":
            ml_kinds[k] = [str(v.dtype), list(v.shape)]
            out[k] = v.reshape(-1).view(np.uint8)  # flatten: 0-d can't view
    if ml_kinds:
        out[ML_DTYPES_KEY] = np.frombuffer(
            json.dumps(ml_kinds).encode(), np.uint8)
    return out


def decode_ml_dtypes(flat: dict) -> dict:
    """Inverse of :func:`encode_ml_dtypes` (pops the sentinel key)."""
    import json

    out = dict(flat)
    if ML_DTYPES_KEY in out:
        import ml_dtypes

        for k, (name, shape) in json.loads(
                out.pop(ML_DTYPES_KEY).tobytes().decode()).items():
            out[k] = out[k].view(getattr(ml_dtypes, name)).reshape(shape)
    return out


def save_native(path: str, tree, extras: dict | None = None):
    """Native checkpoint (numpy npz of the flat tree; extras embedded as a
    json string so the checkpoint is ONE file) — unlike the reference,
    includes whatever the caller passes (e.g. optimizer state flattened)
    enabling true resume (reference has none, SURVEY.md §5).

    ATOMIC: written to a temp name and os.replace'd, so a crash mid-save
    (e.g. the preemption grace window expiring) never destroys the
    previous checkpoint — load always sees a complete generation."""
    import json
    import os

    from madtp_tpu.core.tree import flatten_tree

    flat = encode_ml_dtypes(
        {k: np.asarray(v) for k, v in flatten_tree(tree).items()})
    if extras is not None:
        flat["__extras_json__"] = np.frombuffer(
            json.dumps(extras).encode(), np.uint8)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        np.savez(tmp, **flat)
        # np.savez appends .npz when missing; normalize
        if not os.path.exists(tmp):
            tmp += ".npz"
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_native(path: str, *, require_extras: bool = False):
    import json
    import os

    from madtp_tpu.core.tree import unflatten_tree

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    flat = decode_ml_dtypes(flat)
    extras = {}
    jpath = os.path.splitext(path)[0] + ".json"
    if "__extras_json__" in flat:
        extras = json.loads(flat.pop("__extras_json__").tobytes().decode())
    elif os.path.exists(jpath):  # pre-r3 two-file format
        with open(jpath) as f:
            extras = json.load(f)
    elif require_extras:
        raise FileNotFoundError(
            f"native checkpoint sidecar {jpath} is missing — it carries the "
            "resume metadata (epoch/temperature/...) written by save_native; "
            "copy it alongside the .npz")
    return unflatten_tree(flat), extras


def export_clip(tree) -> Dict[str, np.ndarray]:
    """CLIP tree -> reference clip/model.py state_dict layout (inverse of
    remap_clip; enables .pth interchange for the CLIP tasks)."""
    sd: Dict[str, np.ndarray] = {}

    def blocks(prefix, btree):
        depth = np.asarray(btree["ln_1"]["scale"]).shape[0]
        for i, blk in enumerate(_unstack(btree, depth)):
            b = f"{prefix}.resblocks.{i}."
            _ln(sd, b + "ln_1", blk["ln_1"])
            sd[b + "attn.in_proj_weight"] = np.ascontiguousarray(
                np.asarray(blk["attn"]["in_proj"]["kernel"]).T)
            sd[b + "attn.in_proj_bias"] = np.asarray(
                blk["attn"]["in_proj"]["bias"])
            _lin(sd, b + "attn.out_proj", blk["attn"]["out_proj"])
            _ln(sd, b + "ln_2", blk["ln_2"])
            _lin(sd, b + "mlp.c_fc", blk["mlp"]["c_fc"])
            _lin(sd, b + "mlp.c_proj", blk["mlp"]["c_proj"])
            _lin(sd, b + "query_model.q_map.0", blk["query_model"]["q_map"])

    v = tree["visual"]
    k = np.asarray(v["conv1"]["kernel"])  # [3*p*p, W]
    W = k.shape[1]
    p = int(round((k.shape[0] // 3) ** 0.5))
    sd["visual.conv1.weight"] = np.ascontiguousarray(k.T.reshape(W, 3, p, p))
    sd["visual.class_embedding"] = np.asarray(v["class_embedding"])
    sd["visual.positional_embedding"] = np.asarray(v["positional_embedding"])
    _ln(sd, "visual.ln_pre", v["ln_pre"])
    blocks("visual.transformer", v["blocks"])
    _ln(sd, "visual.ln_post", v["ln_post"])
    sd["visual.proj"] = np.asarray(v["proj"])
    sd["token_embedding.weight"] = np.asarray(tree["token_embedding"])
    sd["positional_embedding"] = np.asarray(tree["positional_embedding"])
    blocks("transformer", tree["blocks"])
    _ln(sd, "ln_final", tree["ln_final"])
    sd["text_projection"] = np.asarray(tree["text_projection"])
    sd["logit_scale"] = np.asarray(tree["logit_scale"])
    return sd
