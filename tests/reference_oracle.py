"""NumPy oracle for the reference MADTP per-layer math (dynamic shapes).

A clean-room reimplementation of the semantics documented in SURVEY.md §3.6
(reference models/vit.py:95-163, models/utils.py:109-183), operating with
*physical* token removal exactly like the reference, used to validate the
static-shape masked implementation in :mod:`madtp_tpu.prune.dtp`.
Everything is fp32 numpy.
"""

from __future__ import annotations

import numpy as np


def softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def attention_with_scores(x, wq, wk, wv, num_heads, bias=None):
    """Plain MHA returning (attn_out_merged, probs, per_head_out).

    x: [B,N,D]; w*: [D,D].  bias: additive [B,N] on keys or None.
    """
    B, N, D = x.shape
    Dh = D // num_heads

    def heads(t):
        return t.reshape(B, N, num_heads, Dh).transpose(0, 2, 1, 3)

    q, k, v = heads(x @ wq), heads(x @ wk), heads(x @ wv)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * (Dh ** -0.5)
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    probs = softmax(logits, axis=-1)
    per_head_out = np.einsum("bhqk,bhkd->bhqd", probs, v)
    out = per_head_out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return out, probs, per_head_out


def cls_attn_signal(probs, per_head_out):
    """AS-ViT head-diversity CLS attention (reference models/vit.py:95-101)."""
    cls_probs = probs[:, :, 0, 1:]  # [B,H,N-1]
    head_imp = np.linalg.norm(per_head_out[:, :, 1:, :], axis=-1)
    head_imp = head_imp / (head_imp.sum(axis=1, keepdims=True) + 1e-8)
    return (cls_probs * head_imp).sum(axis=1)  # [B,N-1]


def query_model_np(ft, sd, q_map=None):
    """Reference models/utils.py:147-183 (softmax att_func)."""
    q = ft if q_map is None else ft @ q_map
    token_attn = np.einsum("bpd,kd->bpk", q, sd)
    inner = token_attn / np.sqrt(sd.shape[-1])
    att_w = softmax(inner.transpose(0, 2, 1), axis=-1)  # [B,K,P]
    sd_ft = np.einsum("bkp,bpd->bkd", att_w, q)
    return token_attn, sd_ft


def reduce_token_np(x_patches, probs, cls_attn, token_attn, temperature,
                    variant="vit", max_keep=1):
    """Reference Block.Reduce_token (models/vit.py:123-163), physical removal.

    x_patches: [B,P,D] (no CLS).  probs: [B,H,1+P,1+P] full-softmax attention.
    Returns (new_patches [B,P',D], kept_ids list-of-arrays mapping new row ->
    original patch index, applied: bool).  Kept rows are ordered by descending
    score (a valid order for the reference's unspecified `sorted=False` topk);
    the merged token is appended last.
    """
    B, P, D = x_patches.shape
    sa = probs[:, :, 1:, 1:].max(axis=1)  # [B,P,P] max over heads
    sa = sa.sum(axis=1)  # column mass [B,P]
    sa = sa / (sa.sum(axis=1, keepdims=True) + 1e-8)

    tw = token_attn.max(axis=2)
    tw = tw / (tw.sum(axis=1, keepdims=True) + 1e-8)

    score = (sa + tw + cls_attn) / 3.0

    ta = token_attn / temperature
    w = softmax(ta, axis=1).transpose(0, 2, 1)  # [B,K,P]
    score_weight = np.einsum("bkp,bp->bk", w, score)
    thr = score_weight.min(axis=1)  # [B]

    idx = score > thr[:, None]
    topk_num = int(idx.sum(axis=1).max())
    reduce_num = P - topk_num

    if variant == "clip":
        if topk_num <= max_keep or reduce_num <= 1:
            return x_patches, [np.arange(P)] * B, False
    else:
        if topk_num < 1 or reduce_num <= 1:
            return x_patches, [np.arange(P)] * B, False

    new_rows, kept_ids = [], []
    for b in range(B):
        order = np.argsort(-score[b], kind="stable")
        keep, rest = order[:topk_num], order[topk_num:]
        wr = score[b][rest]
        wr = wr / (wr.sum() + 1e-8)
        merged = (wr[:, None] * x_patches[b][rest]).sum(axis=0)
        new_rows.append(np.concatenate([x_patches[b][keep], merged[None]], axis=0))
        kept_ids.append(keep)
    return np.stack(new_rows), kept_ids, True


# ---------------------------------------------------------------------------
# Full ViT forward with physical DTP (reference models/vit.py:183-310)
# ---------------------------------------------------------------------------

def layer_norm_np(x, scale, bias, eps=1e-6):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def gelu_np(x):
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def mha_packed_np(xn, qkv_k, qkv_b, proj_k, proj_b, num_heads, bias=None):
    """Fused-qkv MHA (reference models/vit.py:75-93). Returns
    (out, probs, per_head_out)."""
    B, N, D = xn.shape
    Dh = D // num_heads
    qkv = xn @ qkv_k + qkv_b
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, N, num_heads, Dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * (Dh ** -0.5)
    if bias is not None:
        logits = logits + bias
    probs = softmax(logits, axis=-1)
    per_head = np.einsum("bhqk,bhkd->bhqd", probs, v)
    out = per_head.transpose(0, 2, 1, 3).reshape(B, N, D)
    out = out @ proj_k + proj_b
    return out, probs, per_head


def patch_embed_np(images, kernel, bias, patch):
    B, C, H, W = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, gh * gw, C * patch * patch)
    return x @ kernel + bias


def vit_forward_np(params, images, cfg, sd=None, temperature=0.0):
    """Dynamic-shape oracle of reference models/vit.py:281-310.

    Returns (x_final, ids, sd_all, kept_counts); ids[b] maps final patch row
    -> token identity (original patch id, or P0 + layer for merged tokens).
    """
    def sl(tree, l):
        return {k: (sl(v, l) if isinstance(v, dict) else np.asarray(v)[l])
                for k, v in tree.items()}

    B = images.shape[0]
    x = patch_embed_np(
        images, np.asarray(params["patch_embed"]["kernel"]),
        np.asarray(params["patch_embed"]["bias"]), cfg.patch_size,
    )
    cls = np.broadcast_to(np.asarray(params["cls_token"]), (B, 1, x.shape[-1]))
    x = np.concatenate([cls, x], axis=1)
    x = x + np.asarray(params["pos_embed"])[:, : x.shape[1], :]

    P0 = x.shape[1] - 1
    ids = [np.arange(P0) for _ in range(B)]
    sd_all = None
    kept_counts = []
    for l in range(cfg.depth):
        p = sl(params["blocks"], l)
        token_attn = None
        if sd is not None:
            token_attn, sd_ft = query_model_np(x[:, 1:], sd)
            sd_all = sd_ft if sd_all is None else sd_all + sd_ft
        xn = layer_norm_np(x, p["norm1"]["scale"], p["norm1"]["bias"], cfg.layer_norm_eps)
        out, probs, per_head = mha_packed_np(
            xn, p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
            p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"], cfg.num_heads,
        )
        cls_attn = cls_attn_signal(probs, per_head)
        x = x + out
        if temperature > 0:
            new_patches, kept_ids, applied = reduce_token_np(
                x[:, 1:], probs, cls_attn, token_attn, temperature
            )
            if applied:
                ids = [
                    np.concatenate([ids[b][kept_ids[b]], [P0 + l]])
                    for b in range(B)
                ]
            x = np.concatenate([x[:, :1], new_patches], axis=1)
        kept_counts.append(x.shape[1] - 1)
        xn = layer_norm_np(x, p["norm2"]["scale"], p["norm2"]["bias"], cfg.layer_norm_eps)
        h = gelu_np(xn @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"])
        x = x + (h @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"])
    x = layer_norm_np(
        x, np.asarray(params["norm"]["scale"]), np.asarray(params["norm"]["bias"]),
        cfg.layer_norm_eps,
    )
    return x, ids, sd_all, kept_counts


# ---------------------------------------------------------------------------
# MED BERT text-encoder oracle with physical DTP + padding mask
# (reference models/med.py:143-236, 345-462, 478-598)
# ---------------------------------------------------------------------------

def bert_self_attn_np(x, p, num_heads, bias):
    """Separate q/k/v projections; returns (context, probs, per_head_out).
    bias: additive [B,1,1,N] or [B,1,N,N]."""
    B, N, D = x.shape
    Dh = D // num_heads

    def heads(t):
        return t.reshape(B, N, num_heads, Dh).transpose(0, 2, 1, 3)

    q = heads(x @ p["query"]["kernel"] + p["query"]["bias"])
    k = heads(x @ p["key"]["kernel"] + p["key"]["bias"])
    v = heads(x @ p["value"]["kernel"] + p["value"]["bias"])
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * (Dh ** -0.5)
    if bias is not None:
        logits = logits + bias
    probs = softmax(logits, axis=-1)
    per_head = np.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = per_head.transpose(0, 2, 1, 3).reshape(B, N, D)
    return ctx, probs, per_head


def med_text_encoder_np(params, input_ids, attention_mask, cfg, sd=None,
                        temperature=0.0):
    """Dynamic oracle of the text-mode BertEncoder with DTP.

    Follows reference models/med.py exactly: padding as additive -10000
    (models/med.py:785), slot-0 preservation, mask gathered with the keep
    indices (merged token inherits the next-ranked token's mask,
    models/med.py:377-390 topk+1 gather).  For oracle simplicity the merged
    token's mask is taken from the rank-topk token (the reference's
    unspecified unsorted-topk order realized as score-descending).
    Returns (x, ids, pad_bias, sd_all, kept_counts).
    """
    B, N = input_ids.shape
    D = cfg.hidden_size
    emb = params["embeddings"]
    x = np.asarray(emb["word_embeddings"])[input_ids] + \
        np.asarray(emb["position_embeddings"])[np.arange(N)][None]
    x = layer_norm_np(x, np.asarray(emb["LayerNorm"]["scale"]),
                      np.asarray(emb["LayerNorm"]["bias"]), cfg.layer_norm_eps)

    pad_bias = (1.0 - attention_mask.astype(np.float32)) * -10000.0  # [B,N]
    ids = [np.arange(N - 1) for _ in range(B)]
    sd_all = None
    kept_counts = []

    def sl(tree, l):
        return {k: (sl(v, l) if isinstance(v, dict) else np.asarray(v)[l])
                for k, v in tree.items()}

    for l in range(cfg.num_hidden_layers):
        p = sl(params["layers"], l)
        token_attn = None
        if sd is not None:
            token_attn, sd_ft = query_model_np(x[:, 1:], sd)
            sd_all = sd_ft if sd_all is None else sd_all + sd_ft

        bias4 = pad_bias[:, None, None, :]
        ctx, probs, per_head = bert_self_attn_np(
            x, p["attention"]["self"], cfg.num_attention_heads, bias4
        )
        h = ctx @ p["attention"]["output"]["dense"]["kernel"] + \
            p["attention"]["output"]["dense"]["bias"]
        x = layer_norm_np(h + x, p["attention"]["output"]["LayerNorm"]["scale"],
                          p["attention"]["output"]["LayerNorm"]["bias"],
                          cfg.layer_norm_eps)

        if temperature > 0:
            cls_attn = cls_attn_signal(probs, per_head)
            new_patches, kept_ids, applied = reduce_token_np(
                x[:, 1:], probs, cls_attn, token_attn, temperature
            )
            _last_scores = _scores_np(x[:, 1:], probs, cls_attn, token_attn)
            if applied:
                new_bias = []
                for b in range(B):
                    pb = pad_bias[b, 1:]
                    kept_bias = pb[kept_ids[b]]
                    # merged slot inherits the rank-topk dropped token's mask
                    # (reference models/med.py:377-390 topk+1 gather)
                    order = np.argsort(-_last_scores[b], kind="stable")
                    mb = pb[order[len(kept_ids[b])]]
                    new_bias.append(
                        np.concatenate([pad_bias[b, :1], kept_bias, [mb]]))
                pad_bias = np.stack(new_bias)
                ids = [np.concatenate([ids[b][kept_ids[b]], [(N - 1) + l]])
                       for b in range(B)]
            x = np.concatenate([x[:, :1], new_patches], axis=1)
        kept_counts.append(x.shape[1] - 1)

        h = gelu_np(x @ p["intermediate"]["dense"]["kernel"] +
                    p["intermediate"]["dense"]["bias"])
        h = h @ p["output"]["dense"]["kernel"] + p["output"]["dense"]["bias"]
        x = layer_norm_np(h + x, p["output"]["LayerNorm"]["scale"],
                          p["output"]["LayerNorm"]["bias"], cfg.layer_norm_eps)
    return x, ids, pad_bias, sd_all, kept_counts


def _scores_np(x_patches, probs, cls_attn, token_attn):
    sa = probs[:, :, 1:, 1:].max(axis=1).sum(axis=1)
    sa = sa / (sa.sum(axis=1, keepdims=True) + 1e-8)
    tw = token_attn.max(axis=2)
    tw = tw / (tw.sum(axis=1, keepdims=True) + 1e-8)
    return (sa + tw + cls_attn) / 3.0
