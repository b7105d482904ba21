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
