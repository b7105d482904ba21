"""BLIP image-text retrieval evaluation: ITC shortlist -> ITM rerank.

Reference: ``compress_retrieval_dtp.py:84-205`` (SURVEY.md §3.4).  TPU-native
differences:

* the reference pads each eval batch's ragged (pruned) token features to the
  global max by repeating the CLS token (``:142-154``); our gather/masked
  states are batch-uniform by construction, so no rag fix is needed;
* the ITM rerank runs as a jitted fixed-shape step (one image x k_test texts
  per call), instead of a host loop with per-batch fvcore tracing;
* multi-device sharding splits the i2t/t2i row loops across the 'data' axis
  and sums the -100-initialized score matrices (the reference's
  ``dist.all_reduce(SUM)`` at ``:202-205``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.models import med as M
from madtp_tpu.models.blip import BlipConfig, blip_itm_score
from madtp_tpu.prune.dtp import TokenState


def encode_corpus(
    params,
    cfg: BlipConfig,
    image_batches,  # iterable of [b,3,H,W] numpy
    text_ids: np.ndarray,  # [n_texts, N] pre-tokenized, padded
    text_mask: np.ndarray,
    *,
    temperature=0.0,
    prune_active: bool = False,
    capacities_v=None,
    capacities_t=None,
    text_batch: int = 256,
):
    """Stage 1: embed all texts and images (reference :95-125).

    Returns (img_feats [ni,E], img_states TokenState stacked on host,
    txt_feats [nt,E])."""
    from madtp_tpu.models.blip import (
        blip_retrieval_image_features,
        blip_retrieval_text_features,
    )

    @jax.jit
    def img_step(params, images, t):
        feat, state, _ = blip_retrieval_image_features(
            params, images, cfg, temperature=t, prune_active=prune_active,
            capacities=capacities_v,
        )
        return feat, state

    @jax.jit
    def txt_step(params, ids, mask, t):
        feat, out = blip_retrieval_text_features(
            params, ids, mask, cfg, temperature=t, prune_active=prune_active,
            capacities=capacities_t,
        )
        return feat

    t = jnp.float32(temperature)
    img_feats, xs, alives = [], [], []
    for images in image_batches:
        feat, state = img_step(params, jnp.asarray(images), t)
        img_feats.append(np.asarray(feat))
        xs.append(np.asarray(state.x))
        alives.append(np.asarray(state.alive))
    img_feats = np.concatenate(img_feats)
    img_states = TokenState(
        np.concatenate(xs), np.concatenate(alives), None
    )

    txt_feats = []
    for i in range(0, len(text_ids), text_batch):
        feat = txt_step(
            params, jnp.asarray(text_ids[i : i + text_batch]),
            jnp.asarray(text_mask[i : i + text_batch]), t,
        )
        txt_feats.append(np.asarray(feat))
    txt_feats = np.concatenate(txt_feats)
    return img_feats, img_states, txt_feats


def rerank_scores(
    params,
    cfg: BlipConfig,
    img_feats: np.ndarray,
    img_states: TokenState,  # host arrays [ni, S, D] / [ni, S]
    txt_feats: np.ndarray,
    text_ids: np.ndarray,
    text_mask: np.ndarray,
    *,
    k_test: int = 128,
    temperature=0.0,
    prune_active: bool = False,
    row_slice: Optional[Tuple[int, int]] = None,
    rows_per_call: int = 1,
    capacities_t=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stage 2 (reference :157-205): sims matrix, then ITM logits over each
    row's top-k_test candidates.  ``row_slice`` shards rows across processes;
    un-scored entries stay at -100 for the cross-process SUM."""
    sims = img_feats @ txt_feats.T  # [ni, nt]
    ni, nt = sims.shape
    score_i2t = np.full((ni, nt), -100.0, np.float32)
    score_t2i = np.full((nt, ni), -100.0, np.float32)

    t = jnp.float32(temperature)

    @jax.jit
    def itm_batch(params, ids, mask, state_x, state_alive, t):
        state = TokenState(state_x, state_alive, None)
        return blip_itm_score(
            params, ids, mask, state, cfg,
            temperature=t, prune_active=prune_active,
            capacities=capacities_t,
        )

    # rows are processed `rows_per_call` at a time so each device dispatch
    # scores rows_per_call * k_test pairs.  NOTE: DTP keep counts are
    # batch-coupled, so rows_per_call > 1 changes scores slightly relative to
    # the reference's one-row-per-step loop (compress_retrieval_dtp.py:166-178)
    # — use > 1 only as an explicit throughput knob.
    def run_rows(lo, hi, make_row, write):
        for base in range(lo, hi, rows_per_call):
            rows = list(range(base, min(base + rows_per_call, hi)))
            ids_l, mask_l, sx_l, sa_l = zip(*(make_row(r) for r in rows))
            itm = np.asarray(itm_batch(
                params,
                jnp.asarray(np.concatenate(ids_l)),
                jnp.asarray(np.concatenate(mask_l)),
                jnp.asarray(np.concatenate(sx_l)),
                jnp.asarray(np.concatenate(sa_l)), t,
            )).reshape(len(rows), k_test)
            for r, scores in zip(rows, itm):
                write(r, scores)

    i_lo, i_hi = (0, ni) if row_slice is None else row_slice
    topk_i = np.argsort(-sims, axis=1)[:, :k_test]

    def make_i2t(i):
        topk = topk_i[i]
        sx = np.broadcast_to(img_states.x[i][None],
                             (k_test,) + img_states.x[i].shape)
        sa = np.broadcast_to(img_states.alive[i][None],
                             (k_test,) + img_states.alive[i].shape)
        return text_ids[topk], text_mask[topk], sx, sa

    def write_i2t(i, itm):
        score_i2t[i, topk_i[i]] = itm + sims[i, topk_i[i]]

    run_rows(i_lo, i_hi, make_i2t, write_i2t)

    t_lo, t_hi = (0, nt) if row_slice is None else (
        row_slice[0] * nt // ni, row_slice[1] * nt // ni
    )
    sims_t = sims.T  # [nt, ni]
    topk_t = np.argsort(-sims_t, axis=1)[:, :k_test]

    def make_t2i(j):
        topk = topk_t[j]
        ids = np.broadcast_to(text_ids[j][None], (k_test, text_ids.shape[1]))
        mask = np.broadcast_to(text_mask[j][None], (k_test, text_mask.shape[1]))
        return ids, mask, img_states.x[topk], img_states.alive[topk]

    def write_t2i(j, itm):
        score_t2i[j, topk_t[j]] = itm + sims_t[j, topk_t[j]]

    run_rows(t_lo, t_hi, make_t2i, write_t2i)
    return score_i2t, score_t2i


def clip_retrieval_scores(img_feats: np.ndarray, txt_feats: np.ndarray):
    """CLIP variant: ITC similarity IS the score, no rerank
    (reference compress_retrieval_clip_dtp.py:78-124)."""
    sims = img_feats @ txt_feats.T
    return sims, sims.T


def merge_score_matrices(*parts: np.ndarray) -> np.ndarray:
    """Merge per-process row-sharded score matrices (initialized at -100):
    elementwise max over shards — the reference all-reduces SUM over
    disjoint -100-filled slices (compress_retrieval_dtp.py:202-205), which
    max reproduces without the additive offset."""
    return np.maximum.reduce(list(parts))
