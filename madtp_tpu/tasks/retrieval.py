"""BLIP image-text retrieval evaluation: ITC shortlist -> ITM rerank.

Reference: ``compress_retrieval_dtp.py:84-205`` (SURVEY.md §3.4).  TPU-native
differences:

* the reference pads each eval batch's ragged (pruned) token features to the
  global max by repeating the CLS token (``:142-154``); our gather/masked
  states are batch-uniform by construction, so no rag fix is needed;
* the ITM rerank runs as a jitted fixed-shape step, ``rows_per_call`` query
  rows at a time with the per-row ITM batches **vmapped** — every DTP
  reduction (the batch-max keep count, ``prune/dtp.py:171``) stays inside its
  own row, so any ``rows_per_call`` reproduces the reference's
  one-row-per-step loop (``:166-178``) bit-exactly (tested,
  tests/test_retrieval_task.py);
* single-process multi-device: ``mesh`` shards the vmapped row axis over
  'data' (rows are independent, so this is embarrassingly parallel);
  multi-process: ``shard=(num_shards, shard_id)`` splits rows across
  processes with the reference's step arithmetic and
  ``parallel.dist.merge_scores`` sentinel-selects the -100-initialized
  score matrices back together (the reference's ``dist.all_reduce(SUM)``
  at ``:202-205`` — ours is bit-exact because shards are disjoint).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import functools

import numpy as np

from madtp_tpu.models import med as M
from madtp_tpu.models.blip import BlipConfig, blip_itm_score
from madtp_tpu.prune.dtp import TokenState
from madtp_tpu.utils.cache import BoundedCache
from madtp_tpu.utils.pipeline import PIPELINE_DEPTH, pipelined  # noqa: F401

_STEP_CACHE: BoundedCache = BoundedCache(maxsize=8)


def _cfg_key(cfg, *extra):
    """Hashable cache key for jitted step reuse across calls: repr(cfg)
    covers every config field; tracing again for identical configuration
    wastes seconds per eval epoch (the jaxpr of an unrolled gather forward
    is large)."""
    return (repr(cfg),) + extra


def _corpus_steps(cfg, prune_active, capacities_v, capacities_t):
    from madtp_tpu.models.blip import (
        blip_retrieval_image_features,
        blip_retrieval_text_features,
    )

    key = _cfg_key(cfg, "corpus", prune_active, capacities_v, capacities_t)
    if key not in _STEP_CACHE:

        @jax.jit
        def img_step(params, images, t):
            feat, state, _ = blip_retrieval_image_features(
                params, images, cfg, temperature=t,
                prune_active=prune_active, capacities=capacities_v,
            )
            return feat, state

        @jax.jit
        def txt_step(params, ids, mask, t):
            feat, out = blip_retrieval_text_features(
                params, ids, mask, cfg, temperature=t,
                prune_active=prune_active, capacities=capacities_t,
            )
            return feat

        _STEP_CACHE[key] = (img_step, txt_step)
    return _STEP_CACHE[key]


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
    mesh=None,
):
    """Stage 1: embed all texts and images (reference :95-125).

    ``mesh``: GSPMD data-parallel encode — each batch is padded (repeating
    the last sample, neutral for DTP batch-max coupling) and sharded over
    'data'; padded rows are dropped.

    Returns (img_feats [ni,E], img_states TokenState stacked on host,
    txt_feats [nt,E])."""
    from madtp_tpu.parallel.mesh import replicate, shard_batch_padded

    if mesh is not None:
        params = replicate(mesh, params)

    img_step, txt_step = _corpus_steps(cfg, prune_active, capacities_v,
                                       capacities_t)

    # bounded dispatch-ahead pipeline (utils/pipeline.py)
    t = jnp.float32(temperature)
    img_feats, xs, alives, txt_feats = [], [], [], []

    def dispatches():
        for images in image_batches:
            images, n = shard_batch_padded(mesh, images)
            yield ("img", n, img_step(params, images, t))
        for i in range(0, len(text_ids), text_batch):
            ids_d, mask_d, n = shard_batch_padded(
                mesh, text_ids[i : i + text_batch],
                text_mask[i : i + text_batch])
            yield ("txt", n, txt_step(params, ids_d, mask_d, t))

    def consume(item):
        kind, n, out = item
        if kind == "img":
            f, s = out
            img_feats.append(np.asarray(f)[:n])
            xs.append(np.asarray(s.x)[:n])
            alives.append(np.asarray(s.alive)[:n])
        else:
            txt_feats.append(np.asarray(out)[:n])

    pipelined(dispatches(), consume)

    img_feats = np.concatenate(img_feats)
    img_states = TokenState(np.concatenate(xs), np.concatenate(alives), None)
    txt_feats = np.concatenate(txt_feats)
    return img_feats, img_states, txt_feats


def encode_corpus_sharded(
    params,
    cfg: BlipConfig,
    image_batches,  # iterable of [b,3,H,W] numpy batches, OR a callable
    # (lo, hi) -> iterator over just that slice of the batch schedule —
    # preferred for lazy loaders: an islice over a streaming loader decodes
    # every batch BEFORE lo on each rank (~(P+1)/2 redundant decode work
    # fleet-wide), while a range-restricted loader
    # (data/loader.batched_loader(batch_range=...)) skips it
    text_ids: np.ndarray,
    text_mask: np.ndarray,
    *,
    n_batches: Optional[int] = None,  # required to STREAM the shard; a
    # sequence input is len()'d and sliced without materializing the rest
    temperature=0.0,
    prune_active: bool = False,
    capacities_v=None,
    capacities_t=None,
    text_batch: int = 256,
    mesh=None,
) -> Tuple[np.ndarray, TokenState, np.ndarray]:
    """Multi-process corpus encode: each process encodes a CONTIGUOUS block
    of the image batches, then the per-process features/states all-gather
    back into corpus order.

    EXCEEDS the reference, which encodes the full corpus on every rank
    (compress_retrieval_dtp.py:115-125 iterates an unsharded test loader) —
    P processes encode P-fold faster.  Contiguous BATCH blocks (not strided
    samples) keep every batch's membership identical to the single-process
    run, so DTP's batch-max coupling sees the same batches and the result
    is BIT-exact (tests/test_multiprocess.py).  Texts stay replicated like
    the reference (the text tower is a few percent of the encode cost)."""
    import itertools

    from madtp_tpu.parallel import dist as D

    P, r = D.process_count(), D.process_index()
    if P <= 1:
        batches = (image_batches(0, n_batches) if callable(image_batches)
                   else iter(image_batches))
        return encode_corpus(
            params, cfg, batches, text_ids, text_mask,
            temperature=temperature, prune_active=prune_active,
            capacities_v=capacities_v, capacities_t=capacities_t,
            text_batch=text_batch, mesh=mesh)

    if n_batches is None:
        n_batches = len(image_batches)  # sequence input
    n_b = n_batches
    # BALANCED contiguous blocks (i*n_b//P) — ceil-division blocks would
    # leave trailing processes empty even when n_b >= P (e.g. 9 batches on
    # 4 processes -> [3,3,3,0])
    lo, hi = r * n_b // P, (r + 1) * n_b // P
    if lo == hi:
        # EMPTY block (more processes than image batches — e.g. an 8-process
        # eval on a tiny val split): encode ONE dummy image to learn the
        # stacked shapes/dtypes the ragged all-gather below needs, then keep
        # zero rows.  The token-buffer dim is config/capacity-determined
        # (mask mode: fixed buffer; gather mode: static capacities), never
        # batch-dependent, so the dummy's trailing dims match the real
        # blocks'.  Texts still encode on every rank (replicated, like the
        # reference's unsharded text loop, compress_retrieval_dtp.py:95-113).
        block = iter([np.zeros(
            (1, 3, cfg.vit.image_size, cfg.vit.image_size), np.float32)])
    elif callable(image_batches):
        block = image_batches(lo, hi)  # skipped batches never decode
    else:
        block = itertools.islice(iter(image_batches), lo, hi)
    feats, states, txt_feats = encode_corpus(
        params, cfg, block, text_ids, text_mask,
        temperature=temperature, prune_active=prune_active,
        capacities_v=capacities_v, capacities_t=capacities_t,
        text_batch=text_batch, mesh=mesh)
    if lo == hi:
        feats = feats[:0]
        states = TokenState(states.x[:0], states.alive[:0], None)

    # all-gather the ragged per-process image blocks (pad rows to the max
    # block, track counts, reassemble in process order = corpus order)
    n_local = feats.shape[0]
    counts = D.host_allgather(np.asarray([n_local]))[:, 0]  # [P]
    n_max = int(counts.max())

    def pad_rows(a):
        a = np.asarray(a)
        if a.shape[0] == n_max:
            return a
        pad = np.zeros((n_max - a.shape[0],) + a.shape[1:], a.dtype)
        return np.concatenate([a, pad])

    def gather_cat(a):
        g = D.host_allgather(pad_rows(a))  # [P, n_max, ...]
        return np.concatenate([g[p, : counts[p]] for p in range(P)])

    feats_all = gather_cat(feats)
    sx_all = gather_cat(states.x)
    sa_all = gather_cat(states.alive)
    return feats_all, TokenState(sx_all, sa_all, None), txt_feats


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
    shard: Optional[Tuple[int, int]] = None,
    rows_per_call: int = 8,
    capacities_t=None,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stage 2 (reference :157-205): sims matrix, then ITM logits over each
    row's top-k_test candidates.  ``rows_per_call`` batches query rows per
    jitted dispatch (default 8: row-exact by construction since the rows
    are vmapped — tests/test_retrieval_task.py — and at one row per
    dispatch a real 5k-row corpus pays 5k dispatch round trips).
    ``shard=(num_shards, shard_id)`` splits the
    rows of EACH direction across processes with the reference's arithmetic
    (``step = n//num + 1``, computed independently for i2t over images and
    t2i over texts — compress_retrieval_dtp.py:160-164,184-188); un-scored
    entries stay at -100 for the cross-process sentinel-select merge
    (``parallel.dist.merge_scores``).  ``mesh``
    shards the row axis of each dispatch over 'data' (rows are independent)."""
    from madtp_tpu.parallel.mesh import replicate, shard_batch_padded

    sims = img_feats @ txt_feats.T  # [ni, nt]
    ni, nt = sims.shape
    score_i2t = np.full((ni, nt), -100.0, np.float32)
    score_t2i = np.full((nt, ni), -100.0, np.float32)

    t = jnp.float32(temperature)
    if mesh is not None:
        params = replicate(mesh, params)
        rows_per_call = max(rows_per_call, mesh.shape["data"])

    # the corpus goes to the DEVICE once (replicated under a mesh, one
    # transfer); every dispatch then ships only [rows, k] int32 indices and
    # gathers the candidate texts/image-states on device — the previous
    # path np.stack'ed ~rows x k_test x S x D candidate states on the host
    # per dispatch (~100 MB of host memcpy each at base scale)
    def rep(a, dtype=None):
        a = np.asarray(a)
        if dtype is not None:
            a = a.astype(dtype)
        if mesh is None:
            return jnp.asarray(a)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(a, NamedSharding(mesh, P()))

    # store the resident states in the model's compute dtype: med_encoder
    # casts the cross-attn memory to the embedding dtype anyway, and at
    # real corpus scale (COCO: 5k x ~584 x 768) the fp32 tensor is ~9 GB —
    # bf16 params halve that
    state_dtype = next(l.dtype for l in jax.tree_util.tree_leaves(params)
                       if jnp.issubdtype(l.dtype, jnp.floating))
    ids_all, mask_all = rep(text_ids), rep(text_mask)
    sx_all = rep(img_states.x, dtype=state_dtype)
    sa_all = rep(img_states.alive)

    key = _cfg_key(cfg, "itm_rows", prune_active, capacities_t)
    if key not in _STEP_CACHE:

        @functools.partial(jax.jit, static_argnames=("mode",))
        def itm_rows(params, ids_all, mask_all, sx_all, sa_all, rows, cands,
                     t, mode):
            """Per-row ITM batches, vmapped over the row axis: every DTP
            reduction (batch-max keep count, merge weights) stays inside its
            own row, so any rows_per_call reproduces the reference's
            one-row-per-step loop (compress_retrieval_dtp.py:166-178)
            exactly.  The side shared within a row (the image state for
            i2t, the text for t2i) is broadcast on device; the candidate
            side is gathered on device from the resident corpus."""

            def one(r, cand):
                k = cand.shape[0]

                def bc(a):
                    return jnp.broadcast_to(a[r][None], (k,) + a.shape[1:])

                if mode == "i2t":
                    ids, mask = ids_all[cand], mask_all[cand]
                    sx, sa = bc(sx_all), bc(sa_all)
                else:
                    ids, mask = bc(ids_all), bc(mask_all)
                    sx, sa = sx_all[cand], sa_all[cand]
                return blip_itm_score(
                    params, ids, mask, TokenState(sx, sa, None), cfg,
                    temperature=t, prune_active=prune_active,
                    capacities=capacities_t,
                )

            return jax.vmap(one)(rows, cands)

        _STEP_CACHE[key] = itm_rows
    itm_rows = _STEP_CACHE[key]

    def run_rows(lo, hi, topk, mode, write):
        # bounded dispatch-ahead pipeline (utils/pipeline.py); the last
        # batch is padded with repeats so every dispatch shares one shape
        def dispatches():
            for base in range(lo, hi, rows_per_call):
                rows = list(range(base, min(base + rows_per_call, hi)))
                rows_p = np.asarray(
                    rows + [rows[-1]] * (rows_per_call - len(rows)), np.int32)
                rows_d, cands_d, _ = shard_batch_padded(
                    mesh, rows_p, topk[rows_p])
                yield (rows, itm_rows(params, ids_all, mask_all, sx_all,
                                      sa_all, rows_d, cands_d, t, mode))

        def consume(item):
            rows, dev = item
            itm = np.asarray(dev)[: len(rows)]
            for r, scores in zip(rows, itm):
                write(r, scores)

        pipelined(dispatches(), consume)

    def shard_rows(n):
        if shard is None:
            return 0, n
        from madtp_tpu.parallel.dist import reference_row_shard

        return reference_row_shard(n, shard[0], shard[1])

    i_lo, i_hi = shard_rows(ni)
    topk_i = np.argsort(-sims, axis=1)[:, :k_test].astype(np.int32)

    def write_i2t(i, itm):
        score_i2t[i, topk_i[i]] = itm + sims[i, topk_i[i]]

    run_rows(i_lo, i_hi, topk_i, "i2t", write_i2t)

    t_lo, t_hi = shard_rows(nt)
    sims_t = sims.T  # [nt, ni]
    topk_t = np.argsort(-sims_t, axis=1)[:, :k_test].astype(np.int32)

    def write_t2i(j, itm):
        score_t2i[j, topk_t[j]] = itm + sims_t[j, topk_t[j]]

    run_rows(t_lo, t_hi, topk_t, "t2i", write_t2i)
    return score_i2t, score_t2i


def clip_retrieval_scores(img_feats: np.ndarray, txt_feats: np.ndarray):
    """CLIP variant: ITC similarity IS the score, no rerank
    (reference compress_retrieval_clip_dtp.py:78-124)."""
    sims = img_feats @ txt_feats.T
    return sims, sims.T


def merge_score_matrices(*parts: np.ndarray) -> np.ndarray:
    """Merge per-process row-sharded score matrices (initialized at -100):
    sentinel-aware select — each entry was written by AT MOST one shard
    (rows are disjoint), so take the non-sentinel value.  The reference
    all-reduces SUM over the -100-filled slices
    (compress_retrieval_dtp.py:202-205), which offsets every written entry
    by -(P-1)*100; a plain elementwise max would instead CLAMP legitimate
    scores below -100 to the sentinel (ITM logits are unbounded), losing
    their relative order.  Select preserves written values bit-exactly;
    the measure-zero case of a real score equal to exactly -100.0 merges
    to itself."""
    out = parts[0].copy()
    for p in parts[1:]:
        written = p != -100.0
        out[written] = p[written]
    return out
