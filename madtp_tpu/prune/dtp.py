"""Dynamic Token Pruning (DTP) — static-shape TPU reformulation.

Reference semantics (``models/vit.py:123-163``, ``models/med.py:345-391``,
``clip/model.py:194-234``; pseudocode in SURVEY.md §3.6): at each transformer
layer, score every non-CLS token by the mean of three normalized signals
(self-attention column mass, MAG token-codebook affinity, head-diversity
weighted CLS attention), derive a per-sample threshold from a
temperature-softmaxed codebook attention, keep the batch-max count of
above-threshold tokens, and merge all dropped tokens into ONE new token by
score-weighted sum.

The reference implementation shrinks the sequence physically each layer and
synchronizes with the host per layer (``topk_num = ....item()``,
``models/vit.py:145``), which creates dynamic shapes and a device->host stall
in the hottest loop.  Here instead:

* **mask mode** — tokens live in a fixed buffer of ``1 + P0 + depth`` slots
  (CLS + initial patches + one pre-allocated merge slot per layer) with a
  boolean ``alive`` mask.  "Pruning" flips mask bits and writes the merged
  token into this layer's merge slot.  Because attention masks dead keys with
  ``-inf`` (exact zero weight), every surviving token computes exactly what it
  would have computed on the physically compacted sequence.  The batch-max
  keep count is a *traced scalar* used only in comparisons, so one XLA
  compilation covers every batch and every temperature.

* **gather mode** — identical decisions, followed by a physical compaction to
  a static per-layer capacity (top-``C`` gather).  This is the eval fast path:
  attention cost drops quadratically with the capacity schedule.  Capacities
  are calibrated offline (mask-mode stats), so shapes remain static.

Identity-preserving note: the reference's physical ``topk(sorted=False)``
gather shuffles token order and, in two places, misaligns auxiliary data (the
NLVR text mask is gathered with *sorted* indices, ``models/nlvr_encoder.py:452``;
CLIP indexes the EOT embedding by its pre-pruning position,
``clip/model.py:501``).  Order is semantically irrelevant to attention, so the
mask-mode keeps each token in its own slot — matching the paper's intent and
the reference wherever the reference is itself well-defined.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


class TokenState(NamedTuple):
    """Fixed-shape token buffer.

    ``x``: [B, S, D] token features; slot 0 is CLS/EOS (never pruned).
    ``alive``: [B, S] bool; False = pruned/never-used slot (exact-zero attention).
    ``bias``: [B, S] additive attention bias per key (text padding; the
    reference's finite -1e4-style mask, kept separate from ``alive`` so padded
    tokens still participate in scoring exactly like the reference).
    """

    x: jnp.ndarray
    alive: jnp.ndarray
    bias: Optional[jnp.ndarray]


class DTPSignals(NamedTuple):
    """Per-layer scoring inputs (slots 1..S-1 only)."""

    cls_attn: jnp.ndarray  # [B, P] head-diversity weighted CLS attention
    col_mass: jnp.ndarray  # [B, P] un-normalized column mass (dead cols exactly 0)
    token_attn: jnp.ndarray  # [B, P, K] raw MAG inner products


def init_token_state(
    tokens: jnp.ndarray,  # [B, N, D] (CLS at slot 0)
    depth: int,
    bias: Optional[jnp.ndarray] = None,  # [B, N] additive key bias
    pad_to: int = 1,
) -> TokenState:
    """Pad with ``depth`` dead merge slots -> buffer of S = N + depth, rounded
    up to a multiple of ``pad_to`` (lane alignment for the fused attention
    kernel; extra slots stay dead forever)."""
    B, N, D = tokens.shape
    S = N + depth
    if pad_to > 1:
        S = ((S + pad_to - 1) // pad_to) * pad_to
    extra = S - N
    x = jnp.concatenate(
        [tokens, jnp.zeros((B, extra, D), tokens.dtype)], axis=1
    )
    alive = jnp.concatenate(
        [jnp.ones((B, N), bool), jnp.zeros((B, extra), bool)], axis=1
    )
    if bias is not None:
        bias = jnp.concatenate([bias, jnp.zeros((B, extra), bias.dtype)], axis=1)
    return TokenState(x=x, alive=alive, bias=bias)


def importance_score(
    signals: DTPSignals, palive: jnp.ndarray
) -> jnp.ndarray:
    """Mean of three normalized signals (reference models/vit.py:126-134).

    Dead slots score exactly 0 in each signal (they have zero attention mass
    and are excluded from the normalizers), matching their absence in the
    reference's physically compacted tensors.
    Returns [B, P] with dead slots = 0.
    """
    col = signals.col_mass
    col_w = col / (jnp.sum(col, axis=1, keepdims=True) + 1e-8)

    tw = jnp.max(signals.token_attn, axis=2)  # [B,P]
    tw = jnp.where(palive, tw, 0.0)
    tw = tw / (jnp.sum(tw, axis=1, keepdims=True) + 1e-8)

    cls_w = jnp.where(palive, signals.cls_attn, 0.0)
    return (col_w + tw + cls_w) / 3.0


def dtp_threshold(
    token_attn: jnp.ndarray,  # [B,P,K] raw
    score: jnp.ndarray,  # [B,P], dead slots 0
    palive: jnp.ndarray,  # [B,P]
    temperature: jnp.ndarray,
) -> jnp.ndarray:
    """Per-sample threshold (reference models/vit.py:137-141):
    ``min_k softmax_tokens(token_attn/T)[:, :, k] . score``."""
    logits = token_attn / temperature
    logits = jnp.where(palive[:, :, None], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=1)  # softmax over tokens, [B,P,K]
    score_weight = jnp.einsum(
        "bpk,bp->bk", w, score, preferred_element_type=jnp.float32
    )
    return jnp.min(score_weight, axis=1)  # [B]


def _invert_permutation(order: jnp.ndarray) -> jnp.ndarray:
    """inv[b, order[b, i]] = i — the inverse of a batched permutation, as a
    second stable argsort (argsort of a permutation is its inverse).

    Measured refusal (r5, tools/bench_glue.py on-chip A/B): the "obvious"
    O(P) reformulation — a single int32 scatter
    (``zeros.at[arange(B)[:,None], order].set(iota, unique_indices=True)``)
    instead of this O(P log P) second sort — is 3.2% SLOWER end-to-end on
    the NLVR gather eval step (58.6 -> 60.5 ms/batch, reproduced across
    runs): XLA:TPU's bitonic sort is vector-unit-friendly while scatter
    serializes.  Keep the sort; this helper is the monkeypatch seam the A/B
    tool uses."""
    return jnp.argsort(order, axis=-1, stable=True)


def _merge_dropped(w: jnp.ndarray, patches: jnp.ndarray) -> jnp.ndarray:
    """Score-weighted sum of dropped tokens (reference models/vit.py:155-160)
    with fp32 accumulation regardless of buffer dtype.

    Measured neutral (r5, tools/bench_glue.py on-chip A/B): reading the
    token buffer as bf16 into the MXU (fp32 via preferred_element_type)
    instead of up-casting to fp32 first A/B'd at 1.0004x — XLA already
    fuses the cast into the contraction, so the explicit astype costs
    nothing; keep the simpler always-fp32 form (bit-identical on every
    golden path)."""
    return jnp.einsum(
        "bp,bpd->bd", w, patches.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(patches.dtype)


def _rank_desc(score_masked: jnp.ndarray) -> jnp.ndarray:
    """rank[b, n] = position of token n in a stable descending sort of scores
    (ties broken by lower index, matching torch.topk determinism)."""
    order = jnp.argsort(-score_masked, axis=-1, stable=True)
    return _invert_permutation(order)


def dtp_prune(
    state: TokenState,
    signals: DTPSignals,
    temperature,
    merge_slot,  # int or traced scalar: buffer slot for this layer's merged token
    *,
    variant: str = "vit",
    max_keep=None,  # CLIP text EOT guard (reference clip/model.py:220,492)
    row_independent: bool = False,
) -> Tuple[TokenState, jnp.ndarray]:
    """One DTP step.  Returns ``(new_state, kept_patch_count)`` where
    ``kept_patch_count`` is the batch-uniform number of alive non-CLS slots
    after pruning (feeds the analytic-FLOPs compute controller).

    Guards (reference models/vit.py:148, med.py:372, clip/model.py:220): skip
    entirely when nothing or almost-everything would be pruned.

    ``row_independent=True`` (serving mode, ``export_serving
    --row_independent``) drops the reference's batch coupling: each row
    keeps its OWN threshold count (exactly what a batch-1 call computes)
    instead of the batch max, the guards apply per row, and the returned
    kept count is per-row ``[B]``.  This makes a row's output independent
    of its co-tenants — the property the serving dispatcher's dynamic-batch
    merging requires (serve/server.py) — while the fused scoring kernel
    stays engaged (the coupling lives HERE, not in the kernel).
    """
    x, alive, bias = state
    B, S, D = x.shape
    palive = alive[:, 1:]  # [B,P]
    P = S - 1

    temperature = jnp.asarray(temperature, jnp.float32)
    score = importance_score(signals, palive)  # [B,P]
    thr = dtp_threshold(signals.token_attn, score, palive, temperature)  # [B]

    keep_decision = palive & (score > thr[:, None])
    counts = jnp.sum(keep_decision, axis=1)  # [B]
    if row_independent:
        topk_num = counts  # [B] — each row exactly as at batch 1
        alive_cnt = jnp.sum(palive, axis=1)  # [B]
    else:
        topk_num = jnp.max(counts)  # traced scalar, batch-coupled like reference
        alive_cnt = jnp.max(jnp.sum(palive, axis=1))  # batch-uniform by construction

    if variant == "clip":
        mk = jnp.asarray(1 if max_keep is None else max_keep)
        apply = (topk_num > mk) & (alive_cnt - topk_num >= 2)
    else:
        apply = (topk_num >= 1) & (alive_cnt - topk_num >= 2)

    # Per-sample keep set: top `topk_num` by score (batch-uniform count, so
    # low-count samples retain below-threshold tokens — reference behavior;
    # per-row count when row_independent).
    score_ranked = jnp.where(palive, score, NEG_INF)
    order = jnp.argsort(-score_ranked, axis=-1, stable=True)  # [B, P]
    ranks = _invert_permutation(order)
    keep = palive & (ranks < (topk_num[:, None] if row_independent
                              else topk_num))

    # Merge all dropped tokens into one (reference models/vit.py:153-161).
    merge_mask = palive & ~keep
    w = jnp.where(merge_mask, score, 0.0)
    w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-8)
    merged = _merge_dropped(w, x[:, 1:])  # [B,D]

    merge_slot = jnp.asarray(merge_slot, jnp.int32)
    slot_iota = jnp.arange(S)
    is_merge_slot = slot_iota[None, :] == merge_slot  # [1,S]

    new_alive = jnp.concatenate([alive[:, :1], keep], axis=1)
    new_alive = new_alive | is_merge_slot
    new_x = jnp.where(is_merge_slot[:, :, None], merged[:, None, :], x)
    new_bias = bias
    if bias is not None:
        # kept slots keep their own padding bias (identity-preserving).  The
        # merged slot inherits the bias of the best DROPPED token (rank
        # topk_num): the reference gathers topk_num+1 indices and the mask
        # rides along (models/med.py:377-390), so the merged token is
        # attendable iff that token was.  (`order` from the keep-set sort.)
        rank_k = (topk_num[:, None] if row_independent
                  else jnp.broadcast_to(topk_num[None, None], (B, 1)))
        rank_k_tok = jnp.take_along_axis(
            order, jnp.minimum(rank_k, P - 1), axis=1
        )  # [B,1] patch index of the rank-topk token
        merged_bias = jnp.take_along_axis(bias[:, 1:], rank_k_tok, axis=1)[:, 0]
        new_bias = jnp.where(is_merge_slot, merged_bias[:, None], bias)

    ax = apply[:, None, None] if row_independent else apply
    aa = apply[:, None] if row_independent else apply
    out = TokenState(
        x=jnp.where(ax, new_x, x),
        alive=jnp.where(aa, new_alive, alive),
        bias=new_bias if bias is None else jnp.where(aa, new_bias, bias),
    )
    kept = jnp.where(apply, topk_num + 1, alive_cnt)  # patches incl. merged
    return out, kept


def compact(
    state: TokenState, capacity: int
) -> Tuple[TokenState, jnp.ndarray]:
    """Gather-mode physical compaction to ``capacity`` slots (static).

    Keeps slot 0 plus the ``capacity - 1`` highest-priority remaining slots
    (alive first, by slot order — a pure layout change, no semantic effect
    since attention is permutation-invariant over keys and dead slots carry
    exact-zero weight).  Returns the compacted state and the gather indices
    (so callers can co-gather auxiliary per-slot data).
    """
    x, alive, bias = state
    B, S, D = x.shape
    assert capacity <= S
    # priority: alive slots first (stable slot order), then dead slots.
    prio = jnp.where(alive[:, 1:], -jnp.arange(1, S)[None, :], NEG_INF)
    idx = jnp.argsort(-prio, axis=-1, stable=True)[:, : capacity - 1] + 1  # [B,C-1]
    idx = jnp.concatenate([jnp.zeros((B, 1), idx.dtype), idx], axis=1)  # [B,C]
    gx = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    galive = jnp.take_along_axis(alive, idx, axis=1)
    gbias = None if bias is None else jnp.take_along_axis(bias, idx, axis=1)
    return TokenState(gx, galive, gbias), idx


def dtp_prune_gather(
    state: TokenState,
    signals: DTPSignals,
    temperature,
    capacity: int,
    *,
    variant: str = "vit",
    max_keep=None,
    row_independent: bool = False,
) -> Tuple[TokenState, jnp.ndarray, jnp.ndarray]:
    """DTP step + physical compaction to ``capacity`` slots (static shape).

    Identical decisions to :func:`dtp_prune`, but the surviving tokens are
    gathered into a fresh ``[B, capacity, D]`` buffer: slot 0 = CLS, slots
    ``1..capacity-2`` = the highest-scored tokens (alive-flag marks the first
    ``topk_num``), slot ``capacity-1`` = the merged token.  This is the eval
    fast path — downstream attention cost scales with the capacity schedule,
    which is how the TPU rebuild banks the FLOPs the reference saves via
    dynamic shapes.

    If the batch keeps more tokens than ``capacity - 2`` (mis-calibrated
    schedule), the lowest-scored kept tokens overflow into the merged token;
    the returned ``overflow`` count (traced scalar) lets callers log it
    (SURVEY.md §5 "no silent caps").

    In ``row_independent`` serving mode ``kept`` reports the per-row
    DECISION count (``eff_keep + overflow + merge``) rather than the
    physically-resident count: it then equals mask-mode ``kept`` under any
    schedule, and a served row whose kept exceeds ``capacity - 1`` IS the
    overflow signal — the HTTP server derives overflow stats from exactly
    this (serve/server.py /stats), so a mis-calibrated schedule is
    observable in production instead of silently merging extra tokens.
    Batch-coupled mode keeps the physical count (capacity-clamped), which
    calibration/drift tests pin.

    Returns ``(new_state, kept_patch_count, overflow)``.
    """
    x, alive, bias = state
    B, S, D = x.shape
    palive = alive[:, 1:]
    cap_p = capacity - 2  # patch slots available (excl. CLS + merge)

    temperature = jnp.asarray(temperature, jnp.float32)
    score = importance_score(signals, palive)
    thr = dtp_threshold(signals.token_attn, score, palive, temperature)

    keep_decision = palive & (score > thr[:, None])
    counts = jnp.sum(keep_decision, axis=1)
    if row_independent:
        # serving mode: per-row counts/guards, no batch coupling — each row
        # computes exactly its batch-1 result (see dtp_prune docstring)
        topk_num = counts  # [B]
        alive_cnt = jnp.sum(palive, axis=1)  # [B]
    else:
        topk_num = jnp.max(counts)
        alive_cnt = jnp.max(jnp.sum(palive, axis=1))

    if variant == "clip":
        mk = jnp.asarray(1 if max_keep is None else max_keep)
        apply = (topk_num > mk) & (alive_cnt - topk_num >= 2)
    else:
        apply = (topk_num >= 1) & (alive_cnt - topk_num >= 2)

    # Effective keep count in this buffer (clamped by capacity)
    eff_keep = jnp.where(apply, jnp.minimum(topk_num, cap_p), jnp.minimum(alive_cnt, cap_p))
    overflow = jnp.maximum(jnp.where(apply, topk_num, alive_cnt) - cap_p, 0)
    eff_keep_col = eff_keep[:, None] if row_independent else eff_keep

    score_ranked = jnp.where(palive, score, NEG_INF)
    order = jnp.argsort(-score_ranked, axis=-1, stable=True)  # [B, S-1] desc
    sel = order[:, :cap_p]  # top cap_p patch indices (0-based into patches)
    ranks_sel = jnp.arange(cap_p)[None, :]
    sel_alive = jnp.take_along_axis(palive, sel, axis=1) & (ranks_sel < eff_keep_col)

    gx = jnp.take_along_axis(x[:, 1:], sel[:, :, None], axis=1)  # [B,cap_p,D]
    gbias = None if bias is None else jnp.take_along_axis(bias[:, 1:], sel, axis=1)

    # merged token: everything alive and not effectively kept (ranks derived
    # from `order` — one sort fewer than calling _rank_desc again)
    rank_full = _invert_permutation(order)
    merge_mask = palive & (rank_full >= eff_keep_col)
    w = jnp.where(merge_mask, score, 0.0)
    w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-8)
    merged = _merge_dropped(w, x[:, 1:])

    do_merge = apply | (overflow > 0)
    new_x = jnp.concatenate([x[:, :1], gx, merged[:, None, :]], axis=1)
    merge_col = (do_merge[:, None] if row_independent
                 else jnp.broadcast_to(do_merge[None, None], (B, 1)))
    new_alive = jnp.concatenate([alive[:, :1], sel_alive, merge_col], axis=1)
    new_bias = None
    if bias is not None:
        rank_k = (eff_keep[:, None] if row_independent
                  else jnp.broadcast_to(eff_keep[None, None], (B, 1)))
        rank_k_tok = jnp.take_along_axis(order, rank_k, axis=1)
        merged_bias = jnp.take_along_axis(bias[:, 1:], rank_k_tok, axis=1)
        new_bias = jnp.concatenate([bias[:, :1], gbias, merged_bias], axis=1)
    kept = eff_keep + do_merge.astype(eff_keep.dtype)
    if row_independent:  # decision count (see docstring): overflow observable
        kept = kept + overflow.astype(kept.dtype)
    return TokenState(new_x, new_alive, new_bias), kept, overflow


def dtp_prune_static(
    state: TokenState,
    cls_attn: jnp.ndarray,  # [B, P] importance (CLS attention only)
    keep_num: int,
) -> Tuple[TokenState, jnp.ndarray]:
    """Static top-k variant (``Reduce_token_static``): keep a FIXED number of
    tokens per layer ranked by CLS attention alone, no merge token.

    Present in the reference but commented out of every forward path
    (reference ``models/vit.py:165-181,200-201``); provided for capability
    parity and as the simplest pruning baseline.  Returns (state, kept).
    """
    x, alive, bias = state
    palive = alive[:, 1:]
    score = jnp.where(palive, cls_attn, NEG_INF)
    ranks = _rank_desc(score)
    keep = palive & (ranks < keep_num)
    new_alive = jnp.concatenate([alive[:, :1], keep], axis=1)
    kept = jnp.minimum(jnp.max(jnp.sum(palive, axis=1)), keep_num)
    return TokenState(x, new_alive, bias), kept
