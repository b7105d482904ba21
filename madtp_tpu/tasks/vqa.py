"""VQA answer ranking (reference ``models/blip_vqa.py:156-203``,
SURVEY.md §3.5).

Two fixed-shape decoder passes instead of the reference's host-side python
gathers:

1. one BOS step -> first-token distribution, restricted to the answer list's
   first tokens, top-k candidate answers per question;
2. full decoder pass over the k tiled candidates with per-sample summed
   label-smoothed loss; the best (lowest loss) candidate wins.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from madtp_tpu.models import med as M
from madtp_tpu.models.blip import BlipConfig
from madtp_tpu.prune.dtp import TokenState


def rank_answers(
    params,  # the text_decoder param tree
    q_state: TokenState,  # question encoder output (cross-attn memory)
    answer_ids: jnp.ndarray,  # [nA, La] bos-prefixed tokenized answer list
    answer_mask: jnp.ndarray,  # [nA, La]
    cfg: BlipConfig,
    *,
    k: int = 128,
    pad_token_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (answer indices into the answer list [B], topk candidate ids
    [B,k]).  Jittable with static k."""
    B = q_state.x.shape[0]
    nA, La = answer_ids.shape
    bos = answer_ids[0, 0]
    eps = 0.1  # reference label_smoothing (models/med.py:1045)

    # step 1: first-token logits from a single BOS step (reference :159-166);
    # med_bos_step also exports each layer's BOS K/V — the prefix every
    # candidate shares in step 2
    start_ids = jnp.full((B, 1), bos, answer_ids.dtype)
    hidden, bos_k, bos_v = M.med_bos_step(
        params, start_ids, cfg.med, encoder_state=q_state
    )
    logits = M.lm_head(params, hidden, cfg.med)[:, 0, :]  # [B, V]
    logp0 = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    first_tokens = answer_ids[:, 1]  # [nA]
    prob_first = jnp.exp(logp0)[:, first_tokens]  # [B, nA]
    topk_probs, topk_ids = jax.lax.top_k(prob_first, k)  # [B, k]

    # step 2: full LM scoring of the k candidates (reference :174-195) —
    # two exact structural savings over the reference's tiled formulation
    # (both golden-tested vs the reference's own rank_answer):
    # * all k candidates of a question SHARE its cross-attn memory, so the
    #   memory K/V are projected once per layer instead of k times;
    # * the BOS position's term of the label-smoothed loss is computable
    #   from the step-1 logits, so the candidate pass starts at position 1
    #   (prefix_kv) and the LM head skips two rows per candidate.
    cand_ids = answer_ids[topk_ids]  # [B, k, La]
    cand_mask = answer_mask[topk_ids]

    # position-0 loss term from step-1 logits (identical for formula, see
    # models/med.lm_loss): label = the candidate's first token
    smooth0 = -jnp.mean(logp0, axis=-1)  # [B]
    nll0 = -jnp.take_along_axis(logp0, cand_ids[:, :, 1].astype(jnp.int32),
                                axis=1)  # [B, k]
    term0 = (1.0 - eps) * nll0 + eps * smooth0[:, None]
    term0 = jnp.where(cand_ids[:, :, 1] == pad_token_id, 0.0, term0)

    hidden = M.med_rank_forward(
        params, cand_ids, cand_mask, cfg.med, encoder_state=q_state,
        prefix_kv=(bos_k, bos_v),
    )  # [B*k, La-1, D] for positions 1..La-1
    # positions 1..La-2 predict tokens 2..La-1 (position La-1's prediction
    # has no label — lm_loss drops it too)
    logits2 = M.lm_head(params, hidden[:, : La - 2, :], cfg.med)
    labels2 = cand_ids.reshape(B * k, La)[:, 2:]
    valid2 = labels2 != pad_token_id
    logp2 = jax.nn.log_softmax(logits2.astype(jnp.float32), axis=-1)
    nll2 = -jnp.take_along_axis(
        logp2, jnp.where(valid2, labels2, 0)[..., None].astype(jnp.int32),
        axis=-1)[..., 0]
    smooth2 = -jnp.mean(logp2, axis=-1)
    loss2 = jnp.where(valid2, (1.0 - eps) * nll2 + eps * smooth2, 0.0)
    loss = term0 + jnp.sum(loss2, axis=1).reshape(B, k)
    log_probs_sum = -loss
    best = jnp.argmax(log_probs_sum, axis=1)  # [B]
    return jnp.take_along_axis(topk_ids, best[:, None], axis=1)[:, 0], topk_ids
