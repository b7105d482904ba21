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

    # step 1: first-token logits from a single BOS step (reference :159-166)
    start_ids = jnp.full((B, 1), bos, answer_ids.dtype)
    ones = jnp.ones((B, 1), jnp.int32)
    hidden = M.med_decoder_forward(
        params, start_ids, ones, cfg.med, encoder_state=q_state
    )
    logits = M.lm_head(params, hidden, cfg.med)[:, 0, :]  # [B, V]

    first_tokens = answer_ids[:, 1]  # [nA]
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    prob_first = prob[:, first_tokens]  # [B, nA]
    topk_probs, topk_ids = jax.lax.top_k(prob_first, k)  # [B, k]

    # step 2: full LM scoring of the k candidates (reference :174-195) —
    # all k candidates of a question SHARE its cross-attn memory, so the
    # memory K/V are projected once per layer instead of the reference's
    # k-fold tile (med_rank_forward; identical math, tested vs the tiled
    # formulation and golden vs the reference's own rank_answer)
    cand_ids = answer_ids[topk_ids]  # [B, k, La]
    cand_mask = answer_mask[topk_ids]
    targets = jnp.where(cand_ids.reshape(B * k, La) == pad_token_id, -100,
                        cand_ids.reshape(B * k, La))

    hidden = M.med_rank_forward(
        params, cand_ids, cand_mask, cfg.med, encoder_state=q_state
    )
    logits = M.lm_head(params, hidden, cfg.med)
    loss = M.lm_loss(logits, targets, reduction="none")  # [B*k] summed/sample
    log_probs_sum = -loss.reshape(B, k)
    best = jnp.argmax(log_probs_sum, axis=1)  # [B]
    return jnp.take_along_axis(topk_ids, best[:, None], axis=1)[:, 0], topk_ids
