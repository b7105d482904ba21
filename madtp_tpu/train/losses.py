"""Training losses for compression fine-tuning.

* soft-target ITC over momentum features + queue
  (reference ``models/blip_retrieval.py:116-149``, ALBEF-style);
* ITM with in-batch/cross-rank hard negative mining
  (reference ``models/blip_retrieval.py:192-281``);
* CLIP queue-based InfoNCE (reference ``clip/model.py:529-569``);
* the FDT cross-modal alignment loss lives in models/blip.py
  (``fdt_alignment_loss``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def itc_soft_targets(
    feat_m: jnp.ndarray,  # [B,E] momentum features (this modality)
    other_m_all: jnp.ndarray,  # [E, B+Q] momentum features (other modality + queue)
    sim_targets: jnp.ndarray,  # [B, B+Q] id-matching distribution
    temp: jnp.ndarray,
    alpha,
) -> jnp.ndarray:
    sim_m = feat_m @ other_m_all / temp
    return alpha * jax.nn.softmax(sim_m, axis=1) + (1 - alpha) * sim_targets


def itc_loss(
    feat: jnp.ndarray,  # [B,E] online features
    other_m_all: jnp.ndarray,  # [E, B+Q]
    targets: jnp.ndarray,  # [B, B+Q] soft targets
    temp: jnp.ndarray,
) -> jnp.ndarray:
    sim = feat @ other_m_all / temp
    return -jnp.mean(jnp.sum(jax.nn.log_softmax(sim, axis=1) * targets, axis=1))


def id_match_targets(idx: jnp.ndarray, idx_all: jnp.ndarray) -> jnp.ndarray:
    """[B] ids x [B+Q] ids -> row-normalized equality matrix
    (reference models/blip_retrieval.py:117-120)."""
    pos = (idx[:, None] == idx_all[None, :]).astype(jnp.float32)
    return pos / jnp.sum(pos, axis=1, keepdims=True)


def sample_hard_negatives(
    rng: jax.Array,
    feat_a: jnp.ndarray,  # [B,E]
    feat_b: jnp.ndarray,  # [Bw,E] (world)
    idx: jnp.ndarray,  # [B]
    idx_world: jnp.ndarray,  # [Bw]
    temp: jnp.ndarray,
    group_a: jnp.ndarray = None,  # [B] data-shard id per query row
    group_b: jnp.ndarray = None,  # [Bw] data-shard id per candidate row
) -> jnp.ndarray:
    """Multinomial hard-negative index per row, same-id pairs masked out
    (reference models/blip_retrieval.py:194-227).  Returns [B] indices into
    the world batch.

    ``group_a``/``group_b``: when given, candidates outside the query's group
    are masked out — the reference's ``negative_all_rank=False`` (same-rank
    negatives only, ``:229-258``) expressed in GSPMD terms, where a "rank" is
    a contiguous block of the global batch living on one 'data' shard."""
    sim = feat_a @ feat_b.T / temp
    mask = idx[:, None] == idx_world[None, :]
    if group_a is not None:
        mask = mask | (group_a[:, None] != group_b[None, :])
    w = jax.nn.softmax(sim, axis=1)
    w = jnp.where(mask, 0.0, w)
    logw = jnp.log(jnp.maximum(w, 1e-20))
    return jax.random.categorical(rng, logw, axis=1)


def itm_loss(logits: jnp.ndarray, bs: int) -> jnp.ndarray:
    """[3B,2] logits: first B positive, next 2B negative
    (reference models/blip_retrieval.py:276-281)."""
    labels = jnp.concatenate(
        [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))
