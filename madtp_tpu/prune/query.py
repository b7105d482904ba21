"""MAG module (``Query_model``): tokens vs. the shared FDT codebook.

Reference: ``models/utils.py:109-183``.  One einsum + masked softmax:

* ``token_attn`` — raw (unscaled) inner products ``ft @ sd^T`` [B,P,K]; feeds
  the DTP importance score and threshold.
* ``sd_ft`` — per-code soft pooling of the tokens:
  ``softmax_over_tokens((ft @ sd^T)/sqrt(sd_dim))^T @ ft`` [B,K,sd_dim];
  accumulated across layers for the cross-modal FDT alignment loss.

Only CLIP uses the ``q_map`` input projection (``map_func=True``,
reference ``clip/model.py:188``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import jax

from madtp_tpu.ops.layers import linear


def query_model(
    p: Optional[dict],
    ft: jnp.ndarray,  # [B, P, ft_dim]
    sd: jnp.ndarray,  # [K, sd_dim]
    *,
    alive: Optional[jnp.ndarray] = None,  # [B, P] bool (slot-alive; padding included)
    map_func: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(token_attn [B,P,K] raw, sd_ft [B,K,sd_dim])``."""
    q = linear(p["q_map"], ft) if map_func else ft
    sd_dim = sd.shape[-1]

    token_attn = jnp.einsum(
        "bpd,kd->bpk", q, sd, preferred_element_type=jnp.float32
    )  # raw inner products (returned un-scaled, reference models/utils.py:172-174)

    logits = token_attn / math.sqrt(sd_dim)
    logits = logits.transpose(0, 2, 1)  # [B, K, P], softmax over tokens
    if alive is not None:
        logits = jnp.where(alive[:, None, :], logits, float("-inf"))
    att_w = jax.nn.softmax(logits, axis=-1)
    sd_ft = jnp.einsum(
        "bkp,bpd->bkd", att_w, q.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return token_attn, sd_ft.astype(ft.dtype)
