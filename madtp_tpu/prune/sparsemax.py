"""Sparsemax (Martins & Astudillo 2016) — sort + simplex projection.

The reference constructs a Sparsemax module for the MAG attention but never
uses it in the hot path (``Query_model.forward`` uses plain softmax,
reference ``models/utils.py:128-133,177``; the NLVR call is commented out,
``models/nlvr_encoder.py:418-422``).  Implemented for capability parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def sparsemax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    x = jnp.moveaxis(x, axis, -1)
    d = x.shape[-1]
    x = x - jnp.max(x, axis=-1, keepdims=True)
    zs = jnp.sort(x, axis=-1)[..., ::-1]  # descending
    rng = jnp.arange(1, d + 1, dtype=x.dtype)
    cssv = jnp.cumsum(zs, axis=-1)
    is_gt = (1.0 + rng * zs) > cssv
    k = jnp.max(is_gt * rng, axis=-1, keepdims=True)
    tau = (jnp.sum(jnp.where(is_gt, zs, 0.0), axis=-1, keepdims=True) - 1.0) / k
    out = jnp.maximum(x - tau, 0.0)
    return jnp.moveaxis(out, -1, axis)
