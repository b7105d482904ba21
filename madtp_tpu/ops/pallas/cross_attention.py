"""Fused cross-attention Pallas kernel (no DTP scores).

The ITM rerank (reference ``compress_retrieval_dtp.py:166-178``), the NLVR
twin-cross streams and the caption decoder all attend text queries
(Nq ~ 12-40) over a long image memory (S ~ 256-704).  XLA cannot fuse
``softmax(QK^T)V`` into one kernel (two matmuls), so the [B,H,Nq,S] logits
and probabilities round-trip through HBM — at rerank shapes
(128 candidates x 12 heads x 35 x 584 x 12 layers) that's gigabytes of
traffic per dispatch.  Here the whole [Nq, S] tile fits VMEM trivially, so
one program per (batch, head) computes logits -> masked softmax -> PV
without touching HBM in between.

Layout matches :mod:`fused_attention`: tokens on lanes —
q [B,H,Dh,Nq], k/v [B,H,Dh,S], out [B,H,Dh,Nq].  Masking semantics match
``ops.attention.attention_core``: dead keys -> exactly-zero probability
(NEG logits underflow), additive per-key bias before the softmax.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, alive_ref, bias_ref, o_ref, *, scale):
    alive = alive_ref[0, 0, :]  # [S]
    bias = bias_ref[0, 0, :]
    q = q_ref[0, 0]  # [Dh, Nq]
    k = k_ref[0, 0]  # [Dh, S]
    v = v_ref[0, 0]

    logits = jax.lax.dot_general(
        q, k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Nq, S]
    logits = logits + bias[None, :]
    logits = jnp.where(alive[None, :] > 0, logits, NEG)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(
        v, p.astype(v.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Dh, Nq]
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_cross_attention(
    q: jnp.ndarray,  # [B, H, Dh, Nq]
    k: jnp.ndarray,  # [B, H, Dh, S]
    v: jnp.ndarray,
    alive: jnp.ndarray,  # [B, S] bool
    bias: Optional[jnp.ndarray] = None,  # [B, S] additive
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns out [B, H, Dh, Nq] in q.dtype."""
    B, H, Dh, Nq = q.shape
    S = k.shape[3]
    af = alive.astype(jnp.float32)[:, None, :]
    bf = (jnp.zeros((B, 1, S), jnp.float32) if bias is None
          else bias.astype(jnp.float32)[:, None, :])

    blk_q = pl.BlockSpec((1, 1, Dh, Nq), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_kv = pl.BlockSpec((1, 1, Dh, S), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_vec = pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(B, H),
        in_specs=[blk_q, blk_kv, blk_kv, blk_vec, blk_vec],
        out_specs=blk_q,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh, Nq), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 64),
        ),
    )(q, k, v, af, bf)
    return out
