"""Fused attention + DTP-scoring Pallas kernel.

The XLA path materializes the full [B,H,N,N] probability tensor in HBM
because it has three consumers (the PV matmul, the column-mass reduction, and
the CLS row) — at NLVR eval shapes that's ~1 GB of HBM traffic per layer and
the measured bottleneck (bf16 only bought 10%).  This kernel keeps the
probabilities in VMEM: one grid program per batch row loops over heads,
accumulating

* ``out``      [B,H,Dh,N] — attention output (pre-projection, per head;
  fp32 accumulation, stored in the input dtype — the caller consumes it in
  that dtype anyway and bf16 halves the kernel's output HBM traffic);
* ``col_mass`` [B,N]      — sum over alive queries (rows >= 1) of the
  head-max probability per key column (reference ``models/vit.py:126-128``);
* ``cls_attn`` [B,N]      — head-diversity-weighted CLS attention
  (reference ``models/vit.py:95-101``), combined in-kernel once all heads'
  row norms are known.

Layout: q/k/v arrive as [B, H, Dh, N] — tokens on the LANE axis so per-head
HBM slices are 128-aligned for any head_dim that is a multiple of 8 (Mosaic
rejects Dh=64 slices in the last dim).  ``N`` must be a multiple of 128; the
model wrapper pads the token buffer and marks padding dead.

Masking matches :func:`madtp_tpu.ops.attention.attention_core`: dead keys get
exactly-zero probability (-1e30 logits underflow to 0 through the row-max
subtracted exp); an additive per-key bias (text padding) applies before the
softmax.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, alive_ref, bias_ref, qmask_ref,
            o_ref, col_ref, cls_ref,
            qkvh, oh, colmax, clsrows, rownorms, sems, osem,
            *, num_heads: int, scale: float):
    b = pl.program_id(0)

    alive = alive_ref[0, 0, :]  # [N] float 1/0
    bias = bias_ref[0, 0, :]  # [N] additive
    qmask = qmask_ref[0, 0, :]  # [N] float: alive queries excluding row 0

    colmax[:, :] = jnp.zeros_like(colmax)

    # double-buffered per-head qkv staging: slot = h % 2; head h+1's DMA is
    # in flight while head h computes
    def start_fetch(h, slot):
        pltpu.make_async_copy(q_ref.at[b, h], qkvh.at[slot, 0], sems.at[slot]).start()
        pltpu.make_async_copy(k_ref.at[b, h], qkvh.at[slot, 1], sems.at[slot]).start()
        pltpu.make_async_copy(v_ref.at[b, h], qkvh.at[slot, 2], sems.at[slot]).start()

    def wait_fetch(h, slot):
        pltpu.make_async_copy(q_ref.at[b, h], qkvh.at[slot, 0], sems.at[slot]).wait()
        pltpu.make_async_copy(k_ref.at[b, h], qkvh.at[slot, 1], sems.at[slot]).wait()
        pltpu.make_async_copy(v_ref.at[b, h], qkvh.at[slot, 2], sems.at[slot]).wait()

    start_fetch(0, 0)

    def head_body(h, _):
        slot = jax.lax.rem(h, 2)

        @pl.when(h + 1 < num_heads)
        def _():
            start_fetch(h + 1, jax.lax.rem(h + 1, 2))

        wait_fetch(h, slot)
        qh = qkvh[slot, 0]
        kh = qkvh[slot, 1]
        vh = qkvh[slot, 2]

        # qh/kh: [Dh, N]; logits[i, j] = sum_d q[d, i] k[d, j]
        logits = jax.lax.dot_general(
            qh, kh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [N, N]
        logits = logits + bias[None, :]
        logits = jnp.where(alive[None, :] > 0, logits, NEG)

        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=1, keepdims=True)
        p = e / jnp.maximum(s, 1e-30)  # [N, N]; dead keys exactly 0

        # o[d, i] = sum_j v[d, j] p[i, j]
        o = jax.lax.dot_general(
            vh, p.astype(vh.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Dh, N]

        # the previous head's out-DMA must drain before reusing oh
        @pl.when(h > 0)
        def _():
            pltpu.make_async_copy(oh, o_ref.at[b, h - 1], osem).wait()
        oh[:, :] = o.astype(oh.dtype)  # input dtype (bf16 halves out traffic)
        pltpu.make_async_copy(oh, o_ref.at[b, h], osem).start()

        colmax[:, :] = jnp.maximum(colmax[:, :], p)
        clsrows[h, :] = p[0, :]
        rownorms[h, :] = jnp.sqrt(jnp.sum(o * o, axis=0))  # per token (column)
        return 0

    jax.lax.fori_loop(0, num_heads, head_body, 0, unroll=False)
    pltpu.make_async_copy(oh, o_ref.at[b, num_heads - 1], osem).wait()

    # column mass over alive queries, rows >= 1 (CLS row excluded)
    col = jnp.sum(colmax[:, :] * qmask[:, None], axis=0)  # [N]
    col_ref[0, 0, :] = col * alive  # dead key columns exactly 0

    rn = rownorms[:, :]
    head_imp = rn / (jnp.sum(rn, axis=0, keepdims=True) + 1e-8)
    cls = jnp.sum(clsrows[:, :] * head_imp, axis=0)
    cls_ref[0, 0, :] = cls


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def fused_attention_scores(
    q: jnp.ndarray,  # [B, H, Dh, N]  (tokens on lanes)
    k: jnp.ndarray,
    v: jnp.ndarray,
    alive: jnp.ndarray,  # [B, N] bool
    bias: Optional[jnp.ndarray] = None,  # [B, N] additive key bias
    *,
    num_heads: int,
    scale: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (out [B,H,Dh,N] in q.dtype, col_mass [B,N], cls_attn [B,N])."""
    B, H, Dh, N = q.shape
    assert H == num_heads
    af = alive.astype(jnp.float32)
    bf = jnp.zeros_like(af) if bias is None else bias.astype(jnp.float32)
    qm = af.at[:, 0].set(0.0)
    af, bf, qm = (x[:, None, :] for x in (af, bf, qm))

    vec_in = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    out, col, cls = pl.pallas_call(
        functools.partial(_kernel, num_heads=H, scale=scale),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vec_in, vec_in, vec_in,
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            vec_in, vec_in,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Dh, N), q.dtype),
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 3, Dh, N), q.dtype),  # double-buffered qkv stages
            pltpu.VMEM((Dh, N), q.dtype),  # oh (out staging, input dtype)
            pltpu.VMEM((N, N), jnp.float32),  # colmax accumulator
            pltpu.VMEM((H, N), jnp.float32),  # cls rows
            pltpu.VMEM((H, N), jnp.float32),  # row norms
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(q, k, v, af, bf, qm)
    return out, col[:, 0, :], cls[:, 0, :]
