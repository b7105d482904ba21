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


def _bwd_kernel(q_ref, k_ref, v_ref, alive_ref, bias_ref, qmask_ref,
                do_ref, dcol_ref, dcls_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref,
                qkvh, stage_out, colmax, ties, rn, clsrows,
                sems, osem,
                *, num_heads: int, scale: float):
    """Backward of :func:`_kernel` — all [N,N] intermediates stay in VMEM.

    Two head passes: A recomputes every head's probabilities to accumulate
    the cross-head reductions the cotangents need (colmax + tie counts for
    the col_mass max, row norms + CLS rows for the head-importance
    weighting); B recomputes per-head probabilities once more and emits
    dq/dk/dv/dbias.  Recompute-in-VMEM trades ~2 extra matmuls per head for
    never materializing [B,H,N,N] in HBM (the XLA-VJP fallback's cost)."""
    b = pl.program_id(0)

    alive = alive_ref[0, 0, :]  # [N] 1/0
    bias = bias_ref[0, 0, :]
    qmask = qmask_ref[0, 0, :]  # alive queries excluding row 0
    dcol = dcol_ref[0, 0, :]
    dcls = dcls_ref[0, 0, :]

    def start_fetch(h, slot, with_do):
        pltpu.make_async_copy(q_ref.at[b, h], qkvh.at[slot, 0], sems.at[slot]).start()
        pltpu.make_async_copy(k_ref.at[b, h], qkvh.at[slot, 1], sems.at[slot]).start()
        pltpu.make_async_copy(v_ref.at[b, h], qkvh.at[slot, 2], sems.at[slot]).start()
        if with_do:
            pltpu.make_async_copy(do_ref.at[b, h], qkvh.at[slot, 3], sems.at[slot]).start()

    def wait_fetch(h, slot, with_do):
        pltpu.make_async_copy(q_ref.at[b, h], qkvh.at[slot, 0], sems.at[slot]).wait()
        pltpu.make_async_copy(k_ref.at[b, h], qkvh.at[slot, 1], sems.at[slot]).wait()
        pltpu.make_async_copy(v_ref.at[b, h], qkvh.at[slot, 2], sems.at[slot]).wait()
        if with_do:
            pltpu.make_async_copy(do_ref.at[b, h], qkvh.at[slot, 3], sems.at[slot]).wait()

    def probs(qh, kh):
        logits = jax.lax.dot_general(
            qh, kh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = logits + bias[None, :]
        logits = jnp.where(alive[None, :] > 0, logits, NEG)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        return e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)

    # ---- pass A: cross-head reductions ----
    colmax[:, :] = jnp.zeros_like(colmax)
    start_fetch(0, 0, False)

    def pass_a(h, _):
        slot = jax.lax.rem(h, 2)

        @pl.when(h + 1 < num_heads)
        def _():
            start_fetch(h + 1, jax.lax.rem(h + 1, 2), False)

        wait_fetch(h, slot, False)
        p = probs(qkvh[slot, 0], qkvh[slot, 1])
        o = jax.lax.dot_general(
            qkvh[slot, 2], p.astype(qkvh.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Dh, N]
        colmax[:, :] = jnp.maximum(colmax[:, :], p)
        clsrows[h, :] = p[0, :]
        rn[h, :] = jnp.sqrt(jnp.sum(o * o, axis=0))
        return 0

    jax.lax.fori_loop(0, num_heads, pass_a, 0, unroll=False)

    # tie counts for the col max (XLA's reduce_max grad splits ties evenly)
    ties[:, :] = jnp.zeros_like(ties)
    start_fetch(0, 0, False)

    def pass_t(h, _):
        slot = jax.lax.rem(h, 2)

        @pl.when(h + 1 < num_heads)
        def _():
            start_fetch(h + 1, jax.lax.rem(h + 1, 2), False)

        wait_fetch(h, slot, False)
        p = probs(qkvh[slot, 0], qkvh[slot, 1])
        ties[:, :] = ties[:, :] + (p >= colmax[:, :]).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_heads, pass_t, 0, unroll=False)

    # head-importance pieces (S = sum_h rn, C = sum_h clsrow*rn)
    S = jnp.sum(rn[:, :], axis=0) + 1e-8  # [N]
    C = jnp.sum(clsrows[:, :] * rn[:, :], axis=0)  # [N]

    dbias_acc = jnp.zeros_like(bias)

    # ---- pass B: per-head gradients ----
    start_fetch(0, 0, True)

    def pass_b(h, dbias_acc):
        slot = jax.lax.rem(h, 2)

        @pl.when(h + 1 < num_heads)
        def _():
            start_fetch(h + 1, jax.lax.rem(h + 1, 2), True)

        wait_fetch(h, slot, True)
        qh = qkvh[slot, 0]
        kh = qkvh[slot, 1]
        vh = qkvh[slot, 2]
        doh = qkvh[slot, 3].astype(jnp.float32)  # [Dh, N]

        p = probs(qh, kh)
        o = jax.lax.dot_general(
            vh, p.astype(vh.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Dh, N]

        # d rn from the cls head-importance weighting:
        # imp_h'[j] = rn_h'[j]/S[j]; cls[j] = sum_h' clsrow_h'[j] imp_h'[j]
        # => d rn_h[j] = dcls[j] * (clsrow_h[j]*S[j] - C[j]) / S[j]^2
        rnh = rn[h, :]
        drn = dcls * (clsrows[h, :] * S - C) / (S * S)
        do2 = o * (drn / jnp.maximum(rnh, 1e-30))[None, :]
        do_eff = doh + do2  # [Dh, N]

        # dv[d,j] = sum_i do_eff[d,i] p[i,j]
        dv = jax.lax.dot_general(
            do_eff, p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Dh, N]
        # dp[i,j] = sum_d v[d,j] do_eff[d,i]
        dp = jax.lax.dot_general(
            do_eff, vh.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N_i, N_j]
        # col_mass cotangent through the head max (ties split evenly)
        is_max = (p >= colmax[:, :]).astype(jnp.float32)
        dp = dp + (qmask[:, None] * dcol[None, :]) * is_max / ties[:, :]
        # cls row cotangent: dp[0,:] += dcls * imp_h
        row0 = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) == 0)
        dp = dp + jnp.where(row0, (dcls * rnh / S)[None, :], 0.0)

        # softmax backward (masked p already zero at dead keys)
        dlog = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))

        # dq[d,i] = scale * sum_j k[d,j] dlog[i,j]
        dq = jax.lax.dot_general(
            kh.astype(jnp.float32), dlog, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        # dk[d,j] = scale * sum_i q[d,i] dlog[i,j]
        dk = jax.lax.dot_general(
            qh.astype(jnp.float32), dlog, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

        @pl.when(h > 0)
        def _():
            pltpu.make_async_copy(stage_out.at[0], dq_ref.at[b, h - 1], osem).wait()
            pltpu.make_async_copy(stage_out.at[1], dk_ref.at[b, h - 1], osem).wait()
            pltpu.make_async_copy(stage_out.at[2], dv_ref.at[b, h - 1], osem).wait()

        stage_out[0, :, :] = dq.astype(stage_out.dtype)
        stage_out[1, :, :] = dk.astype(stage_out.dtype)
        stage_out[2, :, :] = dv.astype(stage_out.dtype)
        pltpu.make_async_copy(stage_out.at[0], dq_ref.at[b, h], osem).start()
        pltpu.make_async_copy(stage_out.at[1], dk_ref.at[b, h], osem).start()
        pltpu.make_async_copy(stage_out.at[2], dv_ref.at[b, h], osem).start()

        return dbias_acc + jnp.sum(dlog, axis=0)

    dbias_acc = jax.lax.fori_loop(0, num_heads, pass_b, dbias_acc,
                                  unroll=False)
    pltpu.make_async_copy(stage_out.at[0], dq_ref.at[b, num_heads - 1], osem).wait()
    pltpu.make_async_copy(stage_out.at[1], dk_ref.at[b, num_heads - 1], osem).wait()
    pltpu.make_async_copy(stage_out.at[2], dv_ref.at[b, num_heads - 1], osem).wait()
    dbias_ref[0, 0, :] = dbias_acc


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def fused_attention_scores_bwd(
    q: jnp.ndarray,  # [B, H, Dh, N]
    k: jnp.ndarray,
    v: jnp.ndarray,
    alive: jnp.ndarray,  # [B, N] bool
    bias: Optional[jnp.ndarray],  # [B, N] or None
    do: jnp.ndarray,  # [B, H, Dh, N] cotangent of out
    dcol: jnp.ndarray,  # [B, N]
    dcls: jnp.ndarray,  # [B, N]
    *,
    num_heads: int,
    scale: float,
    interpret: bool = False,
):
    """Returns (dq, dk, dv [B,H,Dh,N] fp32, dbias [B,N] fp32)."""
    B, H, Dh, N = q.shape
    assert H == num_heads
    af = alive.astype(jnp.float32)
    bf = jnp.zeros_like(af) if bias is None else bias.astype(jnp.float32)
    qm = af.at[:, 0].set(0.0)
    af, bf, qm, dcolp, dclsp = (
        x[:, None, :] for x in (af, bf, qm, dcol.astype(jnp.float32),
                                dcls.astype(jnp.float32)))

    vec_in = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=H, scale=scale),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vec_in, vec_in, vec_in,
            pl.BlockSpec(memory_space=pl.ANY),
            vec_in, vec_in,
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vec_in,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Dh, N), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Dh, N), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Dh, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4, Dh, N), q.dtype),  # qkv + do staging
            pltpu.VMEM((3, Dh, N), jnp.float32),  # dq/dk/dv out staging
            pltpu.VMEM((N, N), jnp.float32),  # colmax
            pltpu.VMEM((N, N), jnp.float32),  # tie counts
            pltpu.VMEM((num_heads, N), jnp.float32),  # row norms
            pltpu.VMEM((num_heads, N), jnp.float32),  # cls rows
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(q, k, v, af, bf, qm, do, dcolp, dclsp)
    return dq, dk, dv, dbias[:, 0, :]


def _kernel_tiled(q_ref, k_ref, v_ref, alive_ref, bias_ref, qmask_ref,
                  o_ref, col_ref, cls_ref,
                  kvh, qh, oh, ptile, clsrows, clstile, rownorms, colparts,
                  sems, osem,
                  *, num_heads: int, scale: float, tq: int, num_tiles: int):
    """Query-tiled variant of :func:`_kernel` for large N.

    The full kernel holds a [N,N] fp32 colmax accumulator in VMEM, which
    caps N (~1536 under the 100 MB budget with the rest of the scratch).
    Here the query axis is processed in tiles of ``tq``: the per-tile
    colmax is only [tq, N], the column-mass and output accumulate across
    tiles, and K/V are re-fetched per tile (num_tiles x H extra K/V HBM
    reads — still far below the [B,H,N,N] probability round trip the XLA
    fallback pays at these sizes).  Loop order is tile-major, head-minor so
    the cross-head max sits innermost over the resident tile.

    Mosaic gotchas (hit on real hardware, some invisible in interpret
    mode): vector loads/stores with a DYNAMIC lane offset silently produce
    wrong values, and lane-axis slicing/concatenation beyond the first
    128-lane tile is unimplemented ("Input offsets outside of the first
    tile").  Every cross-tile carrier below therefore uses only
    leading-dim indexing with lane-offset-0 rows (rownorms keyed by the
    flattened loop index, per-tile col partials in ``colparts``), the
    per-tile qmask arrives pre-reshaped as [T, tq], clsrows are re-sliced
    per tile with a DMA (DMAs handle arbitrary offsets), and the cls
    output is written as [T, tq] blocks at static tile indices.
    """
    b = pl.program_id(0)

    alive = alive_ref[0, 0, :]  # [N]
    bias = bias_ref[0, 0, :]

    total = num_tiles * num_heads
    hpad = ((num_heads + 7) // 8) * 8

    def split(idx):
        return jax.lax.div(idx, num_heads), jax.lax.rem(idx, num_heads)

    def start_fetch(idx, slot):
        t, h = split(idx)
        pltpu.make_async_copy(
            q_ref.at[b, h, :, pl.ds(t * tq, tq)], qh.at[slot],
            sems.at[slot]).start()
        pltpu.make_async_copy(k_ref.at[b, h], kvh.at[slot, 0],
                              sems.at[slot]).start()
        pltpu.make_async_copy(v_ref.at[b, h], kvh.at[slot, 1],
                              sems.at[slot]).start()

    def wait_fetch(idx, slot):
        t, h = split(idx)
        pltpu.make_async_copy(
            q_ref.at[b, h, :, pl.ds(t * tq, tq)], qh.at[slot],
            sems.at[slot]).wait()
        pltpu.make_async_copy(k_ref.at[b, h], kvh.at[slot, 0],
                              sems.at[slot]).wait()
        pltpu.make_async_copy(v_ref.at[b, h], kvh.at[slot, 1],
                              sems.at[slot]).wait()

    def out_copy(idx):
        t, h = split(idx)
        return pltpu.make_async_copy(
            oh, o_ref.at[b, h, :, pl.ds(t * tq, tq)], osem)

    start_fetch(0, 0)

    def body(idx, _):
        slot = jax.lax.rem(idx, 2)
        t, h = split(idx)

        @pl.when(idx + 1 < total)
        def _():
            start_fetch(idx + 1, jax.lax.rem(idx + 1, 2))

        wait_fetch(idx, slot)
        qt = qh[slot]  # [Dh, tq]
        kh = kvh[slot, 0]  # [Dh, N]
        vh = kvh[slot, 1]

        logits = jax.lax.dot_general(
            qt, kh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [tq, N]
        logits = logits + bias[None, :]
        logits = jnp.where(alive[None, :] > 0, logits, NEG)

        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=1, keepdims=True)
        p = e / jnp.maximum(s, 1e-30)  # [tq, N]

        o = jax.lax.dot_general(
            vh, p.astype(vh.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Dh, tq]

        @pl.when(idx > 0)
        def _():
            out_copy(idx - 1).wait()
        oh[:, :] = o.astype(oh.dtype)
        out_copy(idx).start()

        @pl.when(h == 0)
        def _():
            ptile[:, :] = p

        @pl.when(h > 0)
        def _():
            ptile[:, :] = jnp.maximum(ptile[:, :], p)

        # per-(tile, head) row norms in 8-aligned per-tile row blocks —
        # tile-local [tq] rows at lane offset 0
        rownorms[t * hpad + h, :] = jnp.sqrt(jnp.sum(o * o, axis=0))

        @pl.when(t == 0)
        def _():
            clsrows[h, :] = p[0, :]

        @pl.when(h == num_heads - 1)
        def _():
            qm_t = qmask_ref[0, t, :]  # [tq] (dynamic leading index)
            colparts[t, :] = jnp.sum(ptile[:, :] * qm_t[:, None], axis=0)

        return 0

    jax.lax.fori_loop(0, total, body, 0, unroll=False)
    out_copy(total - 1).wait()

    # column mass: sum the per-tile partials along sublanes (no offsets)
    col_ref[0, 0, :] = jnp.sum(colparts[:, :], axis=0) * alive

    # head-importance combine per tile: S = sum_h rn,
    # cls = (sum_h clsrow*rn) / (S+eps); clsrows' tile slice arrives via
    # DMA and rows >= num_heads (scratch padding, possibly garbage) are
    # masked out of every reduction
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (hpad, tq), 0)
               < num_heads)
    for t in range(num_tiles):
        cp = pltpu.make_async_copy(
            clsrows.at[:, pl.ds(t * tq, tq)], clstile, osem)
        cp.start()
        cp.wait()
        rn_t = jnp.where(rowmask, rownorms[t * hpad:(t + 1) * hpad, :], 0.0)
        C_t = jnp.sum(jnp.where(rowmask, clstile[:, :] * rn_t, 0.0), axis=0)
        S_t = jnp.sum(rn_t, axis=0)
        cls_ref[0, t, :] = C_t / (S_t + 1e-8)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "tile_q", "interpret"))
def fused_attention_scores_tiled(
    q: jnp.ndarray,  # [B, H, Dh, N]  (tokens on lanes)
    k: jnp.ndarray,
    v: jnp.ndarray,
    alive: jnp.ndarray,  # [B, N] bool
    bias: Optional[jnp.ndarray] = None,
    *,
    num_heads: int,
    scale: float,
    tile_q: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Query-tiled :func:`fused_attention_scores` for N beyond the full
    kernel's VMEM cap.  Same outputs; requires ``N % tile_q == 0`` and
    ``tile_q`` a lane multiple (the :mod:`madtp_tpu.ops.attention` wrapper
    pads to both)."""
    B, H, Dh, N = q.shape
    assert H == num_heads
    assert N % tile_q == 0 and tile_q % 128 == 0, (N, tile_q)
    num_tiles = N // tile_q
    af = alive.astype(jnp.float32)
    bf = jnp.zeros_like(af) if bias is None else bias.astype(jnp.float32)
    # qmask pre-reshaped per tile so the kernel only ever loads it with a
    # dynamic LEADING index (dynamic lane offsets miscompile on Mosaic)
    qm = af.at[:, 0].set(0.0).reshape(B, num_tiles, tile_q)
    af, bf = (x[:, None, :] for x in (af, bf))

    vec_in = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    qm_in = pl.BlockSpec((1, num_tiles, tile_q), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    hpad = ((H + 7) // 8) * 8
    out, col, cls = pl.pallas_call(
        functools.partial(_kernel_tiled, num_heads=H, scale=scale,
                          tq=tile_q, num_tiles=num_tiles),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vec_in, vec_in, qm_in,
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            vec_in, qm_in,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Dh, N), q.dtype),
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, num_tiles, tile_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, Dh, N), q.dtype),  # double-buffered k/v
            pltpu.VMEM((2, Dh, tile_q), q.dtype),  # double-buffered q tile
            pltpu.VMEM((Dh, tile_q), q.dtype),  # out staging
            pltpu.VMEM((tile_q, N), jnp.float32),  # per-tile colmax
            pltpu.VMEM((hpad, N), jnp.float32),  # cls rows
            pltpu.VMEM((hpad, tile_q), jnp.float32),  # cls-row tile slice
            pltpu.VMEM((num_tiles * hpad, tile_q), jnp.float32),  # row norms
            pltpu.VMEM((num_tiles, N), jnp.float32),  # per-tile col partials
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(q, k, v, af, bf, qm)
    return out, col[:, 0, :], cls.reshape(B, N)


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
