"""Fused attention+scores kernel vs the XLA reference path (interpret mode)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from madtp_tpu.ops.attention import attention_core
from madtp_tpu.ops.pallas.fused_attention import fused_attention_scores


@pytest.mark.parametrize("with_bias", [False, True])
def test_fused_matches_xla(with_bias):
    B, H, N, Dh = 2, 4, 128, 16
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
               for _ in range(3))
    alive = np.ones((B, N), bool)
    alive[0, 20:] = False
    alive[1, 100:] = False
    alive = jnp.asarray(alive)
    bias = None
    if with_bias:
        bias = jnp.asarray(
            (rng.rand(B, N) < 0.2).astype(np.float32) * -10000.0)

    ref_out, aux = attention_core(
        q, k, v,
        attn_bias=None if bias is None else bias[:, None, None, :],
        key_alive=alive, query_alive=alive, need_scores=True,
        scale=Dh ** -0.5,
    )
    qt, kt, vt = (x.transpose(0, 1, 3, 2) for x in (q, k, v))
    out, col, cls = fused_attention_scores(
        qt, kt, vt, alive, bias, num_heads=H, scale=Dh ** -0.5, interpret=True
    )
    out_m = np.asarray(out).transpose(0, 3, 1, 2).reshape(B, N, H * Dh)
    np.testing.assert_allclose(out_m, np.asarray(ref_out), atol=2e-6)
    np.testing.assert_allclose(np.asarray(col)[:, 1:],
                               np.asarray(aux.col_mass), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls)[:, 1:],
                               np.asarray(aux.cls_attn), atol=1e-6)


@pytest.mark.parametrize("with_bias", [False, True])
def test_fused_backward_matches_xla_grads(with_bias):
    """The fused backward kernel (recompute-in-VMEM, two head passes) vs
    jax.grad through the XLA scoring attention — dq/dk/dv/dbias must agree
    within 2e-4 through a scalar loss touching all three outputs (out,
    cls_attn, col_mass)."""
    from madtp_tpu.ops.attention import _xla_attention_scores
    from madtp_tpu.ops.pallas.fused_attention import fused_attention_scores_bwd

    B, H, N, Dh = 2, 4, 128, 16
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
               for _ in range(3))
    alive = np.ones((B, N), bool)
    alive[0, 90:] = False
    alive = jnp.asarray(alive)
    bias = jnp.asarray((rng.rand(B, N) < 0.2).astype(np.float32) * -10000.0
                       if with_bias else np.zeros((B, N), np.float32))
    # random cotangents so every output term contributes
    w_out = jnp.asarray(rng.randn(B, N, H * Dh).astype(np.float32))
    w_cls = jnp.asarray(rng.randn(B, N - 1).astype(np.float32))
    w_col = jnp.asarray(rng.randn(B, N - 1).astype(np.float32))

    def loss(q_, k_, v_, b_):
        out, cls, col = _xla_attention_scores(
            q_, k_, v_, alive, b_, Dh ** -0.5)
        return (jnp.sum(out * w_out) + jnp.sum(cls * w_cls)
                + jnp.sum(col * w_col))

    dq_r, dk_r, dv_r, db_r = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v,
                                                                  bias)

    qt, kt, vt = (x.transpose(0, 1, 3, 2) for x in (q, k, v))
    # cotangents in kernel layout: do [B,H,Dh,N]; dcls/dcol [B,N] (slot 0 =
    # the CLS/key-0 column, excluded from the sliced outputs -> zero)
    do = jnp.transpose(w_out.reshape(B, N, H, Dh), (0, 2, 3, 1))
    z = jnp.zeros((B, 1), jnp.float32)
    dcls = jnp.concatenate([z, w_cls], axis=1)
    dcol = jnp.concatenate([z, w_col], axis=1)
    dq, dk, dv, db = fused_attention_scores_bwd(
        qt, kt, vt, alive, bias, do, dcol, dcls,
        num_heads=H, scale=Dh ** -0.5, interpret=True)

    for ours, ref, name in ((dq, dq_r, "dq"), (dk, dk_r, "dk"),
                            (dv, dv_r, "dv")):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 1, 3, 2), np.asarray(ref),
            atol=2e-4, rtol=1e-3, err_msg=name)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_r), atol=2e-4,
                               rtol=1e-3, err_msg="dbias")


def test_fused_cross_attention_matches_xla():
    """Cross-attention kernel (text queries over a long pruned memory) vs
    attention_core's XLA path — including alive-masked keys and a padding
    key bias; forward in interpret mode."""
    from madtp_tpu.ops.pallas.cross_attention import fused_cross_attention

    B, H, Nq, S, Dh = 2, 4, 16, 256, 16
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, H, Nq, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, Dh).astype(np.float32))
    alive = np.ones((B, S), bool)
    alive[0, 200:] = False
    alive[1, 100:] = False
    alive = jnp.asarray(alive)
    bias = jnp.asarray((rng.rand(B, S) < 0.1).astype(np.float32) * -10000.0)

    ref, _ = attention_core(q, k, v, key_bias=bias, key_alive=alive,
                            scale=Dh ** -0.5, _no_fused=True)
    out = fused_cross_attention(
        q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2),
        v.transpose(0, 1, 3, 2), alive, bias, scale=Dh ** -0.5,
        interpret=True)
    out_m = np.asarray(out).transpose(0, 3, 1, 2).reshape(B, Nq, H * Dh)
    np.testing.assert_allclose(out_m, np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("act_name", ["gelu", "quick_gelu"])
def test_fused_ffn_matches_xla(act_name):
    """Fused FFN kernel vs the XLA mlp — fp32 exact-ish, including the
    row-tile padding path (M not a multiple of TILE_M)."""
    from madtp_tpu.ops.layers import gelu, mlp, quick_gelu
    from madtp_tpu.ops.pallas.fused_ffn import fused_mlp_2d

    act = gelu if act_name == "gelu" else quick_gelu
    M, D, F = 300, 128, 256  # M deliberately not a tile multiple
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(M, D).astype(np.float32))
    p = {
        "fc1": {"kernel": jnp.asarray(rng.randn(D, F).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)},
        "fc2": {"kernel": jnp.asarray(rng.randn(F, D).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)},
    }
    ref = mlp(p, x, act=act)
    out = fused_mlp_2d(x, p["fc1"]["kernel"], p["fc1"]["bias"],
                       p["fc2"]["kernel"], p["fc2"]["bias"], act=act_name,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_ffn_grads_are_xla_grads():
    """_mlp_fused's custom VJP must return exactly the XLA mlp's gradients
    (the backward recomputes the XLA path)."""
    from madtp_tpu.ops import layers
    from madtp_tpu.ops.layers import gelu, mlp

    M, D, F = 64, 128, 256
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, M, D).astype(np.float32))
    p = {
        "fc1": {"kernel": jnp.asarray(rng.randn(D, F).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)},
        "fc2": {"kernel": jnp.asarray(rng.randn(F, D).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)},
    }

    def loss_ref(p_, x_):
        return jnp.sum(jnp.tanh(mlp(p_, x_, act=gelu)))

    def loss_fused(p_, x_):
        # interpret-mode fused forward + custom VJP backward
        y = layers._mlp_fused(p_, x_, "gelu")
        return jnp.sum(jnp.tanh(y))

    # patch the kernel to interpret mode for CPU execution
    import madtp_tpu.ops.pallas.fused_ffn as ffn_mod
    orig = ffn_mod.fused_mlp_2d
    ffn_mod.fused_mlp_2d = functools.partial(orig, interpret=True)
    try:
        gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    finally:
        ffn_mod.fused_mlp_2d = orig
    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(p, x)

    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=1e-5, rtol=1e-5)
    for key in ("fc1", "fc2"):
        for leaf in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(gp_f[key][leaf]), np.asarray(gp_r[key][leaf]),
                atol=1e-5, rtol=1e-5, err_msg=f"{key}.{leaf}")


@pytest.mark.parametrize("with_bias", [False, True])
def test_fused_tiled_matches_xla(with_bias):
    """Query-tiled large-N kernel (VERDICT r2 weak #6): multi-tile run
    (N=256, tile_q=128) must reproduce the XLA scoring attention exactly —
    out, col_mass, cls_attn — including ragged alive masks crossing tile
    boundaries and key-bias padding."""
    from madtp_tpu.ops.pallas.fused_attention import (
        fused_attention_scores_tiled)

    B, H, N, Dh = 2, 4, 256, 16
    rng = np.random.RandomState(5)
    q, k, v = (jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
               for _ in range(3))
    alive = np.ones((B, N), bool)
    alive[0, 150:] = False  # dies inside tile 1
    alive[1, 70:] = False  # dies inside tile 0
    alive = jnp.asarray(alive)
    bias = None
    if with_bias:
        bias = jnp.asarray(
            (rng.rand(B, N) < 0.2).astype(np.float32) * -10000.0)

    ref_out, aux = attention_core(
        q, k, v,
        attn_bias=None if bias is None else bias[:, None, None, :],
        key_alive=alive, query_alive=alive, need_scores=True,
        scale=Dh ** -0.5,
    )
    qt, kt, vt = (x.transpose(0, 1, 3, 2) for x in (q, k, v))
    out, col, cls = fused_attention_scores_tiled(
        qt, kt, vt, alive, bias, num_heads=H, scale=Dh ** -0.5,
        tile_q=128, interpret=True)
    out_m = np.asarray(out).transpose(0, 3, 1, 2).reshape(B, N, H * Dh)
    np.testing.assert_allclose(out_m, np.asarray(ref_out), atol=2e-6)
    np.testing.assert_allclose(np.asarray(col)[:, 1:],
                               np.asarray(aux.col_mass), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls)[:, 1:],
                               np.asarray(aux.cls_attn), atol=1e-6)


def test_fused_tiled_single_tile_matches_full_kernel():
    """At N == tile_q the tiled kernel degenerates to one tile and must
    agree with the full kernel bit-closely."""
    from madtp_tpu.ops.pallas.fused_attention import (
        fused_attention_scores, fused_attention_scores_tiled)

    B, H, N, Dh = 1, 3, 128, 16
    rng = np.random.RandomState(6)
    q, k, v = (jnp.asarray(rng.randn(B, H, Dh, N).astype(np.float32))
               for _ in range(3))
    alive = np.ones((B, N), bool)
    alive[0, 111:] = False
    alive = jnp.asarray(alive)

    o1, c1, l1 = fused_attention_scores(
        q, k, v, alive, None, num_heads=H, scale=Dh ** -0.5, interpret=True)
    o2, c2, l2 = fused_attention_scores_tiled(
        q, k, v, alive, None, num_heads=H, scale=Dh ** -0.5, tile_q=128,
        interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_large_n_dispatch_gates(monkeypatch):
    """Eligibility gates around the tiled kernel: N up to
    FUSED_TILED_MAX_N is fused-eligible, beyond falls back to XLA (the
    backward gate is exercised end-to-end in
    test_fused_forward_tiled_glue_and_bwd_gate)."""
    from madtp_tpu.ops import attention as A

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    alive = jnp.ones((1, 2048), bool)
    q = jnp.zeros((1, 4, 2048, 16), jnp.float32)
    assert A._fused_eligible(q, None, alive, need_scores=True)
    alive_big = jnp.ones((1, A.FUSED_TILED_MAX_N + 128), bool)
    q_big = jnp.zeros((1, 4, A.FUSED_TILED_MAX_N + 128, 16), jnp.float32)
    assert not A._fused_eligible(q_big, None, alive_big, need_scores=True)


def test_fused_forward_tiled_glue_and_bwd_gate(monkeypatch):
    """End-to-end through the production wrapper at a large, NON-tile-
    multiple N: _fused_forward must route to the tiled kernel (512-pad,
    dead-masked padding, cls/col [:, 1:Nq] slicing) and agree with the XLA
    scoring attention; the backward through _fused_scores_diff must take
    the XLA-VJP branch (_needs_tiling — the fused backward has no tiled
    variant; were the gate wrong, the non-interpret Pallas backward would
    error on CPU here) and produce XLA-exact gradients."""
    import functools as ft

    from madtp_tpu.ops import attention as A
    from madtp_tpu.ops.pallas import fused_attention as FA

    assert A._needs_tiling(1560) and not A._needs_tiling(1536)

    # force interpret mode through the production call sites
    monkeypatch.setattr(
        FA, "fused_attention_scores_tiled",
        ft.partial(FA.fused_attention_scores_tiled, interpret=True))
    monkeypatch.setattr(
        FA, "fused_attention_scores",
        ft.partial(FA.fused_attention_scores, interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    B, H, Nq, Dh = 1, 2, 1560, 8
    rng = np.random.RandomState(7)
    q, k, v = (jnp.asarray(rng.randn(B, H, Nq, Dh).astype(np.float32))
               for _ in range(3))
    alive = np.ones((B, Nq), bool)
    alive[0, 1490:] = False
    alive = jnp.asarray(alive)
    bias = jnp.asarray((rng.rand(B, Nq) < 0.1).astype(np.float32) * -1e4)
    scale = Dh ** -0.5

    ref = A._xla_attention_scores(q, k, v, alive, bias, scale)
    got = A._fused_forward(q, k, v, alive, bias, scale)
    for g, r, name, tol in zip(got, (ref[0], ref[1], ref[2]),
                               ("out", "cls", "col"), (5e-6, 5e-6, 5e-6)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=tol,
                                   err_msg=name)

    w_out = jnp.asarray(rng.randn(B, Nq, H * Dh).astype(np.float32))
    w_cls = jnp.asarray(rng.randn(B, Nq - 1).astype(np.float32))
    w_col = jnp.asarray(rng.randn(B, Nq - 1).astype(np.float32))

    def loss(fn, q_, k_, v_, b_):
        o, c, m = fn(q_, k_, v_, alive, b_, scale)
        return (jnp.sum(o * w_out) + jnp.sum(c * w_cls)
                + jnp.sum(m * w_col))

    g_fused = jax.grad(ft.partial(loss, A._fused_scores_diff),
                       argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_xla = jax.grad(ft.partial(loss, A._xla_attention_scores),
                     argnums=(0, 1, 2, 3))(q, k, v, bias)
    for gf, gx, name in zip(g_fused, g_xla, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=1e-5, err_msg=name)


def test_no_fused_attn_escape_hatch(monkeypatch):
    """MADTP_NO_FUSED_ATTN=1 must force the XLA scoring path even on TPU
    (backend-codegen-fault escape hatch, tools/repro_sched_crash.py)."""
    from madtp_tpu.ops import attention as A

    q = jnp.zeros((2, 4, 256, 16), jnp.float32)
    alive = jnp.ones((2, 256), bool)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert A._fused_eligible(q, None, alive, need_scores=True)
    monkeypatch.setenv("MADTP_NO_FUSED_ATTN", "1")
    assert not A._fused_eligible(q, None, alive, need_scores=True)
