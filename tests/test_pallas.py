"""Fused attention+scores kernel vs the XLA reference path (interpret mode)."""

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
