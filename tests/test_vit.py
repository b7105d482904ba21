"""ViT with DTP: static masked forward vs dynamic-shape oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from madtp_tpu.core.config import ViTConfig
from madtp_tpu.models.vit import vit_forward, init_vit_params
from tests import reference_oracle as oracle

CFG = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=4, sd_dim=32)


def setup(B=2, K=5, seed=0):
    rng = np.random.RandomState(seed)
    params = init_vit_params(CFG, rng)
    images = rng.randn(B, 3, CFG.image_size, CFG.image_size).astype(np.float32)
    sd = rng.randn(K, CFG.sd_dim).astype(np.float32)
    return params, images, sd


@pytest.mark.parametrize("temperature", [0.0, 1.0])
def test_vit_matches_oracle(temperature):
    params, images, sd = setup()
    B = images.shape[0]
    prune = temperature > 0
    state, sd_all, kept = vit_forward(
        {k: jnp.asarray(v) if not isinstance(v, dict) else v for k, v in params.items()},
        jnp.asarray(images),
        cfg=CFG,
        space_dict=jnp.asarray(sd),
        temperature=temperature,
        prune_active=prune,
    )
    ox, ids, osd_all, okept = oracle.vit_forward_np(
        params, images, CFG, sd=sd, temperature=temperature
    )

    xm, alive = np.asarray(state.x), np.asarray(state.alive)
    P0 = CFG.num_patches
    if prune:
        np.testing.assert_array_equal(np.asarray(kept), np.asarray(okept))
    for b in range(B):
        np.testing.assert_allclose(xm[b, 0], ox[b, 0], rtol=2e-4, atol=2e-4)
        alive_ids = [n for n in range(xm.shape[1] - 1) if alive[b, 1 + n]]
        assert sorted(alive_ids) == sorted(ids[b].tolist())
        for row, oid in enumerate(ids[b]):
            np.testing.assert_allclose(
                xm[b, 1 + oid], ox[b, 1 + row], rtol=5e-4, atol=5e-4,
                err_msg=f"sample {b} token {oid}",
            )
    np.testing.assert_allclose(np.asarray(sd_all), osd_all, rtol=5e-4, atol=5e-4)


def test_vit_jit_stable_across_temperatures():
    """One compilation serves all temperatures (the controller's bang-bang
    updates never recompile)."""
    import jax

    params, images, sd = setup()
    traces = []

    @jax.jit
    def run(images, sd, t):
        traces.append(1)
        state, sd_all, kept = vit_forward(
            params, images, cfg=CFG, space_dict=sd, temperature=t, prune_active=True
        )
        return state.x, kept

    x1, k1 = run(jnp.asarray(images), jnp.asarray(sd), jnp.float32(0.7))
    x2, k2 = run(jnp.asarray(images), jnp.asarray(sd), jnp.float32(2.3))
    assert len(traces) == 1
    assert x1.shape == x2.shape


def test_gather_mode_matches_mask_mode():
    """Gather fast path with generous capacities must reproduce mask-mode
    results: same CLS feature, same multiset of surviving token features,
    same kept counts."""
    import jax

    params, images, sd = setup()
    jp = jax.tree.map(jnp.asarray, params)
    T = 1.0
    st_m, sd_m, kept_m = vit_forward(
        jp, jnp.asarray(images), cfg=CFG, space_dict=jnp.asarray(sd),
        temperature=T, prune_active=True,
    )
    caps = tuple([CFG.num_patches + 2] * CFG.depth)  # generous
    st_g, sd_g, kept_g = vit_forward(
        jp, jnp.asarray(images), cfg=CFG, space_dict=jnp.asarray(sd),
        temperature=T, prune_active=True, capacities=caps,
    )
    np.testing.assert_array_equal(np.asarray(kept_m), np.asarray(kept_g))
    np.testing.assert_allclose(np.asarray(sd_m), np.asarray(sd_g), rtol=2e-4, atol=2e-4)
    xm, am = np.asarray(st_m.x), np.asarray(st_m.alive)
    xg, ag = np.asarray(st_g.x), np.asarray(st_g.alive)
    for b in range(xm.shape[0]):
        np.testing.assert_allclose(xm[b, 0], xg[b, 0], rtol=2e-4, atol=2e-4)
        m_set = sorted(tuple(np.round(xm[b, s], 4)) for s in range(1, xm.shape[1]) if am[b, s])
        g_set = sorted(tuple(np.round(xg[b, s], 4)) for s in range(1, xg.shape[1]) if ag[b, s])
        assert len(m_set) == len(g_set)
        for mv, gv in zip(m_set, g_set):
            np.testing.assert_allclose(mv, gv, rtol=5e-3, atol=5e-3)


def test_gather_tight_capacity_overflow_merges():
    """A deliberately tight capacity folds overflow into the merged token and
    still produces finite outputs (no silent corruption)."""
    params, images, sd = setup()
    import jax
    jp = jax.tree.map(jnp.asarray, params)
    caps = tuple([8] * CFG.depth)  # much tighter than kept counts
    st, sd_all, kept = vit_forward(
        jp, jnp.asarray(images), cfg=CFG, space_dict=jnp.asarray(sd),
        temperature=1.0, prune_active=True, capacities=caps,
    )
    assert st.x.shape[1] == 8
    assert np.all(np.isfinite(np.asarray(st.x)))
    assert np.asarray(kept).max() <= 7


def test_grad_checkpoint_same_grads():
    """vit_grad_ckpt equivalent: remat changes memory, not values/grads."""
    import jax
    from dataclasses import replace

    params, images, sd = setup()
    jp = jax.tree.map(jnp.asarray, params)

    def make_loss(cfg):
        def loss(p):
            st, sd_all, _ = vit_forward(
                p, jnp.asarray(images), cfg=cfg, space_dict=jnp.asarray(sd),
                temperature=1.0, prune_active=True)
            return jnp.sum(st.x ** 2) + jnp.sum(sd_all ** 2)
        return loss

    g0 = jax.grad(make_loss(CFG))(jp)
    # all blocks, last-1 block (vit_ckpt_layer=1, reference models/vit.py:255
    # last-N semantics), and the grad_ckpt=True + ckpt_layer=0 -> no-remat
    # quirk: values/grads identical in every mode
    for kw in ({"grad_checkpoint": True},
               {"grad_checkpoint": True, "ckpt_layers": 1},
               {"grad_checkpoint": True, "ckpt_layers": 0}):
        g1 = jax.grad(make_loss(replace(CFG, **kw)))(jp)
        a = jax.tree_util.tree_leaves(g0)
        b = jax.tree_util.tree_leaves(g1)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-5)
