"""DTP core: static masked implementation vs dynamic-shape NumPy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from madtp_tpu.ops.attention import attention_core, _split_heads
from madtp_tpu.prune.query import query_model
from madtp_tpu.prune.dtp import (
    TokenState,
    DTPSignals,
    dtp_prune,
    init_token_state,
    compact,
)
from tests import reference_oracle as oracle


def make_inputs(B=3, P=24, D=32, H=4, K=10, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, 1 + P, D).astype(np.float32) * 0.5
    wq, wk, wv = (rng.randn(D, D).astype(np.float32) * (D ** -0.5) for _ in range(3))
    sd = rng.randn(K, D).astype(np.float32)
    return x, wq, wk, wv, sd


def masked_layer(state, wq, wk, wv, sd, temperature, merge_slot, num_heads):
    """One simplified layer in the masked framework: MAG -> attention ->
    replace x with attention output -> DTP prune (mirrors the signal flow of
    reference models/vit.py:295-307 without norms/residuals)."""
    token_attn, sd_ft = query_model(
        None, state.x[:, 1:], sd, alive=state.alive[:, 1:]
    )
    qh = _split_heads(jnp.einsum("bnd,de->bne", state.x, wq), num_heads)
    kh = _split_heads(jnp.einsum("bnd,de->bne", state.x, wk), num_heads)
    vh = _split_heads(jnp.einsum("bnd,de->bne", state.x, wv), num_heads)
    out, aux = attention_core(
        qh, kh, vh,
        key_alive=state.alive,
        query_alive=state.alive,
        need_scores=True,
    )
    state = TokenState(x=out, alive=state.alive, bias=state.bias)
    signals = DTPSignals(
        cls_attn=aux.cls_attn, col_mass=aux.col_mass, token_attn=token_attn
    )
    new_state, kept = dtp_prune(state, signals, temperature, merge_slot)
    return new_state, kept, sd_ft


def oracle_layer(x, wq, wk, wv, sd, temperature, num_heads):
    token_attn, sd_ft = oracle.query_model_np(x[:, 1:], sd)
    out, probs, per_head = oracle.attention_with_scores(x, wq, wk, wv, num_heads)
    cls_attn = oracle.cls_attn_signal(probs, per_head)
    new_patches, kept_ids, applied = oracle.reduce_token_np(
        out[:, 1:], probs, cls_attn, token_attn, temperature
    )
    new_x = np.concatenate([out[:, :1], new_patches], axis=1)
    return new_x, kept_ids, applied, sd_ft


@pytest.mark.parametrize("temperature", [0.5, 2.0])
def test_masked_matches_oracle_two_layers(temperature):
    B, P, D, H, K = 3, 24, 32, 4, 10
    x, wq, wk, wv, sd = make_inputs(B, P, D, H, K)
    depth = 2

    # --- masked static path ---
    state = init_token_state(jnp.asarray(x), depth=depth)
    # identity[s] = original patch id for slot s (slot 1+n -> patch n,
    # merge slot for layer l -> P + l)
    merge_ids = [P, P + 1]

    # --- oracle dynamic path; ids[b][row] = original patch id of that row ---
    ox = x.copy()
    ids = [np.arange(P) for _ in range(B)]

    for layer in range(depth):
        merge_slot = 1 + P + layer
        state, kept, sd_ft = masked_layer(
            state, jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv),
            jnp.asarray(sd), temperature, merge_slot, H,
        )
        ox, kept_ids, applied, sd_ft_np = oracle_layer(
            ox, wq, wk, wv, sd, temperature, H
        )
        if applied:
            ids = [
                np.concatenate([ids[b][kept_ids[b]], [merge_ids[layer]]])
                for b in range(B)
            ]

        # alive set must match the oracle's surviving identities
        alive = np.asarray(state.alive)
        xm = np.asarray(state.x)
        for b in range(B):
            alive_ids = sorted(
                ([] if not alive[b, 0] else []) +
                [n for n in range(P) if alive[b, 1 + n]] +
                [merge_ids[l] for l in range(depth) if alive[b, 1 + P + l]]
            )
            assert alive_ids == sorted(ids[b].tolist()), (
                f"layer {layer} sample {b}: alive set mismatch"
            )
            # feature parity per identity
            np.testing.assert_allclose(
                xm[b, 0], ox[b, 0], rtol=2e-5, atol=2e-5
            )  # CLS
            for row, oid in enumerate(ids[b]):
                slot = 1 + oid if oid < P else 1 + P + (oid - P)
                np.testing.assert_allclose(
                    xm[b, slot], ox[b, 1 + row], rtol=3e-4, atol=3e-4,
                    err_msg=f"layer {layer} sample {b} token {oid}",
                )
        # sd_ft parity (MAG pooled features; computed pre-prune each layer)
        np.testing.assert_allclose(
            np.asarray(sd_ft), sd_ft_np, rtol=3e-4, atol=3e-4
        )
        # oracle keeps batch-uniform counts; check ours agrees
        assert int(kept) == ox.shape[1] - 1


def test_guard_skips_pruning():
    """Huge threshold-temperature -> near-uniform soft weights; craft signals
    so every token clears the threshold -> reduce_num <= 1 -> no-op."""
    B, P, D, K = 2, 8, 16, 5
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, 1 + P, D).astype(np.float32))
    state = init_token_state(x, depth=1)
    S1 = state.x.shape[1] - 1  # signals cover all non-CLS slots incl. merge slots
    signals = DTPSignals(
        cls_attn=jnp.ones((B, S1)) / P,
        col_mass=jnp.ones((B, S1)),
        token_attn=jnp.zeros((B, S1, K)),  # uniform -> thr == mean == score
    )
    new_state, kept = dtp_prune(state, signals, 1.0, merge_slot=1 + P)
    # score uniform -> nothing strictly above threshold -> topk_num = 0 -> skip
    assert int(kept) == P
    np.testing.assert_array_equal(np.asarray(new_state.alive), np.asarray(state.alive))
    np.testing.assert_allclose(np.asarray(new_state.x), np.asarray(state.x))


def test_batch_coupling_keeps_batch_max():
    """A sample with few above-threshold tokens still keeps the batch-max
    count (reference models/vit.py:145 batch .item() semantics)."""
    B, P, D, K = 2, 10, 8, 4
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, 1 + P, D).astype(np.float32))
    state = init_token_state(x, depth=1)
    # sample 0: 6 strong tokens; sample 1: 2 strong tokens
    S1 = state.x.shape[1] - 1
    cls = np.full((B, S1), 0.01, np.float32)
    cls[0, :6] = 1.0
    cls[1, :2] = 1.0
    signals = DTPSignals(
        cls_attn=jnp.asarray(cls),
        col_mass=jnp.asarray(cls),
        token_attn=jnp.asarray(
            np.broadcast_to(cls[:, :, None], (B, S1, K)).copy()
        ),
    )
    new_state, kept = dtp_prune(state, signals, 1.0, merge_slot=1 + P)
    counts = np.asarray(new_state.alive)[:, 1 : 1 + P].sum(axis=1)
    assert counts[0] == counts[1], "keep counts must be batch-uniform"
    assert int(kept) == counts[0] + 1  # + merged token


def test_compact_preserves_alive_tokens():
    B, P, D = 2, 12, 8
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, 1 + P, D).astype(np.float32))
    state = init_token_state(x, depth=0)
    # kill every other patch
    alive = np.ones((B, 1 + P), bool)
    alive[:, 2::2] = False
    state = TokenState(state.x, jnp.asarray(alive), None)
    cap = 1 + P // 2 + 1
    cstate, idx = compact(state, cap)
    assert cstate.x.shape == (B, cap, D)
    xm = np.asarray(cstate.x)
    am = np.asarray(cstate.alive)
    orig = np.asarray(state.x)
    for b in range(B):
        live_slots = [s for s in range(1 + P) if alive[b, s]]
        got = [tuple(np.round(xm[b, i], 5)) for i in range(cap) if am[b, i]]
        want = [tuple(np.round(orig[b, s], 5)) for s in live_slots]
        assert sorted(got) == sorted(want)
