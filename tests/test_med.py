"""MED BERT: text-encoder DTP parity, decoder cache consistency, LM loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from madtp_tpu.core.config import MedConfig
from madtp_tpu.models import med as M
from madtp_tpu.prune.dtp import TokenState
from tests import reference_oracle as oracle

CFG = MedConfig(
    vocab_size=50,
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    encoder_width=32,
    sd_dim=32,
)


def setup(B=2, N=12, seed=0, cfg=CFG):
    rng = np.random.RandomState(seed)
    params = M.init_med_params(cfg, rng)
    ids = rng.randint(1, cfg.vocab_size, size=(B, N))
    mask = np.ones((B, N), np.int32)
    mask[1, -3:] = 0  # sample 1 padded
    sd = rng.randn(7, cfg.sd_dim).astype(np.float32)
    return params, ids, mask, sd, rng


@pytest.mark.parametrize("temperature", [0.0, 1.0])
def test_text_encoder_matches_oracle(temperature):
    params, ids, mask, sd, _ = setup()
    B, N = ids.shape
    prune = temperature > 0
    out = M.med_encoder(
        params, jnp.asarray(ids), jnp.asarray(mask), CFG,
        mode="text", space_dict=jnp.asarray(sd),
        temperature=temperature, prune_active=prune,
    )
    ox, oids, opad, osd_all, okept = oracle.med_text_encoder_np(
        params, ids, mask, CFG, sd=sd, temperature=temperature
    )
    xm = np.asarray(out.state.x)
    alive = np.asarray(out.state.alive)
    if prune:
        np.testing.assert_array_equal(np.asarray(out.kept_counts), np.asarray(okept))
    for b in range(B):
        np.testing.assert_allclose(xm[b, 0], ox[b, 0], rtol=5e-4, atol=5e-4)
        alive_ids = [n for n in range(xm.shape[1] - 1) if alive[b, 1 + n]]
        assert sorted(alive_ids) == sorted(oids[b].tolist())
        for row, oid in enumerate(oids[b]):
            np.testing.assert_allclose(
                xm[b, 1 + oid], ox[b, 1 + row], rtol=1e-3, atol=1e-3,
                err_msg=f"sample {b} token {oid}",
            )
    np.testing.assert_allclose(np.asarray(out.sd_txt_ft), osd_all, rtol=1e-3, atol=1e-3)


def test_decoder_step_matches_full_forward():
    """Incremental decoding with the fixed KV cache must reproduce the
    full-sequence causal forward (same hidden states per position)."""
    params, ids, mask, sd, rng = setup(N=8)
    B, N = ids.shape
    enc = TokenState(
        x=jnp.asarray(rng.randn(B, 10, CFG.hidden_size).astype(np.float32)),
        alive=jnp.ones((B, 10), bool),
        bias=None,
    )
    full_mask = jnp.ones((B, N), jnp.int32)
    h_full = M.med_decoder_forward(params, jnp.asarray(ids), full_mask, CFG,
                                   encoder_state=enc)

    cache = M.init_decode_cache(CFG, B, max_len=N)
    hs = []
    for t in range(N):
        h, cache = M.med_decoder_step(
            params, jnp.asarray(ids[:, t : t + 1]), jnp.int32(t), cache, CFG,
            encoder_state=enc,
        )
        hs.append(np.asarray(h)[:, 0])
    h_step = np.stack(hs, axis=1)
    np.testing.assert_allclose(np.asarray(h_full), h_step, rtol=2e-4, atol=2e-4)


def test_decoder_cross_attn_ignores_dead_encoder_slots():
    """Pruned (dead) image slots must not leak into cross-attention."""
    params, ids, mask, sd, rng = setup(N=6)
    B = ids.shape[0]
    x_enc = rng.randn(B, 10, CFG.hidden_size).astype(np.float32)
    alive = np.ones((B, 10), bool)
    alive[:, 7:] = False
    enc_masked = TokenState(jnp.asarray(x_enc), jnp.asarray(alive), None)
    # physically removing the dead slots must give the same result
    enc_phys = TokenState(
        jnp.asarray(x_enc[:, :7]), jnp.ones((B, 7), bool), None
    )
    fm = jnp.ones_like(jnp.asarray(ids))
    h1 = M.med_decoder_forward(params, jnp.asarray(ids), fm, CFG, encoder_state=enc_masked)
    h2 = M.med_decoder_forward(params, jnp.asarray(ids), fm, CFG, encoder_state=enc_phys)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-5)


def test_lm_loss_matches_torch():
    """Label-smoothed shifted CE vs torch (reference models/med.py:1040-1047)."""
    import torch

    rng = np.random.RandomState(0)
    B, N, V = 3, 7, 11
    logits = rng.randn(B, N, V).astype(np.float32)
    labels = rng.randint(0, V, size=(B, N))
    labels[0, -2:] = -100

    ours = float(M.lm_loss(jnp.asarray(logits), jnp.asarray(labels)))
    tl = torch.tensor(logits)[:, :-1].reshape(-1, V)
    tt = torch.tensor(labels)[:, 1:].reshape(-1)
    ref = torch.nn.CrossEntropyLoss(label_smoothing=0.1)(tl, tt).item()
    assert abs(ours - ref) < 1e-5

    ours_none = np.asarray(M.lm_loss(jnp.asarray(logits), jnp.asarray(labels),
                                     reduction="none"))
    ref_none = torch.nn.CrossEntropyLoss(label_smoothing=0.1, reduction="none")(
        tl, tt
    ).reshape(B, -1)
    # reference sums per sample after masking (-100 rows contribute 0)
    mask = (torch.tensor(labels)[:, 1:] != -100).float()
    ref_none = (ref_none * mask).sum(dim=1).numpy()
    np.testing.assert_allclose(ours_none, ref_none, rtol=1e-5, atol=1e-5)


def test_twin_cross_merges_by_layer_index():
    """NLVR twin cross-attention: avg below merge_start_layer, merge_layer at
    and above (reference models/nlvr_encoder.py:259-271,282)."""
    cfg = MedConfig(
        vocab_size=50, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, encoder_width=32, sd_dim=32,
        twin_cross=True, merge_start_layer=1,
    )
    rng = np.random.RandomState(0)
    params = M.init_med_params(cfg, rng)
    B, N = 2, 6
    ids = rng.randint(1, cfg.vocab_size, size=(B, N))
    mask = np.ones((B, N), np.int32)
    enc0 = TokenState(jnp.asarray(rng.randn(B, 5, 32).astype(np.float32)),
                      jnp.ones((B, 5), bool), None)
    enc1 = TokenState(jnp.asarray(rng.randn(B, 5, 32).astype(np.float32)),
                      jnp.ones((B, 5), bool), None)
    out = M.med_encoder(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg,
        mode="multimodal", encoder_state=enc0, encoder_state1=enc1,
    )
    assert out.state.x.shape == (B, N, 32)
    assert np.all(np.isfinite(np.asarray(out.state.x)))
    # swapping the two images must change the result when streams differ
    out_sw = M.med_encoder(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg,
        mode="multimodal", encoder_state=enc1, encoder_state1=enc0,
    )
    assert not np.allclose(np.asarray(out.state.x), np.asarray(out_sw.state.x))


def test_med_gather_mode_matches_mask_mode():
    """Gather fast path on the text encoder (with padding + merged-bias
    inheritance) must reproduce mask-mode surviving tokens."""
    params, ids, mask, sd, _ = setup(N=14)
    T = 1.0
    out_m = M.med_encoder(
        params, jnp.asarray(ids), jnp.asarray(mask), CFG,
        mode="text", space_dict=jnp.asarray(sd), temperature=T,
        prune_active=True,
    )
    caps = tuple([ids.shape[1] + 2] * CFG.num_hidden_layers)
    out_g = M.med_encoder(
        params, jnp.asarray(ids), jnp.asarray(mask), CFG,
        mode="text", space_dict=jnp.asarray(sd), temperature=T,
        prune_active=True, capacities=caps,
    )
    np.testing.assert_array_equal(np.asarray(out_m.kept_counts),
                                  np.asarray(out_g.kept_counts))
    np.testing.assert_allclose(np.asarray(out_m.sd_txt_ft),
                               np.asarray(out_g.sd_txt_ft), rtol=2e-4, atol=2e-4)
    xm, am = np.asarray(out_m.state.x), np.asarray(out_m.state.alive)
    xg, ag = np.asarray(out_g.state.x), np.asarray(out_g.state.alive)
    bm, bg = np.asarray(out_m.state.bias), np.asarray(out_g.state.bias)
    for b in range(xm.shape[0]):
        np.testing.assert_allclose(xm[b, 0], xg[b, 0], rtol=2e-4, atol=2e-4)
        m_rows = sorted(
            (tuple(np.round(xm[b, s], 4)) + (bm[b, s],))
            for s in range(1, xm.shape[1]) if am[b, s])
        g_rows = sorted(
            (tuple(np.round(xg[b, s], 4)) + (bg[b, s],))
            for s in range(1, xg.shape[1]) if ag[b, s])
        assert len(m_rows) == len(g_rows)
        for mr, gr in zip(m_rows, g_rows):
            np.testing.assert_allclose(mr, gr, rtol=5e-3, atol=5e-3)
