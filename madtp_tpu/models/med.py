"""MED: BERT-style mixture of encoder-decoder with DTP (TPU-native).

One implementation, config-switched, covering the reference's three forks:

* ``models/med.py`` (1094 LoC) — text encoder / multimodal encoder with
  cross-attention / causal LM decoder with KV cache;
* ``models/nlvr_encoder.py`` (1016 LoC) — twin cross-attention over two image
  streams, averaged (layers < merge_start_layer) or merged through a
  Linear(2H->H) (reference ``models/nlvr_encoder.py:246-333``);
* the LM head with tied embeddings + label-smoothed shifted CE
  (reference ``models/med.py:1033-1047``).

TPU-native differences:

* The layer loop is a ``lax.scan`` over stacked params; the twin-merge
  layer-index switch is a traced ``where`` (both branches are cheap).
* Text DTP runs in the fixed-size masked buffer: the padding mask keeps the
  reference's finite additive form (-10000, ``models/med.py:785``) so padded
  tokens score exactly like the reference, while pruned slots use exact-zero
  (-inf) masking.
* Decoding uses a fixed-capacity KV cache updated with
  ``lax.dynamic_update_slice`` — no dynamic shapes
  (vs HF ``past_key_value`` concat, reference ``models/med.py:164-174``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.core.config import MedConfig
from madtp_tpu.ops.attention import attention_core
from madtp_tpu.ops.layers import dropout, gelu, layer_norm, linear, mlp
from madtp_tpu.prune.dtp import DTPSignals, TokenState, dtp_prune, init_token_state
from madtp_tpu.prune.query import query_model

PAD_BIAS = -10000.0  # reference models/med.py:785


def _heads(x, num_heads):
    B, N, D = x.shape
    return x.reshape(B, N, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def bert_embeddings(p, input_ids, cfg: MedConfig, position_offset=0):
    """Word + absolute position embeddings + LN (reference models/med.py:44-86)."""
    B, N = input_ids.shape
    we = p["word_embeddings"][input_ids]
    pos = jnp.arange(N) + position_offset
    pe = p["position_embeddings"][pos][None]
    return layer_norm(p["LayerNorm"], we + pe, cfg.layer_norm_eps)


def _self_attn(p, x, cfg, *, attn_bias=None, key_bias=None, key_alive=None,
               query_alive=None, need_scores=False,
               cache=None, cache_index=None, rng=None):
    """BertSelfAttention + output dense + residual LN
    (reference models/med.py:89-250).  Returns (hidden, aux, new_cache)."""
    H = cfg.num_attention_heads
    q = _heads(linear(p["self"]["query"], x), H)
    k = _heads(linear(p["self"]["key"], x), H)
    v = _heads(linear(p["self"]["value"], x), H)
    new_cache = None
    if cache is not None:
        ck, cv = cache  # [B,H,max_len,Dh]
        ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, cache_index, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, cache_index, 0))
        k, v = ck, cv
        new_cache = (ck, cv)
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    out, aux = attention_core(
        q, k, v,
        attn_bias=attn_bias,
        key_bias=key_bias,
        key_alive=key_alive,
        query_alive=query_alive,
        need_scores=need_scores,
        dropout_rate=cfg.attention_probs_dropout_prob if r1 is not None else 0.0,
        dropout_rng=r1,
    )
    h = dropout(r2, linear(p["output"]["dense"], out),
                cfg.hidden_dropout_prob if r2 is not None else 0.0)
    hidden = layer_norm(
        p["output"]["LayerNorm"], h + x,
        cfg.layer_norm_eps,
    )
    return hidden, aux, new_cache


def _cross_attn(p, x, enc, cfg, *, enc_bias, enc_alive):
    """Single-stream cross-attention (reference models/med.py:160-163)."""
    H = cfg.num_attention_heads
    q = _heads(linear(p["self"]["query"], x), H)
    k = _heads(linear(p["self"]["key"], enc), H)
    v = _heads(linear(p["self"]["value"], enc), H)
    out, _ = attention_core(q, k, v, attn_bias=enc_bias, key_alive=enc_alive)
    return layer_norm(
        p["output"]["LayerNorm"], linear(p["output"]["dense"], out) + x,
        cfg.layer_norm_eps,
    )


def _twin_cross_attn(p, x, enc0, enc1, cfg, *, alive0, alive1, layer_idx):
    """NLVR twin cross-attention (reference models/nlvr_encoder.py:303-349):
    two streams; layers < merge_start average dense0/dense1 outputs, layers >=
    merge_start concat and project through merge_layer."""
    H = cfg.num_attention_heads

    def one(stream_p, enc, alive):
        q = _heads(linear(stream_p["query"], x), H)
        k = _heads(linear(stream_p["key"], enc), H)
        v = _heads(linear(stream_p["value"], enc), H)
        out, _ = attention_core(q, k, v, key_alive=alive)
        return out

    h0 = linear(p["output"]["dense0"], one(p["self0"], enc0, alive0))
    h1 = linear(p["output"]["dense1"], one(p["self1"], enc1, alive1))
    avg = (h0 + h1) / 2.0
    merged = linear(p["output"]["merge_layer"], jnp.concatenate([h0, h1], axis=-1))
    h = jnp.where(layer_idx >= cfg.merge_start_layer, merged, avg)
    return layer_norm(p["output"]["LayerNorm"], h + x, cfg.layer_norm_eps)


def _ffn(p, x, cfg, rng=None):
    h = mlp({"fc1": p["intermediate"]["dense"], "fc2": p["output"]["dense"]}, x)
    h = dropout(rng, h,
                cfg.hidden_dropout_prob if rng is not None else 0.0)
    return layer_norm(
        p["output"]["LayerNorm"], h + x,
        cfg.layer_norm_eps,
    )


class MedEncoderOut(NamedTuple):
    state: TokenState  # final hidden states in the masked buffer
    sd_txt_ft: Optional[jnp.ndarray]
    kept_counts: jnp.ndarray  # [L]


def med_encoder(
    params,
    input_ids: jnp.ndarray,  # [B, N]
    attention_mask: jnp.ndarray,  # [B, N] 1/0 padding mask
    cfg: MedConfig,
    *,
    mode: str = "multimodal",  # 'text' | 'multimodal'
    encoder_state: Optional[TokenState] = None,  # image tokens (cross-attn K/V)
    encoder_state1: Optional[TokenState] = None,  # NLVR second image stream
    space_dict: Optional[jnp.ndarray] = None,
    temperature=0.0,
    prune_active: bool = False,
    capacities: Optional[Tuple[int, ...]] = None,
    dropout_rng=None,
    row_independent: bool = False,
) -> MedEncoderOut:
    """BertModel encoder pass (reference models/med.py:478-598, 788-929).

    ``row_independent`` (static; serving mode): per-row DTP decisions and
    per-row kept counts ``[L, B]`` — see prune/dtp.dtp_prune.

    Slot 0 (CLS/ENC token) is never pruned; the padding mask rides along as a
    finite additive bias exactly like the reference's extended mask.
    ``capacities`` switches to the unrolled gather fast path (see vit.py).
    """
    B, N = input_ids.shape
    emb = bert_embeddings(params["embeddings"], input_ids, cfg)
    if dropout_rng is not None:
        dropout_rng, r_emb = jax.random.split(dropout_rng)
        emb = dropout(r_emb, emb, cfg.hidden_dropout_prob)
    pad_bias = (1.0 - attention_mask.astype(jnp.float32)) * PAD_BIAS  # [B,N]

    # compute dtype follows the text embeddings: a cross-attn memory in a
    # wider dtype (e.g. fp32 image states fed to a bf16 model) would
    # otherwise promote the residual stream mid-scan and break the carry
    def _align(st):
        return None if st is None else TokenState(
            st.x.astype(emb.dtype), st.alive, st.bias)

    encoder_state = _align(encoder_state)
    encoder_state1 = _align(encoder_state1)

    L = cfg.num_hidden_layers
    use_fdt = space_dict is not None

    if capacities is not None and prune_active:
        return _med_encoder_gather(
            params, emb, pad_bias, cfg,
            mode=mode, encoder_state=encoder_state, encoder_state1=encoder_state1,
            space_dict=space_dict, temperature=temperature, capacities=capacities,
            row_independent=row_independent,
        )

    state = init_token_state(emb, depth=L if prune_active else 0,
                             bias=pad_bias,
                             pad_to=8 if prune_active else 1)

    twin = encoder_state1 is not None

    def body(carry, layer):
        state, sd_all = carry
        p, idx = layer
        x, alive, bias = state
        token_attn = None
        if use_fdt:
            token_attn, sd_ft = query_model(
                None, x[:, 1:], space_dict, alive=alive[:, 1:]
            )
            sd_all = sd_all + sd_ft

        rng_l = (None if dropout_rng is None
                 else jax.random.fold_in(dropout_rng, idx))
        r_sa = r_ffn = None
        if rng_l is not None:
            r_sa, r_ffn = jax.random.split(rng_l)
        h, aux, _ = _self_attn(
            p["attention"], x, cfg,
            key_bias=bias,
            key_alive=alive,
            query_alive=alive,
            need_scores=prune_active,
            rng=r_sa,
        )
        state = TokenState(h, alive, bias)

        kept = (jnp.sum(alive[:, 1:], axis=1) if row_independent
                else jnp.sum(alive[0, 1:]))
        if prune_active:
            signals = DTPSignals(
                cls_attn=aux.cls_attn, col_mass=aux.col_mass, token_attn=token_attn
            )
            state, kept = dtp_prune(state, signals, temperature,
                                    1 + (N - 1) + idx,
                                    row_independent=row_independent)

        x, alive, bias = state
        if mode == "multimodal":
            if twin:
                x = _twin_cross_attn(
                    p["crossattention"], x, encoder_state.x, encoder_state1.x,
                    cfg, alive0=encoder_state.alive, alive1=encoder_state1.alive,
                    layer_idx=idx,
                )
            else:
                x = _cross_attn(
                    p["crossattention"], x, encoder_state.x, cfg,
                    enc_bias=None, enc_alive=encoder_state.alive,
                )
        x = _ffn(p, x, cfg, rng=r_ffn)
        return (TokenState(x, alive, bias), sd_all), kept

    sd_all0 = (
        jnp.zeros((B, space_dict.shape[0], space_dict.shape[1]), jnp.float32)
        if use_fdt
        else jnp.zeros((), jnp.float32)
    )
    (state, sd_all), kept_counts = jax.lax.scan(
        body, (state, sd_all0), (params["layers"], jnp.arange(L))
    )
    return MedEncoderOut(state, sd_all if use_fdt else None, kept_counts)



def _med_encoder_gather(
    params, emb, pad_bias, cfg: MedConfig, *, mode, encoder_state,
    encoder_state1, space_dict, temperature, capacities,
    row_independent: bool = False,
) -> MedEncoderOut:
    """Unrolled gather-mode text encoder (static per-layer capacities)."""
    from madtp_tpu.core.tree import layer_slice
    from madtp_tpu.prune.dtp import dtp_prune_gather

    L = cfg.num_hidden_layers
    assert len(capacities) == L
    B = emb.shape[0]
    state = init_token_state(emb, depth=0, bias=pad_bias)
    twin = encoder_state1 is not None
    sd_all = jnp.zeros((B, space_dict.shape[0], space_dict.shape[1]), jnp.float32)
    kept_list = []
    for i in range(L):
        p = layer_slice(params["layers"], i)
        x, alive, bias = state
        token_attn, sd_ft = query_model(
            None, x[:, 1:], space_dict, alive=alive[:, 1:]
        )
        sd_all = sd_all + sd_ft
        h, aux, _ = _self_attn(
            p["attention"], x, cfg,
            key_bias=bias,
            key_alive=alive, query_alive=alive, need_scores=True,
        )
        signals = DTPSignals(
            cls_attn=aux.cls_attn, col_mass=aux.col_mass, token_attn=token_attn
        )
        cap = min(capacities[i], h.shape[1])
        state, kept, _ovf = dtp_prune_gather(
            TokenState(h, alive, bias), signals, temperature, cap,
            row_independent=row_independent,
        )
        x, alive, bias = state
        if mode == "multimodal":
            if twin:
                x = _twin_cross_attn(
                    p["crossattention"], x, encoder_state.x, encoder_state1.x,
                    cfg, alive0=encoder_state.alive, alive1=encoder_state1.alive,
                    layer_idx=i,
                )
            else:
                x = _cross_attn(
                    p["crossattention"], x, encoder_state.x, cfg,
                    enc_bias=None, enc_alive=encoder_state.alive,
                )
        x = _ffn(p, x, cfg)
        state = TokenState(x, alive, bias)
        kept_list.append(kept)
    return MedEncoderOut(state, sd_all, jnp.stack(kept_list))


# ---------------------------------------------------------------------------
# Decoder (causal LM) — full-sequence and fixed-cache incremental step
# ---------------------------------------------------------------------------


def causal_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """[B,N] padding mask -> [B,1,N,N] additive causal+padding bias
    (reference models/med.py:750-786)."""
    B, N = attention_mask.shape
    ids = jnp.arange(N)
    causal = (ids[None, :] <= ids[:, None]).astype(jnp.float32)  # [N,N]
    m = causal[None] * attention_mask[:, None, :].astype(jnp.float32)
    return ((1.0 - m) * PAD_BIAS)[:, None, :, :]


def med_decoder_forward(
    params,
    input_ids: jnp.ndarray,  # [B, N]
    attention_mask: jnp.ndarray,  # [B, N]
    cfg: MedConfig,
    *,
    encoder_state: TokenState,
) -> jnp.ndarray:
    """Full-sequence decoder pass -> hidden states [B,N,D]
    (training / scoring path; reference models/med.py:955-1069)."""
    emb = bert_embeddings(params["embeddings"], input_ids, cfg)
    encoder_state = TokenState(  # compute dtype follows the embeddings
        encoder_state.x.astype(emb.dtype), encoder_state.alive,
        encoder_state.bias)
    bias = causal_bias(attention_mask)

    def body(x, p):
        h, _, _ = _self_attn(
            p["attention"], x, cfg,
            attn_bias=bias, key_alive=None, query_alive=None, need_scores=False,
        )
        h = _cross_attn(
            p["crossattention"], h, encoder_state.x, cfg,
            enc_bias=enc_bias, enc_alive=encoder_state.alive,
        )
        return _ffn(p, h, cfg), None

    enc_bias = (
        None if encoder_state.bias is None
        else encoder_state.bias[:, None, None, :]
    )
    x, _ = jax.lax.scan(body, emb, params["layers"])
    return x


def med_bos_step(
    params,
    bos_ids: jnp.ndarray,  # [B, 1]
    cfg: MedConfig,
    *,
    encoder_state: TokenState,
):
    """Single BOS decoder step that also exports each layer's self-attn K/V
    of the BOS position.  Every rank candidate shares this prefix (same BOS,
    same memory), so :func:`med_rank_forward` can start from position 1 and
    skip recomputing it k times (reference models/blip_vqa.py:161-166 runs
    this step, then its full pass recomputes position 0 per candidate).

    Returns (hidden [B,1,D], bos_k [L,B,H,1,Dh], bos_v [L,B,H,1,Dh])."""
    emb = bert_embeddings(params["embeddings"], bos_ids, cfg)
    enc = TokenState(encoder_state.x.astype(emb.dtype), encoder_state.alive,
                     encoder_state.bias)
    enc_bias = None if enc.bias is None else enc.bias[:, None, None, :]
    H = cfg.num_attention_heads

    def body(x, p):
        k = _heads(linear(p["attention"]["self"]["key"], x), H)
        v = _heads(linear(p["attention"]["self"]["value"], x), H)
        h, _, _ = _self_attn(p["attention"], x, cfg)
        h = _cross_attn(p["crossattention"], h, enc.x, cfg,
                        enc_bias=enc_bias, enc_alive=enc.alive)
        return _ffn(p, h, cfg), (k, v)

    x, (ks, vs) = jax.lax.scan(body, emb, params["layers"])
    return x, ks, vs


def med_rank_forward(
    params,
    cand_ids: jnp.ndarray,  # [B, k, La] candidate answers per question
    cand_mask: jnp.ndarray,  # [B, k, La]
    cfg: MedConfig,
    *,
    encoder_state: TokenState,  # ONE memory per question [B, S, D]
    prefix_kv=None,  # (bos_k, bos_v) from med_bos_step: decode from pos 1
) -> jnp.ndarray:
    """Decoder forward over k candidate answers per question that SHARE one
    cross-attention memory — the VQA ranking hot path
    (reference models/blip_vqa.py:186-195 tiles question_states x k and
    re-projects the cross K/V for every candidate; here the memory is
    projected ONCE per layer and consumed by a broadcast einsum, saving
    k-fold K/V projection FLOPs and the materialized tile with *identical*
    math — the shared operand batches onto the MXU).

    ``prefix_kv``: the (bos_k, bos_v) pair from :func:`med_bos_step`.  The
    BOS position's hidden state is candidate-independent, so with the
    prefix the forward runs over positions ``1..La-1`` only (causal keys =
    shared BOS K/V + the candidate's own tokens) — one decoder position and
    one LM-head row per candidate saved, exactly (tested vs the full pass).

    Returns hidden states [B*k, La, D] (candidate-major like the tiled
    formulation, so lm_loss reshapes to [B, k] unchanged) — or
    [B*k, La-1, D] for positions ``1..La-1`` when ``prefix_kv`` is given."""
    B, k, La = cand_ids.shape
    H = cfg.num_attention_heads
    Dh = cfg.hidden_size // H

    if prefix_kv is None:
        Lq = La
        emb = bert_embeddings(params["embeddings"],
                              cand_ids.reshape(B * k, La), cfg)
        bias = causal_bias(cand_mask.reshape(B * k, La))
    else:
        Lq = La - 1
        emb = bert_embeddings(params["embeddings"],
                              cand_ids[:, :, 1:].reshape(B * k, Lq), cfg,
                              position_offset=1)
        # queries = positions 1..La-1; keys = [BOS] + positions 1..La-1
        m = cand_mask.reshape(B * k, La).astype(jnp.float32)
        causal = (jnp.arange(Lq)[None, :]
                  <= jnp.arange(Lq)[:, None]).astype(jnp.float32)
        allow = jnp.concatenate(
            [jnp.ones((Lq, 1), jnp.float32), causal], axis=1)  # [Lq, 1+Lq]
        mfull = allow[None] * m[:, None, :]  # [B*k, Lq, 1+Lq]
        bias = ((1.0 - mfull) * PAD_BIAS)[:, None, :, :]
    enc_x = encoder_state.x.astype(emb.dtype)
    alive = encoder_state.alive
    enc_key_bias = encoder_state.bias  # [B, S] additive or None
    scale = Dh ** -0.5

    def cross_kv(p):
        ca = p["crossattention"]["self"]
        kb = _heads(linear(ca["key"], enc_x), H)  # [B,H,S,Dh]
        vb = _heads(linear(ca["value"], enc_x), H)
        return kb, vb

    def self_attn_prefix(p, x, pk, pv):
        """Self-attention with the shared BOS K/V prepended (broadcast over
        the k candidates)."""
        q = _heads(linear(p["self"]["query"], x), H)
        kk = _heads(linear(p["self"]["key"], x), H)
        vv = _heads(linear(p["self"]["value"], x), H)
        pk_b = jnp.repeat(pk.astype(kk.dtype), k, axis=0)  # [B*k,H,1,Dh]
        pv_b = jnp.repeat(pv.astype(vv.dtype), k, axis=0)
        kk = jnp.concatenate([pk_b, kk], axis=2)
        vv = jnp.concatenate([pv_b, vv], axis=2)
        out, _ = attention_core(q, kk, vv, attn_bias=bias)
        return layer_norm(
            p["output"]["LayerNorm"], linear(p["output"]["dense"], out) + x,
            cfg.layer_norm_eps,
        )

    def body(x, layer):
        if prefix_kv is None:
            p = layer
            h, _, _ = _self_attn(
                p["attention"], x, cfg,
                attn_bias=bias, key_alive=None, query_alive=None,
                need_scores=False,
            )
        else:
            p, pk, pv = layer
            h = self_attn_prefix(p["attention"], x, pk, pv)
        ca = p["crossattention"]
        kb, vb = cross_kv(p)
        q = linear(ca["self"]["query"], h)  # [B*k, Lq, D]
        q = q.reshape(B, k, Lq, H, Dh).transpose(0, 1, 3, 2, 4)  # [B,k,H,Lq,Dh]
        # same masked-softmax numerics as ops.attention.attention_core
        # (fp32 logits, -inf dead keys, finite-guarded max-subtract) so the
        # shared-KV path is bit-equivalent to the tiled one (tested)
        logits = jnp.einsum("bkhld,bhsd->bkhls", q, kb,
                            preferred_element_type=jnp.float32) * scale
        if enc_key_bias is not None:
            logits = logits + enc_key_bias[:, None, None, None, :].astype(
                logits.dtype)
        if alive is not None:
            logits = jnp.where(alive[:, None, None, None, :], logits,
                               float("-inf"))
        m = jnp.max(logits, axis=-1, keepdims=True)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        e = jnp.exp(logits - m)
        probs = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        out = jnp.einsum("bkhls,bhsd->bkhld", probs.astype(vb.dtype), vb,
                         preferred_element_type=jnp.float32).astype(vb.dtype)
        out = out.transpose(0, 1, 3, 2, 4).reshape(B * k, Lq, H * Dh)
        h = layer_norm(
            ca["output"]["LayerNorm"],
            linear(ca["output"]["dense"], out) + h,
            cfg.layer_norm_eps,
        )
        return _ffn(p, h, cfg), None

    xs = (params["layers"] if prefix_kv is None
          else (params["layers"], prefix_kv[0], prefix_kv[1]))
    x, _ = jax.lax.scan(body, emb, xs)
    return x


class DecodeCache(NamedTuple):
    k: jnp.ndarray  # [L, B, H, max_len, Dh]
    v: jnp.ndarray


def init_decode_cache(cfg: MedConfig, batch: int, max_len: int, dtype=jnp.float32):
    L, H = cfg.num_hidden_layers, cfg.num_attention_heads
    Dh = cfg.hidden_size // H
    z = jnp.zeros((L, batch, H, max_len, Dh), dtype)
    return DecodeCache(z, z)


def med_decoder_step(
    params,
    input_ids: jnp.ndarray,  # [B, 1] current token
    position: jnp.ndarray,  # scalar: index of this token
    cache: DecodeCache,
    cfg: MedConfig,
    *,
    encoder_state: TokenState,
) -> Tuple[jnp.ndarray, DecodeCache]:
    """One incremental decode step with a fixed-capacity KV cache.

    Returns (hidden [B,1,D], new_cache).  Causality is enforced by masking
    cache slots > position.
    """
    emb = bert_embeddings(
        params["embeddings"], input_ids, cfg, position_offset=position
    )
    encoder_state = TokenState(  # compute dtype follows the embeddings
        encoder_state.x.astype(emb.dtype), encoder_state.alive,
        encoder_state.bias)
    max_len = cache.k.shape[3]
    valid = (jnp.arange(max_len) <= position)[None, None, None, :]  # [1,1,1,T]
    bias = jnp.where(valid, 0.0, PAD_BIAS)
    enc_bias = (
        None if encoder_state.bias is None
        else encoder_state.bias[:, None, None, :]
    )

    def body(x, layer):
        p, ck, cv = layer
        h, _, new_kv = _self_attn(
            p["attention"], x, cfg,
            attn_bias=bias, key_alive=None, query_alive=None, need_scores=False,
            cache=(ck, cv), cache_index=position,
        )
        h = _cross_attn(
            p["crossattention"], h, encoder_state.x, cfg,
            enc_bias=enc_bias, enc_alive=encoder_state.alive,
        )
        return _ffn(p, h, cfg), new_kv

    x, kvs = jax.lax.scan(body, emb, (params["layers"], cache.k, cache.v))
    return x, DecodeCache(k=kvs[0], v=kvs[1])


def lm_head(params, hidden, cfg: MedConfig) -> jnp.ndarray:
    """BertLMPredictionHead: transform -> tied-embedding decoder + bias
    (reference models/med.py:616-650)."""
    p = params["cls"]
    h = gelu(linear(p["transform"]["dense"], hidden))
    h = layer_norm(p["transform"]["LayerNorm"], h, cfg.layer_norm_eps)
    logits = jnp.einsum(
        "bnd,vd->bnv", h, params["embeddings"]["word_embeddings"],
        preferred_element_type=jnp.float32,
    )
    return logits + p["bias"]


def lm_loss(logits, labels, *, label_smoothing=0.1, reduction="mean"):
    """Shifted next-token CE with label smoothing 0.1 and -100 ignore index
    (reference models/med.py:1040-1047).  ``labels`` [B,N]."""
    logits = logits[:, :-1, :]
    labels = labels[:, 1:]
    V = logits.shape[-1]
    valid = labels != -100
    labels_safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    loss = jnp.where(valid, loss, 0.0)
    if reduction == "none":
        return jnp.sum(loss, axis=1)  # per-sample sum (reference :1046-1047)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


def bert_pooler(params, hidden):
    """CLS -> dense -> tanh (reference models/med.py:601-613)."""
    return jnp.tanh(linear(params["pooler"]["dense"], hidden[:, 0]))


# ---------------------------------------------------------------------------
# Random init for tests
# ---------------------------------------------------------------------------


def init_med_params(cfg: MedConfig, rng: np.random.RandomState, dtype=np.float32):
    D, L, I = cfg.hidden_size, cfg.num_hidden_layers, cfg.intermediate_size
    EW = cfg.encoder_width

    def lin(i, o, layers=True):
        if layers:
            return {"kernel": (rng.randn(L, i, o) * 0.02).astype(dtype),
                    "bias": np.zeros((L, o), dtype)}
        return {"kernel": (rng.randn(i, o) * 0.02).astype(dtype),
                "bias": np.zeros((o,), dtype)}

    def ln(layers=True):
        if layers:
            return {"scale": np.ones((L, D), dtype), "bias": np.zeros((L, D), dtype)}
        return {"scale": np.ones((D,), dtype), "bias": np.zeros((D,), dtype)}

    layers = {
        "attention": {
            "self": {"query": lin(D, D), "key": lin(D, D), "value": lin(D, D)},
            "output": {"dense": lin(D, D), "LayerNorm": ln()},
        },
        "intermediate": {"dense": lin(D, I)},
        "output": {"dense": lin(I, D), "LayerNorm": ln()},
    }
    if cfg.add_cross_attention:
        if cfg.twin_cross:
            layers["crossattention"] = {
                "self0": {"query": lin(D, D), "key": lin(EW, D), "value": lin(EW, D)},
                "self1": {"query": lin(D, D), "key": lin(EW, D), "value": lin(EW, D)},
                "output": {
                    "dense0": lin(D, D),
                    "dense1": lin(D, D),
                    "merge_layer": lin(2 * D, D),
                    "LayerNorm": ln(),
                },
            }
        else:
            layers["crossattention"] = {
                "self": {"query": lin(D, D), "key": lin(EW, D), "value": lin(EW, D)},
                "output": {"dense": lin(D, D), "LayerNorm": ln()},
            }
    return {
        "embeddings": {
            "word_embeddings": (rng.randn(cfg.vocab_size, D) * 0.02).astype(dtype),
            "position_embeddings": (
                rng.randn(cfg.max_position_embeddings, D) * 0.02
            ).astype(dtype),
            "LayerNorm": ln(layers=False),
        },
        "layers": layers,
        "cls": {
            "transform": {"dense": lin(D, D, layers=False), "LayerNorm": ln(layers=False)},
            "bias": np.zeros((cfg.vocab_size,), dtype),
        },
        "pooler": {"dense": lin(D, D, layers=False)},
    }
