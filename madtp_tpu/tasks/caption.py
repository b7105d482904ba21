"""Caption generation: HF-style beam search, fully jitted with static shapes.

Reference path (SURVEY.md §3.3): ``BLIP_Decoder.generate``
(``models/blip.py:161-202``) delegates to HF ``generate`` with num_beams=3,
eos=[SEP], a "a picture of " prompt, and a dynamic KV cache reordered per step
(``models/med.py:1071-1094``).

TPU-native design: beams fold into the batch, the KV cache is a fixed
[L, B*nb, H, max_len, Dh] buffer, and the whole generation is ONE
``lax.fori_loop`` — no host round-trips, no recompiles across batches.
HF semantics preserved: additive log-prob beam scores, EOS suppressed before
``min_length``, 2*nb candidate expansion with EOS candidates banked as
finished hypotheses, final score = sum_logprobs / len**length_penalty.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from madtp_tpu.models import med as M
from madtp_tpu.models.blip import BlipConfig
from madtp_tpu.prune.dtp import TokenState

NEG = -1e9


def _expand_state(state: TokenState, nb: int) -> TokenState:
    def rep(a):
        return jnp.repeat(a, nb, axis=0) if a is not None else None

    return TokenState(rep(state.x), rep(state.alive), rep(state.bias))


def beam_generate(
    decoder_params,
    enc_state: TokenState,
    prompt_ids: jnp.ndarray,  # [B, Lp] bos-prefixed prompt (last token kept)
    cfg: BlipConfig,
    *,
    num_beams: int = 3,
    max_length: int = 30,
    min_length: int = 10,
    eos_token_id: int = 102,
    pad_token_id: int = 0,
    length_penalty: float = 1.0,
    repetition_penalty: float = 1.0,
) -> jnp.ndarray:
    """Returns generated sequences [B, max_length] (prompt included, padded
    with ``pad_token_id`` after EOS)."""
    B, Lp = prompt_ids.shape
    nb = num_beams
    med = cfg.med
    V = med.vocab_size

    enc = _expand_state(enc_state, nb)
    cache = M.init_decode_cache(med, B * nb, max_length, dtype=enc_state.x.dtype)

    seqs = jnp.full((B, nb, max_length), pad_token_id, prompt_ids.dtype)
    seqs = seqs.at[:, :, :Lp].set(prompt_ids[:, None, :])

    # prime the cache on the prompt (teacher forcing)
    def prime(t, carry):
        cache, logits = carry
        tok = jax.lax.dynamic_slice(seqs, (0, 0, t), (B, nb, 1)).reshape(B * nb, 1)
        h, cache = M.med_decoder_step(
            decoder_params, tok, t, cache, med, encoder_state=enc
        )
        logits = M.lm_head(decoder_params, h, med)[:, 0, :]
        return cache, logits

    cache, logits = jax.lax.fori_loop(
        0, Lp, prime, (cache, jnp.zeros((B * nb, V), jnp.float32))
    )

    beam_scores = jnp.full((B, nb), NEG, jnp.float32).at[:, 0].set(0.0)
    fin_seqs = jnp.full((B, nb, max_length), pad_token_id, prompt_ids.dtype)
    fin_scores = jnp.full((B, nb), NEG, jnp.float32)

    def apply_penalties(logp, seqs_flat, cur_len):
        if repetition_penalty != 1.0:
            # HF: divide positive scores / multiply negative for seen tokens
            pos_mask = jnp.arange(max_length)[None, :] < cur_len
            one_hot = jax.nn.one_hot(seqs_flat, V, dtype=jnp.float32)
            seen = jnp.einsum("blv,bl->bv", one_hot,
                              pos_mask.astype(jnp.float32)) > 0
            pen = jnp.where(logp > 0, logp / repetition_penalty,
                            logp * repetition_penalty)
            logp = jnp.where(seen, pen, logp)
        return logp

    def step(t, carry):
        seqs, beam_scores, fin_seqs, fin_scores, cache, logits = carry
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [B*nb,V]
        logp = apply_penalties(logp, seqs.reshape(B * nb, max_length), t)
        # min_length: suppress EOS early (HF MinLengthLogitsProcessor)
        logp = jnp.where(
            (t < min_length) & (jnp.arange(V)[None, :] == eos_token_id),
            NEG, logp,
        )
        cand = beam_scores[:, :, None] + logp.reshape(B, nb, V)  # [B,nb,V]
        flat = cand.reshape(B, nb * V)
        top_scores, top_idx = jax.lax.top_k(flat, 2 * nb)  # [B,2nb]
        top_beam = top_idx // V
        top_tok = top_idx % V

        is_eos = top_tok == eos_token_id
        # next live beams: first nb non-eos candidates (stable order)
        live_rank = jnp.cumsum((~is_eos).astype(jnp.int32), axis=1) - 1  # [B,2nb]
        pick = (~is_eos) & (live_rank < nb)

        def select(row_vals, row_pick, fill):
            # compress picked entries to the front, pad with `fill`
            idx = jnp.argsort(~row_pick, stable=True)  # picked first
            vals = row_vals[idx][:nb]
            ok = row_pick[idx][:nb]
            return jnp.where(ok, vals, fill), ok

        new_beam_scores, _ = jax.vmap(lambda v, p: select(v, p, NEG))(
            top_scores, pick
        )
        new_beam_src, _ = jax.vmap(lambda v, p: select(v, p, 0))(top_beam, pick)
        new_tok, _ = jax.vmap(lambda v, p: select(v, p, pad_token_id))(
            top_tok.astype(seqs.dtype), pick
        )

        # bank EOS candidates as finished hypotheses (score normalized by len)
        hyp_len = (t + 1).astype(jnp.float32)
        eos_norm = jnp.where(is_eos, top_scores / hyp_len ** length_penalty, NEG)
        # merge candidate pool: existing finished + new eos candidates
        pool_scores = jnp.concatenate([fin_scores, eos_norm], axis=1)  # [B, nb+2nb]
        eos_seqs = jnp.take_along_axis(
            seqs, top_beam[:, :, None], axis=1
        )  # [B,2nb,L] parent sequences
        eos_seqs = jax.vmap(
            lambda s, tok: jax.vmap(
                lambda row, tk: jax.lax.dynamic_update_slice(row, tk[None], (t,))
            )(s, tok)
        )(eos_seqs, top_tok.astype(seqs.dtype))
        pool_seqs = jnp.concatenate([fin_seqs, eos_seqs], axis=1)
        best_scores, best_idx = jax.lax.top_k(pool_scores, nb)
        fin_scores = best_scores
        fin_seqs = jnp.take_along_axis(pool_seqs, best_idx[:, :, None], axis=1)

        # reorder sequences + append token
        seqs = jnp.take_along_axis(seqs, new_beam_src[:, :, None], axis=1)
        seqs = jax.vmap(
            lambda s, tok: jax.vmap(
                lambda row, tk: jax.lax.dynamic_update_slice(row, tk[None], (t,))
            )(s, tok)
        )(seqs, new_tok)

        # reorder cache along the flattened batch*beam axis
        flat_src = (
            jnp.arange(B)[:, None] * nb + new_beam_src
        ).reshape(B * nb)  # [B*nb]
        cache = M.DecodeCache(cache.k[:, flat_src], cache.v[:, flat_src])

        tok = new_tok.reshape(B * nb, 1)
        h, cache = M.med_decoder_step(
            decoder_params, tok, t, cache, med, encoder_state=enc
        )
        logits = M.lm_head(decoder_params, h, med)[:, 0, :]
        return seqs, new_beam_scores, fin_seqs, fin_scores, cache, logits

    seqs, beam_scores, fin_seqs, fin_scores, cache, logits = jax.lax.fori_loop(
        Lp, max_length, step,
        (seqs, beam_scores, fin_seqs, fin_scores, cache, logits),
    )

    # finalize: finished hyps compete with still-live beams (HF finalize adds
    # open beams when fewer than nb hypotheses finished)
    live_norm = beam_scores / float(max_length) ** length_penalty
    all_scores = jnp.concatenate([fin_scores, live_norm], axis=1)
    all_seqs = jnp.concatenate([fin_seqs, seqs], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    out = jnp.take_along_axis(all_seqs, best[:, None, None], axis=1)[:, 0]

    # pad everything after the first EOS (exclusive of prompt region)
    pos = jnp.arange(max_length)[None, :]
    is_eos_out = (out == eos_token_id) & (pos >= Lp)
    first_eos = jnp.where(
        is_eos_out.any(axis=1), jnp.argmax(is_eos_out, axis=1), max_length
    )
    out = jnp.where(pos > first_eos[:, None], pad_token_id, out)
    return out


def nucleus_generate(
    decoder_params,
    enc_state: TokenState,
    prompt_ids: jnp.ndarray,  # [B, Lp]
    cfg: BlipConfig,
    rng: jax.Array,
    *,
    max_length: int = 30,
    min_length: int = 10,
    top_p: float = 0.9,
    eos_token_id: int = 102,
    pad_token_id: int = 0,
    repetition_penalty: float = 1.1,
) -> jnp.ndarray:
    """Nucleus (top-p) sampling, the reference's ``sample=True`` path
    (``models/blip.py:175-186``: top_p=0.9, repetition_penalty=1.1,
    num_return_sequences=1).  One ``fori_loop``, fixed shapes."""
    B, Lp = prompt_ids.shape
    med = cfg.med
    V = med.vocab_size

    cache = M.init_decode_cache(med, B, max_length, dtype=enc_state.x.dtype)
    seqs = jnp.full((B, max_length), pad_token_id, prompt_ids.dtype)
    seqs = seqs.at[:, :Lp].set(prompt_ids)
    done = jnp.zeros((B,), bool)

    def prime(t, carry):
        cache, logits = carry
        tok = jax.lax.dynamic_slice(seqs, (0, t), (B, 1))
        h, cache = M.med_decoder_step(
            decoder_params, tok, t, cache, med, encoder_state=enc_state)
        return cache, M.lm_head(decoder_params, h, med)[:, 0, :]

    cache, logits = jax.lax.fori_loop(
        0, Lp, prime, (cache, jnp.zeros((B, V), jnp.float32)))

    def step(t, carry):
        seqs, done, cache, logits, rng = carry
        logits = logits.astype(jnp.float32)
        # repetition penalty over already-generated tokens (HF semantics)
        if repetition_penalty != 1.0:
            pos_mask = jnp.arange(max_length)[None, :] < t
            one_hot = jax.nn.one_hot(seqs, V, dtype=jnp.float32)
            seen = jnp.einsum("blv,bl->bv", one_hot,
                              pos_mask.astype(jnp.float32)) > 0
            pen = jnp.where(logits > 0, logits / repetition_penalty,
                            logits * repetition_penalty)
            logits = jnp.where(seen, pen, logits)
        logits = jnp.where(
            (t < min_length) & (jnp.arange(V)[None, :] == eos_token_id),
            NEG, logits)

        # top-p filtering: keep the smallest prefix of sorted probs >= top_p
        probs = jax.nn.softmax(logits, axis=-1)
        sp = jnp.sort(probs, axis=-1)[:, ::-1]
        csum = jnp.cumsum(sp, axis=-1)
        # threshold = prob of the last token inside the nucleus
        inside = csum - sp < top_p
        thr = jnp.min(jnp.where(inside, sp, jnp.inf), axis=-1, keepdims=True)
        filt = jnp.where(probs >= thr, logits, NEG)

        rng, sub = jax.random.split(rng)
        tok = jax.random.categorical(sub, filt, axis=-1)  # [B]
        tok = jnp.where(done, pad_token_id, tok).astype(seqs.dtype)
        seqs = jax.lax.dynamic_update_slice(seqs, tok[:, None], (0, t))
        done = done | (tok == eos_token_id)

        h, cache = M.med_decoder_step(
            decoder_params, tok[:, None], t, cache, med,
            encoder_state=enc_state)
        logits = M.lm_head(decoder_params, h, med)[:, 0, :]
        return seqs, done, cache, logits, rng

    seqs, done, cache, logits, rng = jax.lax.fori_loop(
        Lp, max_length, step, (seqs, done, cache, logits, rng))
    return seqs
