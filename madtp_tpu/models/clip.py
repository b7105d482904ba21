"""CLIP dual-tower encoders with DTP (TPU-native).

Reference: ``clip/model.py`` (729 LoC) + the ``nn.MultiheadAttention``
monkeypatch in ``clip/mock.py`` that exposes per-head attention weights and
the cls_attn signal.  Here the signals are ordinary side outputs of
:func:`madtp_tpu.ops.attention.attention_core` — no monkeypatching.

Key reference behaviors preserved:

* pre-LN residual blocks with QuickGELU (``clip/model.py:174-261``);
* a *per-block* ``Query_model`` with a ``q_map`` input projection
  (``map_func=True``, ``clip/model.py:188``) — unlike BLIP's single shared
  query model;
* DTP variant ``"clip"``: prune only while ``topk_num > max_keep``; the text
  tower's ``max_keep = text.argmax(-1).max() + 2`` keeps the EOT token alive
  (``clip/model.py:220,492``);
* text features read at the EOT position (``clip/model.py:501``).  The
  masked buffer preserves token identity, so the EOT lookup indexes the
  *original* position — well-defined even under pruning (the reference's
  physical gather makes this lookup positionally ambiguous; see
  prune/dtp.py docstring).

The text tower's causal mask stays aligned to original positions for the same
reason.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.core.config import CLIPConfig
from madtp_tpu.ops.attention import attention_core
from madtp_tpu.ops.layers import layer_norm, linear, mlp, quick_gelu
from madtp_tpu.prune.dtp import DTPSignals, TokenState, dtp_prune, init_token_state
from madtp_tpu.prune.query import query_model

LN_EPS = 1e-5  # torch nn.LayerNorm default (CLIP)


def _heads(x, num_heads):
    B, N, D = x.shape
    return x.reshape(B, N, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def clip_block(
    p,
    state: TokenState,
    *,
    num_heads: int,
    temperature,
    merge_slot,
    causal: bool,
    space_dict: Optional[jnp.ndarray],
    prune_active: bool,
    max_keep,
    row_independent: bool = False,
):
    """ResidualAttentionBlock (reference clip/model.py:236-261):
    MAG (pre-attention) -> x += attn(ln_1(x)) -> DTP -> x += mlp(ln_2(x)).
    Returns (state, sd_ft or None, kept)."""
    x, alive, bias = state
    sd_ft = None
    token_attn = None
    if space_dict is not None:
        token_attn, sd_ft = query_model(
            p["query_model"], x[:, 1:], space_dict, alive=alive[:, 1:], map_func=True
        )

    xn = layer_norm(p["ln_1"], x, LN_EPS)
    qkv = linear(p["attn"]["in_proj"], xn)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn_bias = None
    if causal:
        N = x.shape[1]
        ids = jnp.arange(N)
        attn_bias = jnp.where(
            ids[None, :] <= ids[:, None], 0.0, float("-inf")
        )[None, None, :, :]
    out, aux = attention_core(
        _heads(q, num_heads), _heads(k, num_heads), _heads(v, num_heads),
        attn_bias=attn_bias,
        key_alive=alive,
        query_alive=alive,
        need_scores=prune_active,
    )
    x = x + linear(p["attn"]["out_proj"], out)
    state = TokenState(x, alive, bias)

    kept = (jnp.sum(alive[:, 1:], axis=1) if row_independent
            else jnp.sum(alive[0, 1:]))
    if prune_active:
        signals = DTPSignals(
            cls_attn=aux.cls_attn, col_mass=aux.col_mass, token_attn=token_attn
        )
        state, kept = dtp_prune(
            state, signals, temperature, merge_slot, variant="clip",
            max_keep=max_keep, row_independent=row_independent,
        )

    x, alive, bias = state
    x = x + mlp({"fc1": p["mlp"]["c_fc"], "fc2": p["mlp"]["c_proj"]},
                layer_norm(p["ln_2"], x, LN_EPS), act=quick_gelu)
    return TokenState(x, alive, bias), sd_ft, kept


def _tower(params_blocks, state, *, num_layers, num_heads, temperature,
           causal, space_dict, prune_active, max_keep, P0, sd_shape,
           row_independent=False):
    def body(carry, layer):
        state, sd_all = carry
        p, idx = layer
        state, sd_ft, kept = clip_block(
            p, state,
            num_heads=num_heads,
            temperature=temperature,
            merge_slot=1 + P0 + idx,
            causal=causal,
            space_dict=space_dict,
            prune_active=prune_active,
            max_keep=max_keep,
            row_independent=row_independent,
        )
        if sd_ft is not None:
            sd_all = sd_all + sd_ft
        return (state, sd_all), kept

    B = state.x.shape[0]
    sd_all0 = (
        jnp.zeros((B,) + sd_shape, jnp.float32)
        if space_dict is not None
        else jnp.zeros((), jnp.float32)
    )
    (state, sd_all), kept = jax.lax.scan(
        body, (state, sd_all0), (params_blocks, jnp.arange(num_layers))
    )
    return state, (sd_all if space_dict is not None else None), kept


def _tower_gather(params_blocks, state, *, num_layers, num_heads, temperature,
                  space_dict, max_keep, capacities, sd_shape,
                  row_independent=False):
    """Gather fast path for a NON-CAUSAL tower (vision only): identical DTP
    decisions to :func:`_tower`, physically compacted per layer to the
    static calibrated capacity schedule (cf. models/vit.py
    ``_vit_forward_gather``).  The text tower stays mask-mode — its causal
    mask is tied to original token positions, and at 77 tokens there is
    nothing worth compacting."""
    from madtp_tpu.core.tree import layer_slice
    from madtp_tpu.prune.dtp import dtp_prune_gather

    assert len(capacities) == num_layers
    B = state.x.shape[0]
    sd_all = (jnp.zeros((B,) + sd_shape, jnp.float32)
              if space_dict is not None else None)
    kept_list = []
    for i in range(num_layers):
        p = layer_slice(params_blocks, i)
        x, alive, bias = state
        token_attn = None
        if space_dict is not None:
            token_attn, sd_ft = query_model(
                p["query_model"], x[:, 1:], space_dict, alive=alive[:, 1:],
                map_func=True)
            sd_all = sd_all + sd_ft
        xn = layer_norm(p["ln_1"], x, LN_EPS)
        qkv = linear(p["attn"]["in_proj"], xn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out, aux = attention_core(
            _heads(q, num_heads), _heads(k, num_heads), _heads(v, num_heads),
            key_alive=alive, query_alive=alive, need_scores=True)
        x = x + linear(p["attn"]["out_proj"], out)
        state = TokenState(x, alive, bias)
        signals = DTPSignals(cls_attn=aux.cls_attn, col_mass=aux.col_mass,
                             token_attn=token_attn)
        cap = min(capacities[i], state.x.shape[1])
        state, kept, _ovf = dtp_prune_gather(
            state, signals, temperature, cap, variant="clip",
            max_keep=max_keep, row_independent=row_independent)
        x, alive, bias = state
        x = x + mlp({"fc1": p["mlp"]["c_fc"], "fc2": p["mlp"]["c_proj"]},
                    layer_norm(p["ln_2"], x, LN_EPS), act=quick_gelu)
        state = TokenState(x, alive, bias)
        kept_list.append(kept)
    return state, sd_all, jnp.stack(kept_list)


def clip_encode_image(
    params, images, cfg: CLIPConfig, *, space_dict=None, temperature=0.0,
    prune_active=False, capacities=None, return_state=False,
    row_independent=False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Vision tower (reference clip/model.py:275-313).
    Returns (features [B,E], sd_img_ft_all, kept_counts);
    ``return_state=True`` appends the final TokenState (full token
    sequence + alive mask — the golden tests compare its surviving rows
    against the reference transformer's output multiset).

    ``capacities`` (static tuple, one per layer): gather fast path —
    physically compacted eval/training (--fast_eval/--fast_train)."""
    from madtp_tpu.ops.layers import patch_embed

    if images.dtype == jnp.uint8:
        # uint8 HWC host buffers (drivers' --uint8_feed): normalize on
        # device — 4x less host->device traffic
        from madtp_tpu.ops.layers import normalize_images

        images = normalize_images(images)
    if cfg.is_resnet:
        # ModifiedResNet tower (clip/model.py:97-156) — unpruned; the
        # reference's own RN+DTP integration cannot even be constructed
        # (models/clip_resnet.py docstring), so kept_counts is empty
        from madtp_tpu.models.clip_resnet import modified_resnet_forward

        feats = modified_resnet_forward(
            params["visual"], images, layers=cfg.resnet_layers,
            width=cfg.vision_width)
        return feats, None, jnp.zeros((0,), jnp.int32)

    v = params["visual"]
    x = patch_embed({"kernel": v["conv1"]["kernel"], "bias": None}, images)
    B = x.shape[0]
    cls = jnp.broadcast_to(
        v["class_embedding"].astype(x.dtype)[None, None, :], (B, 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(x.dtype)[None]
    x = layer_norm(v["ln_pre"], x, LN_EPS)

    P0 = x.shape[1] - 1
    sd_shape = None if space_dict is None else (space_dict.shape[0], space_dict.shape[1])
    if capacities is not None and prune_active:
        state = init_token_state(x, depth=0, pad_to=8)
        state, sd_all, kept = _tower_gather(
            v["blocks"], state,
            num_layers=cfg.vision_layers, num_heads=cfg.vision_heads,
            temperature=temperature, space_dict=space_dict, max_keep=1,
            capacities=capacities, sd_shape=sd_shape,
            row_independent=row_independent,
        )
        feats = layer_norm(v["ln_post"], state.x[:, 0, :], LN_EPS)
        feats = jnp.dot(feats, v["proj"], preferred_element_type=jnp.float32)
        return feats.astype(x.dtype), sd_all, kept
    # pad_to=8: 1+576+24 = 601 slots is not lane-aligned and the fused
    # kernel's gate requires N % 8 == 0 — without padding the whole CLIP
    # vision tower takes the XLA fallback on TPU (cf. models/vit.py:220)
    state = init_token_state(x, depth=cfg.vision_layers if prune_active else 0,
                             pad_to=8 if prune_active else 1)
    state, sd_all, kept = _tower(
        v["blocks"], state,
        num_layers=cfg.vision_layers, num_heads=cfg.vision_heads,
        temperature=temperature, causal=False, space_dict=space_dict,
        prune_active=prune_active, max_keep=1, P0=P0, sd_shape=sd_shape,
        row_independent=row_independent,
    )
    feats = layer_norm(v["ln_post"], state.x[:, 0, :], LN_EPS)
    feats = jnp.dot(feats, v["proj"], preferred_element_type=jnp.float32)
    if return_state:
        return feats.astype(x.dtype), sd_all, kept, state
    return feats.astype(x.dtype), sd_all, kept


def clip_encode_text(
    params, text: jnp.ndarray, cfg: CLIPConfig, *, space_dict=None,
    temperature=0.0, prune_active=False, row_independent=False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Text tower (reference clip/model.py:485-503).
    ``text``: [B, context_length] token ids.  Returns (features [B,E],
    sd_txt_ft_all, kept_counts)."""
    x = params["token_embedding"][text]
    x = x + params["positional_embedding"].astype(x.dtype)[None]

    eot_pos = jnp.argmax(text, axis=-1)  # EOT has the highest token id
    # the EOT guard is itself batch-coupled in the reference
    # (clip/model.py:492 takes the batch max); per-row in serving mode
    max_keep = (eot_pos + 2) if row_independent else (jnp.max(eot_pos) + 2)

    P0 = x.shape[1] - 1
    state = init_token_state(x, depth=cfg.transformer_layers if prune_active else 0,
                             pad_to=8 if prune_active else 1)
    sd_shape = None if space_dict is None else (space_dict.shape[0], space_dict.shape[1])
    state, sd_all, kept = _tower(
        params["blocks"], state,
        num_layers=cfg.transformer_layers, num_heads=cfg.transformer_heads,
        temperature=temperature, causal=True, space_dict=space_dict,
        prune_active=prune_active, max_keep=max_keep, P0=P0, sd_shape=sd_shape,
        row_independent=row_independent,
    )
    x = layer_norm(params["ln_final"], state.x, LN_EPS)
    feats = x[jnp.arange(x.shape[0]), eot_pos]  # identity-preserving EOT lookup
    feats = jnp.dot(feats, params["text_projection"], preferred_element_type=jnp.float32)
    return feats.astype(x.dtype), sd_all, kept


def init_clip_params(cfg: CLIPConfig, rng: np.random.RandomState, dtype=np.float32):
    """Random init for tests (checkpoints provide real weights)."""
    W, LV = cfg.vision_width, cfg.vision_layers
    TW, LT = cfg.transformer_width, cfg.transformer_layers
    E = cfg.embed_dim
    K = cfg.sd_dim

    def blocks(L, D):
        def lin(i, o):
            return {"kernel": (rng.randn(L, i, o) * (i ** -0.5)).astype(dtype),
                    "bias": np.zeros((L, o), dtype)}

        def ln():
            return {"scale": np.ones((L, D), dtype), "bias": np.zeros((L, D), dtype)}

        return {
            "ln_1": ln(),
            "attn": {"in_proj": lin(D, 3 * D), "out_proj": lin(D, D)},
            "ln_2": ln(),
            "mlp": {"c_fc": lin(D, 4 * D), "c_proj": lin(4 * D, D)},
            "query_model": {"q_map": lin(D, K)},
        }

    def ln1(D):
        return {"scale": np.ones((D,), dtype), "bias": np.zeros((D,), dtype)}

    pdim = 3 * cfg.vision_patch_size ** 2
    return {
        "visual": {
            "conv1": {"kernel": (rng.randn(pdim, W) * 0.02).astype(dtype)},
            "class_embedding": (rng.randn(W) * W ** -0.5).astype(dtype),
            "positional_embedding": (
                rng.randn(cfg.vision_num_patches + 1, W) * W ** -0.5
            ).astype(dtype),
            "ln_pre": ln1(W),
            "blocks": blocks(LV, W),
            "ln_post": ln1(W),
            "proj": (rng.randn(W, E) * W ** -0.5).astype(dtype),
        },
        "token_embedding": (rng.randn(cfg.vocab_size, TW) * 0.02).astype(dtype),
        "positional_embedding": (rng.randn(cfg.context_length, TW) * 0.01).astype(dtype),
        "blocks": blocks(LT, TW),
        "ln_final": ln1(TW),
        "text_projection": (rng.randn(TW, E) * TW ** -0.5).astype(dtype),
        "logit_scale": np.asarray(np.log(1.0 / 0.07), dtype),
    }
