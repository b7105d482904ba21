"""BLIP ViT image encoder with per-layer DTP (TPU-native).

Reference: ``models/vit.py`` (timm-style ViT, 421 LoC).  Differences by design:

* The per-block python loop is a single ``lax.scan`` over stacked block
  params — one compiled block regardless of depth.
* DTP runs in the fixed-size masked token buffer
  (:mod:`madtp_tpu.prune.dtp`): merge slot of layer ``i`` is buffer slot
  ``1 + num_patches + i``.  No host syncs, no dynamic shapes
  (vs reference ``models/vit.py:145``).
* The pruning signals are attention side-outputs (no saved attention maps).

Forward returns ``(TokenState, sd_img_ft_all, kept_counts)`` — kept token
counts per layer feed the analytic FLOPs model that replaces fvcore tracing
(reference ``utils.py:283-391``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.core.config import ViTConfig
from madtp_tpu.ops.attention import self_attention
from madtp_tpu.ops.layers import drop_path, layer_norm, mlp, patch_embed
from madtp_tpu.prune.dtp import DTPSignals, TokenState, dtp_prune, init_token_state
from madtp_tpu.prune.query import query_model


def _attn_part(p, state: TokenState, cfg: ViTConfig, need_scores: bool,
               rng=None, dp_rate=0.0):
    x, alive, bias = state
    h, aux = self_attention(
        p["attn"],
        layer_norm(p["norm1"], x, cfg.layer_norm_eps),
        num_heads=cfg.num_heads,
        key_alive=alive,
        query_alive=alive,
        need_scores=need_scores,
    )
    h = drop_path(rng, h, dp_rate) if rng is not None else h
    return TokenState(x + h, alive, bias), aux


def _ffn_part(p, state: TokenState, cfg: ViTConfig, rng=None,
              dp_rate=0.0) -> TokenState:
    x, alive, bias = state
    h = mlp(p["mlp"], layer_norm(p["norm2"], x, cfg.layer_norm_eps))
    h = drop_path(rng, h, dp_rate) if rng is not None else h
    return TokenState(x + h, alive, bias)


def vit_block(
    p,
    state: TokenState,
    *,
    cfg: ViTConfig,
    temperature,
    merge_slot,
    token_attn: Optional[jnp.ndarray],
    prune_active: bool,
    rng=None,
    dp_rate=0.0,
    row_independent: bool = False,
):
    """One transformer block: attn -> (DTP) -> FFN
    (reference models/vit.py:183-207)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    state, aux = _attn_part(p, state, cfg, need_scores=prune_active,
                            rng=r1, dp_rate=dp_rate)

    if row_independent:  # per-row placeholder/kept (serving mode)
        kept = jnp.sum(state.alive[:, 1:], axis=1)
    else:
        kept = jnp.sum(state.alive[0, 1:])  # placeholder when not pruning
    if prune_active:
        signals = DTPSignals(
            cls_attn=aux.cls_attn, col_mass=aux.col_mass, token_attn=token_attn
        )
        state, kept = dtp_prune(state, signals, temperature, merge_slot,
                                row_independent=row_independent)

    return _ffn_part(p, state, cfg, rng=r2, dp_rate=dp_rate), kept


def vit_forward(
    params,
    images: jnp.ndarray,  # [B, 3, H, W]
    *,
    cfg: ViTConfig,
    space_dict: Optional[jnp.ndarray] = None,  # [K, sd_dim]
    temperature=0.0,
    prune_active: bool = False,
    capacities: Optional[Tuple[int, ...]] = None,
    dropout_rng=None,
    row_independent: bool = False,
) -> Tuple[TokenState, Optional[jnp.ndarray], jnp.ndarray]:
    """Reference models/vit.py:281-310.

    ``row_independent`` (static; serving mode): per-row DTP decisions and
    per-row kept counts — ``kept_counts`` becomes ``[depth, B]`` (see
    prune/dtp.dtp_prune).

    ``prune_active`` must be a static bool (True iff temperature > 0); the
    temperature value itself is traced, so the compression controller never
    triggers a recompile.

    ``capacities`` (static tuple, one per layer) switches to the gather fast
    path: after each layer's DTP decision the buffer physically compacts to
    ``capacities[i]`` slots, so attention/FFN cost shrinks with depth.  Use
    :func:`madtp_tpu.prune.calibrate.calibrate_capacities` to derive a
    schedule from mask-mode runs.
    """
    if images.dtype == jnp.uint8:
        # uint8 HWC host buffers (drivers' --uint8_feed): 4x less
        # host->device traffic; normalize fuses into the patch-embed conv
        from madtp_tpu.ops.layers import normalize_images

        images = normalize_images(images)
    B = images.shape[0]
    x = patch_embed(params["patch_embed"], images)  # [B, P0, D]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][:, : x.shape[1], :].astype(x.dtype)

    depth = cfg.depth
    P0 = x.shape[1] - 1
    use_fdt = space_dict is not None

    if capacities is not None and prune_active:
        return _vit_forward_gather(
            params, x, cfg=cfg, space_dict=space_dict,
            temperature=temperature, capacities=capacities,
            row_independent=row_independent,
        )

    pad_to = 8 if prune_active else 1
    state = init_token_state(x, depth=depth if prune_active else 0,
                             pad_to=pad_to)

    def body(carry, layer):
        state, sd_all = carry
        p, idx = layer
        token_attn = None
        if use_fdt:
            token_attn, sd_ft = query_model(
                None, state.x[:, 1:], space_dict, alive=state.alive[:, 1:]
            )
            sd_all = sd_all + sd_ft
        merge_slot = 1 + P0 + idx
        rng_l = (None if dropout_rng is None
                 else jax.random.fold_in(dropout_rng, idx))
        dp_rate = cfg.drop_path_rate * idx / max(depth - 1, 1)
        state, kept = vit_block(
            p,
            state,
            cfg=cfg,
            temperature=temperature,
            merge_slot=merge_slot,
            token_attn=token_attn,
            prune_active=prune_active,
            rng=rng_l,
            dp_rate=dp_rate,
            row_independent=row_independent,
        )
        return (state, sd_all), kept

    sd_all0 = (
        jnp.zeros((B, space_dict.shape[0], space_dict.shape[1]), jnp.float32)
        if use_fdt
        else jnp.zeros((), jnp.float32)
    )
    n_remat = depth if cfg.ckpt_layers < 0 else min(cfg.ckpt_layers, depth)
    if not cfg.grad_checkpoint:
        n_remat = 0
    if n_remat in (0, depth):
        scan_body = jax.checkpoint(body) if n_remat else body
        (state, sd_all), kept_counts = jax.lax.scan(
            scan_body,
            (state, sd_all0),
            (params["blocks"], jnp.arange(depth)),
        )
    else:
        # vit_ckpt_layer semantics (reference models/vit.py:255): only the
        # LAST n_remat blocks rematerialize — two scans over sliced stacks
        split = depth - n_remat
        head = jax.tree_util.tree_map(lambda a: a[:split], params["blocks"])
        tail = jax.tree_util.tree_map(lambda a: a[split:], params["blocks"])
        carry, kept_a = jax.lax.scan(
            body, (state, sd_all0), (head, jnp.arange(split)))
        (state, sd_all), kept_b = jax.lax.scan(
            jax.checkpoint(body), carry, (tail, jnp.arange(split, depth)))
        kept_counts = jnp.concatenate([kept_a, kept_b], axis=0)

    x = layer_norm(params["norm"], state.x, cfg.layer_norm_eps)
    state = TokenState(x, state.alive, state.bias)
    return state, (sd_all if use_fdt else None), kept_counts


def init_vit_params(cfg: ViTConfig, rng: np.random.RandomState, dtype=np.float32):
    """Random init (shape-compatible with checkpoint loading; tests only —
    real weights come from .pth via :mod:`madtp_tpu.ckpt`)."""
    D, L = cfg.embed_dim, cfg.depth
    hid = int(D * cfg.mlp_ratio)
    pdim = 3 * cfg.patch_size ** 2

    def lin(i, o):
        return {
            "kernel": (rng.randn(L, i, o) * 0.02).astype(dtype),
            "bias": np.zeros((L, o), dtype),
        }

    def norm():
        return {"scale": np.ones((L, D), dtype), "bias": np.zeros((L, D), dtype)}

    return {
        "cls_token": (rng.randn(1, 1, D) * 0.02).astype(dtype),
        "pos_embed": (rng.randn(1, cfg.num_patches + 1, D) * 0.02).astype(dtype),
        "patch_embed": {
            "kernel": (rng.randn(pdim, D) * 0.02).astype(dtype),
            "bias": np.zeros((D,), dtype),
        },
        "blocks": {
            "norm1": norm(),
            "attn": {"qkv": lin(D, 3 * D), "proj": lin(D, D)},
            "norm2": norm(),
            "mlp": {"fc1": lin(D, hid), "fc2": lin(hid, D)},
        },
        "norm": {"scale": np.ones((D,), dtype), "bias": np.zeros((D,), dtype)},
    }


def _vit_forward_gather(params, x, *, cfg: ViTConfig, space_dict, temperature,
                        capacities, row_independent: bool = False):
    """Unrolled gather-mode forward: per-layer physical compaction to the
    static capacity schedule.  Shapes differ per layer (by design), so the
    loop is unrolled rather than scanned; XLA still compiles each distinct
    capacity once."""
    from madtp_tpu.core.tree import layer_slice
    from madtp_tpu.prune.dtp import dtp_prune_gather

    assert len(capacities) == cfg.depth
    B = x.shape[0]
    # pad_to=8: 1+576 = 577 tokens is not a lane-aligned count, and the
    # fused kernel's eligibility gate requires N % 8 == 0 — without padding
    # the FIRST layer (the largest N in the whole schedule) silently fell
    # back to the XLA scoring attention and materialized [B,H,577,577]
    state = init_token_state(x, depth=0, pad_to=8)
    sd_all = jnp.zeros((B, space_dict.shape[0], space_dict.shape[1]), jnp.float32)
    kept_list = []
    for i in range(cfg.depth):
        p = layer_slice(params["blocks"], i)
        token_attn, sd_ft = query_model(
            None, state.x[:, 1:], space_dict, alive=state.alive[:, 1:]
        )
        sd_all = sd_all + sd_ft
        state, aux = _attn_part(p, state, cfg, need_scores=True)
        signals = DTPSignals(
            cls_attn=aux.cls_attn, col_mass=aux.col_mass, token_attn=token_attn
        )
        cap = min(capacities[i], state.x.shape[1])
        state, kept, _ovf = dtp_prune_gather(
            state, signals, temperature, cap,
            row_independent=row_independent)
        state = _ffn_part(p, state, cfg)
        kept_list.append(kept)

    xf = layer_norm(params["norm"], state.x, cfg.layer_norm_eps)
    state = TokenState(xf, state.alive, state.bias)
    return state, sd_all, jnp.stack(kept_list)
