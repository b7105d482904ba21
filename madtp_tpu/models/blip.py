"""BLIP task models assembled from ViT + MED, as pure functions on param trees.

Covers the reference model zoo (SURVEY.md §2.2):

* :func:`blip_nlvr_forward` — ``models/blip_nlvr.py`` (twin cross-attention
  reasoning head; 2-image batch-concat trick at ``:64-79``);
* :func:`blip_caption_forward` / decode helpers — ``models/blip.py``
  (BLIP_Decoder);
* :func:`blip_vqa_encode` + ranking in tasks/vqa — ``models/blip_vqa.py``;
* :func:`blip_retrieval_features` / ITM scoring — ``models/blip_retrieval.py``.

Tokenization happens in the data layer (outside jit), matching TPU execution
semantics; the reference tokenizes inside ``forward`` on the host
(``models/blip_nlvr.py:68``), a per-step host stall this design removes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.core.config import MedConfig, ViTConfig
from madtp_tpu.models import med as M
from madtp_tpu.models.vit import vit_forward
from madtp_tpu.ops.layers import cosine_embedding_loss, linear
from madtp_tpu.prune.dtp import TokenState


class BlipConfig(NamedTuple):
    vit: ViTConfig
    med: MedConfig
    sd_num: int = 100
    sd_dim: int = 768


def _split_state(state: TokenState, n: int) -> Tuple[TokenState, TokenState]:
    return (
        TokenState(state.x[:n], state.alive[:n],
                   None if state.bias is None else state.bias[:n]),
        TokenState(state.x[n:], state.alive[n:],
                   None if state.bias is None else state.bias[n:]),
    )


def fdt_alignment_loss(sd_img_ft, sd_txt_ft, sd_dim: int):
    """Cross-modal FDT loss: CosineEmbeddingLoss(+1) over L2-normalized,
    depth-accumulated MAG features (reference models/blip_nlvr.py:86-96)."""
    a = sd_img_ft / (jnp.linalg.norm(sd_img_ft, axis=-1, keepdims=True) + 1e-10)
    b = sd_txt_ft / (jnp.linalg.norm(sd_txt_ft, axis=-1, keepdims=True) + 1e-10)
    return cosine_embedding_loss(a.reshape(-1, sd_dim), b.reshape(-1, sd_dim))


# ---------------------------------------------------------------------------
# NLVR
# ---------------------------------------------------------------------------


def blip_nlvr_forward(
    params,
    images: jnp.ndarray,  # [2B, 3, H, W] (image0 ++ image1 on batch)
    text_ids: jnp.ndarray,  # [B, N]
    text_mask: jnp.ndarray,  # [B, N]
    cfg: BlipConfig,
    *,
    temperature=0.0,
    prune_active: bool = False,
    train: bool = False,
    targets: Optional[jnp.ndarray] = None,
    dropout_rng=None,
    capacities_v=None,
    capacities_t=None,
    row_independent: bool = False,
):
    """Reference models/blip_nlvr.py:63-100.  Returns logits [B,2] at eval or
    (loss_ori, loss_fdt, logits) at train.

    ``capacities_v``/``capacities_t`` (static tuples) switch both towers to
    the gather fast path — identical DTP decisions, physically compacted to
    the calibrated per-layer schedule (eval --fast_eval and --fast_train).

    ``row_independent`` (serving mode): per-row DTP — NOTE the vision tower
    runs on the [2B] image stack, so each IMAGE of a pair prunes on its own
    counts (a batch-1 live call couples the pair through the batch max);
    kept counts become per-row ([L, 2B] vision / [L, B] text)."""
    B = text_ids.shape[0]
    r_v = r_t = None
    if dropout_rng is not None:
        r_v, r_t = jax.random.split(dropout_rng)
    vstate, sd_img_ft, v_kept = vit_forward(
        params["visual_encoder"], images, cfg=cfg.vit,
        space_dict=params["space_dict"], temperature=temperature,
        prune_active=prune_active, dropout_rng=r_v,
        capacities=capacities_v, row_independent=row_independent,
    )
    st0, st1 = _split_state(vstate, B)
    out = M.med_encoder(
        params["text_encoder"], text_ids, text_mask, cfg.med,
        mode="multimodal", encoder_state=st0, encoder_state1=st1,
        space_dict=params["space_dict"], temperature=temperature,
        prune_active=prune_active, dropout_rng=r_t,
        capacities=capacities_t, row_independent=row_independent,
    )
    hidden = out.state.x[:, 0, :]
    h = jax.nn.relu(linear(params["cls_head"]["fc1"], hidden))
    logits = linear(params["cls_head"]["fc2"], h)

    if not train:
        return logits, (v_kept, out.kept_counts)

    loss_ori = -jnp.mean(
        jnp.take_along_axis(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
            targets[:, None], axis=-1,
        )
    )
    loss_fdt = loss_ori
    if prune_active and sd_img_ft is not None and out.sd_txt_ft is not None:
        # average the two images' FDT features (reference :88-89)
        sd_img = (sd_img_ft[:B] + sd_img_ft[B:]) / 2.0
        loss_fdt = fdt_alignment_loss(sd_img, out.sd_txt_ft, cfg.sd_dim)
    return loss_ori, loss_fdt, logits


# ---------------------------------------------------------------------------
# Caption (BLIP_Decoder)
# ---------------------------------------------------------------------------


def blip_caption_encode_image(params, images, cfg: BlipConfig, *,
                              temperature=0.0, prune_active=False,
                              dropout_rng=None, capacities=None,
                              row_independent=False):
    """Visual half of BLIP_Decoder (pruning happens once on image tokens,
    reference models/blip.py:161-163).

    ``row_independent`` (serving): per-row DTP on the image tokens; the
    beam decode downstream is per-row by construction (each row's beams
    attend only to that row's tokens), so the whole caption step becomes
    row-exact — different requests may merge into one device call."""
    return vit_forward(
        params["visual_encoder"], images, cfg=cfg.vit,
        space_dict=params["space_dict"], temperature=temperature,
        prune_active=prune_active, dropout_rng=dropout_rng,
        capacities=capacities, row_independent=row_independent,
    )


def blip_caption_forward(
    params, images, text_ids, text_mask, cfg: BlipConfig, *,
    temperature=0.0, prune_active=False, labels=None, dropout_rng=None,
    capacities=None,
):
    """Training/scoring pass (reference models/blip.py:111-159).  The decoder
    runs without text pruning (space_dict not passed there, reference
    :124-133).  ``capacities`` (static tuple): gather-mode ViT tower."""
    vstate, sd_img_ft, _ = blip_caption_encode_image(
        params, images, cfg, temperature=temperature,
        prune_active=prune_active, dropout_rng=dropout_rng,
        capacities=capacities,
    )
    hidden = M.med_decoder_forward(
        params["text_decoder"], text_ids, text_mask, cfg.med,
        encoder_state=vstate,
    )
    logits = M.lm_head(params["text_decoder"], hidden, cfg.med)
    if labels is None:
        return logits
    loss_lm = M.lm_loss(logits, labels)
    return loss_lm, sd_img_ft, logits


# ---------------------------------------------------------------------------
# VQA
# ---------------------------------------------------------------------------


def blip_vqa_encode(
    params, images, q_ids, q_mask, cfg: BlipConfig, *,
    temperature=0.0, prune_active=False, capacities_v=None, capacities_t=None,
    row_independent=False,
):
    """Image encoder + question encoder with image cross-attention
    (reference models/blip_vqa.py:60-82,118-125).  Returns the question
    encoder output (its ``.state`` is the cross-attn memory for the answer
    decoder), FDT features, and the ViT tower's per-layer kept counts (the
    analytic-FLOPs input — discarding them forced callers to re-run the
    vision tower or mis-account GFLOPs with dense counts).

    ``row_independent`` (serving): per-row DTP in both towers; the answer
    rank downstream tiles each question's memory independently, so the
    whole VQA rank step becomes row-exact."""
    vstate, sd_img_ft, v_kept = vit_forward(
        params["visual_encoder"], images, cfg=cfg.vit,
        space_dict=params["space_dict"], temperature=temperature,
        prune_active=prune_active, capacities=capacities_v,
        row_independent=row_independent,
    )
    out = M.med_encoder(
        params["text_encoder"], q_ids, q_mask, cfg.med,
        mode="multimodal", encoder_state=vstate,
        space_dict=params["space_dict"], temperature=temperature,
        prune_active=prune_active, capacities=capacities_t,
        row_independent=row_independent,
    )
    return out, sd_img_ft, v_kept


# ---------------------------------------------------------------------------
# Retrieval (ITC + ITM)
# ---------------------------------------------------------------------------


def blip_retrieval_image_features(params, images, cfg: BlipConfig, *,
                                  temperature=0.0, prune_active=False,
                                  capacities=None, row_independent=False):
    """Image tower + projection (reference models/blip_retrieval.py:103-105).
    Returns (feat [B,E] L2-normalized, TokenState for ITM rerank, sd_img_ft)."""
    vstate, sd_img_ft, _ = vit_forward(
        params["visual_encoder"], images, cfg=cfg.vit,
        space_dict=params["space_dict"], temperature=temperature,
        prune_active=prune_active, capacities=capacities,
        row_independent=row_independent,
    )
    feat = linear(params["vision_proj"], vstate.x[:, 0, :])
    feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
    return feat, vstate, sd_img_ft


def blip_retrieval_text_features(params, text_ids, text_mask, cfg: BlipConfig, *,
                                 temperature=0.0, prune_active=False,
                                 capacities=None, row_independent=False):
    """Text tower in 'text' mode + projection
    (reference models/blip_retrieval.py:110-114)."""
    out = M.med_encoder(
        params["text_encoder"], text_ids, text_mask, cfg.med,
        mode="text", space_dict=params["space_dict"],
        temperature=temperature, prune_active=prune_active,
        capacities=capacities, row_independent=row_independent,
    )
    feat = linear(params["text_proj"], out.state.x[:, 0, :])
    feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
    return feat, out


def blip_itm_score(params, text_ids, text_mask, image_state: TokenState,
                   cfg: BlipConfig, *, temperature=0.0, prune_active=False,
                   capacities=None, row_independent=False):
    """ITM head over the multimodal encoder's CLS (reference
    compress_retrieval_dtp.py:166-178): returns logits[:, 1] as the match
    score."""
    out = M.med_encoder(
        params["text_encoder"], text_ids, text_mask, cfg.med,
        mode="multimodal", encoder_state=image_state,
        space_dict=params["space_dict"], temperature=temperature,
        prune_active=prune_active, capacities=capacities,
        row_independent=row_independent,
    )
    logits = linear(params["itm_head"], out.state.x[:, 0, :])
    return logits[:, 1]


# ---------------------------------------------------------------------------
# Checkpoint assembly
# ---------------------------------------------------------------------------


def load_blip_nlvr(path: str, cfg: BlipConfig):
    """Load a BLIP-NLVR checkpoint (base or compressed) into our tree.
    Returns (params, temperature)."""
    from madtp_tpu.ckpt import load_state_dict, remap_med, remap_vit

    sd, extras = load_state_dict(path)
    params = {
        "visual_encoder": remap_vit(sd, num_patches=cfg.vit.num_patches),
        "text_encoder": remap_med(sd, "text_encoder.", twin_cross=True),
        "space_dict": np.asarray(sd["space_dict"], np.float32)
        if "space_dict" in sd
        else np.random.RandomState(0).randn(cfg.sd_num, cfg.sd_dim).astype(np.float32),
        "cls_head": {
            "fc1": {"kernel": np.ascontiguousarray(np.asarray(sd["cls_head.0.weight"], np.float32).T),
                    "bias": np.asarray(sd["cls_head.0.bias"], np.float32)},
            "fc2": {"kernel": np.ascontiguousarray(np.asarray(sd["cls_head.2.weight"], np.float32).T),
                    "bias": np.asarray(sd["cls_head.2.bias"], np.float32)},
        },
    }
    return params, float(extras.get("temperature", 0.0))


def load_blip_retrieval(path: str, cfg: BlipConfig, load_momentum: bool = False):
    from madtp_tpu.ckpt import load_state_dict, remap_med, remap_vit

    def lin(sd, p):
        return {"kernel": np.ascontiguousarray(np.asarray(sd[p + ".weight"], np.float32).T),
                "bias": np.asarray(sd[p + ".bias"], np.float32)}

    sd, extras = load_state_dict(path)
    params = {
        "visual_encoder": remap_vit(sd, num_patches=cfg.vit.num_patches),
        "text_encoder": remap_med(sd, "text_encoder."),
        "space_dict": np.asarray(sd["space_dict"], np.float32),
        "vision_proj": lin(sd, "vision_proj"),
        "text_proj": lin(sd, "text_proj"),
        "itm_head": lin(sd, "itm_head"),
    }
    if load_momentum:
        # momentum towers when present (reference models/blip_retrieval.py:69-81
        # keeps _m copies in the checkpoint); fall back to copies of the online
        # towers like the reference's copy_params init (:285-291)
        has_m = any(k.startswith("visual_encoder_m.") for k in sd)
        params_m = {
            "visual_encoder": remap_vit(sd, "visual_encoder_m.",
                                        num_patches=cfg.vit.num_patches)
            if has_m else params["visual_encoder"],
            "text_encoder": remap_med(sd, "text_encoder_m.")
            if has_m else params["text_encoder"],
            "vision_proj": lin(sd, "vision_proj_m") if has_m
            else params["vision_proj"],
            "text_proj": lin(sd, "text_proj_m") if has_m
            else params["text_proj"],
        }
        temp = float(np.asarray(sd.get("temp", 0.07)))
        return params, params_m, temp, float(extras.get("temperature", 0.0))
    return params, float(extras.get("temperature", 0.0))


def load_blip_caption(path: str, cfg: BlipConfig):
    from madtp_tpu.ckpt import load_state_dict, remap_med, remap_vit

    sd, extras = load_state_dict(path)
    params = {
        "visual_encoder": remap_vit(sd, num_patches=cfg.vit.num_patches),
        "text_decoder": remap_med(sd, "text_decoder.", has_lm_head=True),
        "space_dict": np.asarray(sd["space_dict"], np.float32),
    }
    return params, float(extras.get("temperature", 0.0))


def load_blip_vqa(path: str, cfg: BlipConfig):
    from madtp_tpu.ckpt import load_state_dict, remap_med, remap_vit

    sd, extras = load_state_dict(path)
    params = {
        "visual_encoder": remap_vit(sd, num_patches=cfg.vit.num_patches),
        "text_encoder": remap_med(sd, "text_encoder."),
        "text_decoder": remap_med(sd, "text_decoder.", has_lm_head=True),
        "space_dict": np.asarray(sd["space_dict"], np.float32),
    }
    return params, float(extras.get("temperature", 0.0))


def blip_base_features(
    params, cfg: BlipConfig, *, images=None, text_ids=None, text_mask=None,
    mode: str = "multimodal", enc_token_id: Optional[int] = None,
):
    """BLIP_Base feature extractor (reference models/blip.py:18-69):
    'image' -> ViT token features; 'text' -> text-encoder hidden states;
    'multimodal' -> cross-attended hidden states (text ids' slot 0 replaced
    with [ENC] like the reference :62)."""
    assert mode in ("image", "text", "multimodal")
    if mode == "image":
        state, _, _ = vit_forward(params["visual_encoder"], images, cfg=cfg.vit)
        return state.x
    if mode == "text":
        out = M.med_encoder(
            params["text_encoder"], text_ids, text_mask, cfg.med, mode="text")
        return out.state.x
    vstate, _, _ = vit_forward(params["visual_encoder"], images, cfg=cfg.vit)
    ids = text_ids if enc_token_id is None else text_ids.at[:, 0].set(enc_token_id)
    out = M.med_encoder(
        params["text_encoder"], ids, text_mask, cfg.med,
        mode="multimodal", encoder_state=vstate)
    return out.state.x


def blip_itm_logits(params, text_ids, text_mask, image_state: TokenState,
                    cfg: BlipConfig, *, head: str = "itm",
                    temperature=0.0, prune_active: bool = False):
    """BLIP_ITM scoring head (reference models/blip_itm.py): 'itm' -> 2-way
    match logits from the multimodal CLS; 'itc' -> cosine similarity of the
    projected unimodal features."""
    if head == "itm":
        out = M.med_encoder(
            params["text_encoder"], text_ids, text_mask, cfg.med,
            mode="multimodal", encoder_state=image_state,
            space_dict=params.get("space_dict"), temperature=temperature,
            prune_active=prune_active,
        )
        return linear(params["itm_head"], out.state.x[:, 0, :])
    out = M.med_encoder(
        params["text_encoder"], text_ids, text_mask, cfg.med, mode="text",
        space_dict=params.get("space_dict"), temperature=temperature,
        prune_active=prune_active,
    )
    tf = linear(params["text_proj"], out.state.x[:, 0, :])
    tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
    vf = linear(params["vision_proj"], image_state.x[:, 0, :])
    vf = vf / jnp.linalg.norm(vf, axis=-1, keepdims=True)
    return jnp.sum(vf * tf, axis=-1)


def blip_pretrain_losses(params, images, text_ids, text_mask, dec_ids,
                         dec_mask, dec_labels, idx, queue, temp, alpha,
                         rng, cfg: BlipConfig, *, enc_token_id: int):
    """BLIP_Pretrain objectives (reference models/blip_pretrain.py, legacy —
    no reference entry script uses it; provided for capability parity):
    ITC with queue soft targets + hard-negative ITM + LM captioning.
    Expects the retrieval param layout plus a ``text_decoder`` tree; momentum
    handling follows train/loops.make_retrieval_train_step."""
    from madtp_tpu.train import losses as L

    B = text_ids.shape[0]
    img_feat, vstate, _ = blip_retrieval_image_features(params, images, cfg)
    txt_feat, tout = blip_retrieval_text_features(params, text_ids, text_mask, cfg)

    idx_all = jnp.concatenate([idx, queue.idx])
    sim_targets = L.id_match_targets(idx, idx_all)
    img_all = jnp.concatenate([img_feat.T, queue.image], axis=1)
    txt_all = jnp.concatenate([txt_feat.T, queue.text], axis=1)
    loss_ita = 0.5 * (
        L.itc_loss(img_feat, txt_all, sim_targets, temp)
        + L.itc_loss(txt_feat, img_all, sim_targets, temp)
    )

    enc_ids = text_ids.at[:, 0].set(enc_token_id)
    k1, k2 = jax.random.split(rng)
    neg_img = L.sample_hard_negatives(k1, txt_feat, img_feat, idx, idx, temp)
    neg_txt = L.sample_hard_negatives(k2, img_feat, txt_feat, idx, idx, temp)
    ids_all = jnp.concatenate([enc_ids, enc_ids, enc_ids[neg_txt]], axis=0)
    mask_all = jnp.concatenate([text_mask, text_mask, text_mask[neg_txt]], axis=0)
    vx = jnp.concatenate([vstate.x, vstate.x[neg_img], vstate.x], axis=0)
    va = jnp.concatenate([vstate.alive, vstate.alive[neg_img], vstate.alive], axis=0)
    out = M.med_encoder(
        params["text_encoder"], ids_all, mask_all, cfg.med,
        mode="multimodal", encoder_state=TokenState(vx, va, None),
    )
    vl = linear(params["itm_head"], out.state.x[:, 0, :])
    loss_itm = L.itm_loss(vl, B)

    hidden = M.med_decoder_forward(
        params["text_decoder"], dec_ids, dec_mask, cfg.med, encoder_state=vstate)
    logits = M.lm_head(params["text_decoder"], hidden, cfg.med)
    loss_lm = M.lm_loss(logits, dec_labels)
    return loss_ita, loss_itm, loss_lm
