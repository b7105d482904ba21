"""Compression fine-tuning steps + epoch harness.

Reference: the per-task ``train()`` loops and epoch drivers
(``compress_nlvr_dtp.py:28-70,173-247`` and siblings).  Each task step is a
pure jitted function ``(params, opt_state, batch, rng, temperature) ->
(params, opt_state, metrics)``; the epoch harness owns the host-side pieces
(LR schedule, temperature controller, logging, checkpointing).

Total loss everywhere: ``loss_task + 0.1 * loss_fdt``
(reference ``compress_nlvr_dtp.py:49``).
"""

from __future__ import annotations

import functools

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from madtp_tpu.models import med as M
from madtp_tpu.models.blip import (
    BlipConfig,
    blip_caption_forward,
    blip_nlvr_forward,
    blip_retrieval_image_features,
    blip_retrieval_text_features,
    blip_vqa_encode,
    fdt_alignment_loss,
)
from madtp_tpu.core.tree import cast_tree
from madtp_tpu.ops.layers import linear
from madtp_tpu.prune.dtp import TokenState
from madtp_tpu.train import losses as L
from madtp_tpu.train.momentum import FeatureQueue, enqueue, momentum_update

FDT_WEIGHT = 0.1


def _amp_cast(amp: bool, params, images):
    """--amp (reference ``compress_nlvr_dtp.py:46-59``: GradScaler +
    autocast): the TPU-native equivalent is bf16 COMPUTE against fp32
    master params — cast the param tree and the image batch to bfloat16
    at the loss-function boundary.  Matmuls then hit the MXU's bf16 path
    with fp32 accumulation (``preferred_element_type`` throughout
    ops/), every loss upcasts its logits to fp32 before log_softmax/CE
    (train/losses.py, models/med.lm_loss), the MAG ``sd`` accumulators
    are fp32 buffers (models/med.py:257), and gradients arrive fp32 (the
    cast's VJP restores the master dtype) — so optimizer state, EMA
    momentum updates and feature queues stay full-precision.  No
    GradScaler counterpart is needed: bf16 carries fp32's exponent
    range, so loss scaling is pointless on TPU (the reference needs it
    only for fp16 CUDA autocast)."""
    if not amp:
        return params, images
    return cast_tree(params, jnp.bfloat16), images.astype(jnp.bfloat16)


def make_nlvr_train_step(cfg: BlipConfig, tx: optax.GradientTransformation,
                         prune_active: bool = True, use_dropout: bool = False,
                         capacities_v=None, capacities_t=None,
                         amp: bool = False):
    """``use_dropout`` enables the reference training recipe (BERT dropout
    0.1, ViT stochastic depth per cfg.vit.drop_path_rate).

    ``capacities_v``/``capacities_t`` (static tuples) switch the towers to
    the gather fast path during TRAINING (--fast_train): the reference's
    training steps get faster as tokens are pruned because its sequences
    physically shrink (dynamic shapes); mask mode pays full-buffer FLOPs
    every step, gather mode banks the reduction at the cost of one
    recompile per distinct schedule.  Gradients are identical to mask mode
    at lossless capacities (tests/test_train.py::
    test_gather_mode_training_grads_match_mask_mode).

    ``amp``: bf16-compute mixed precision (see :func:`_amp_cast`)."""

    def loss_fn(params, images, ids, mask, targets, temperature, rng):
        params, images = _amp_cast(amp, params, images)
        loss_ori, loss_fdt, logits = blip_nlvr_forward(
            params, images, ids, mask, cfg,
            temperature=temperature, prune_active=prune_active,
            train=True, targets=targets,
            dropout_rng=rng if use_dropout else None,
            capacities_v=capacities_v, capacities_t=capacities_t,
        )
        loss = loss_ori + FDT_WEIGHT * loss_fdt
        return loss, {"loss": loss, "loss_ori": loss_ori, "loss_fdt": loss_fdt}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, images, ids, mask, targets, temperature,
             rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, ids, mask, targets, temperature, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_caption_train_step(cfg: BlipConfig, tx: optax.GradientTransformation,
                            prune_active: bool = True,
                            use_dropout: bool = False,
                            capacities_v=None, amp: bool = False):
    """Reference models/blip.py:111-159: LM loss + FDT (image side only; the
    decoder runs unpruned so sd_txt_ft is None -> loss_fdt falls back to
    loss_lm exactly like the reference's default).

    ``capacities_v`` (static tuple): --fast_train gather-mode ViT tower
    (see :func:`make_nlvr_train_step`)."""

    def loss_fn(params, images, ids, mask, labels, temperature, rng):
        params, images = _amp_cast(amp, params, images)
        loss_lm, sd_img_ft, _ = blip_caption_forward(
            params, images, ids, mask, cfg,
            temperature=temperature, prune_active=prune_active, labels=labels,
            dropout_rng=rng if use_dropout else None,
            capacities=capacities_v,
        )
        loss_fdt = loss_lm  # reference fallback when sd_txt_ft is None
        loss = loss_lm + FDT_WEIGHT * loss_fdt
        return loss, {"loss": loss, "loss_lm": loss_lm, "loss_fdt": loss_fdt}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, images, ids, mask, labels, temperature,
             rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, ids, mask, labels, temperature, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_vqa_train_step(cfg: BlipConfig, tx: optax.GradientTransformation,
                        max_answers_per_q: int, prune_active: bool = True,
                        capacities_v=None, capacities_t=None,
                        amp: bool = False):
    """Reference models/blip_vqa.py:67-115.  The ragged per-question answer
    lists are padded to ``max_answers_per_q`` with zero weights (static
    shapes); weighted per-answer LM losses sum to the reference's
    ``(weights * loss).sum() / B``.

    ``capacities_v``/``capacities_t`` (static tuples): --fast_train
    gather-mode towers (see :func:`make_nlvr_train_step`)."""

    def loss_fn(params, images, q_ids, q_mask, a_ids, a_mask, weights,
                temperature):
        params, images = _amp_cast(amp, params, images)
        B = q_ids.shape[0]
        K = max_answers_per_q
        out, sd_img_ft, _ = blip_vqa_encode(
            params, images, q_ids, q_mask, cfg,
            temperature=temperature, prune_active=prune_active,
            capacities_v=capacities_v, capacities_t=capacities_t,
        )
        qs = out.state

        def tile(a):
            return jnp.repeat(a, K, axis=0) if a is not None else None

        tiled = TokenState(tile(qs.x), tile(qs.alive), tile(qs.bias))
        ids = a_ids.reshape(B * K, -1)
        msk = a_mask.reshape(B * K, -1)
        targets = jnp.where(ids == 0, -100, ids)
        hidden = M.med_decoder_forward(
            params["text_decoder"], ids, msk, cfg.med, encoder_state=tiled
        )
        logits = M.lm_head(params["text_decoder"], hidden, cfg.med)
        per = M.lm_loss(logits, targets, reduction="none")  # [B*K]
        loss_vqa = jnp.sum(weights.reshape(-1) * per) / B

        loss_fdt = loss_vqa
        if prune_active and sd_img_ft is not None and out.sd_txt_ft is not None:
            loss_fdt = fdt_alignment_loss(sd_img_ft, out.sd_txt_ft, cfg.sd_dim)
        loss = loss_vqa + FDT_WEIGHT * loss_fdt
        return loss, {"loss": loss, "loss_vqa": loss_vqa, "loss_fdt": loss_fdt}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, images, q_ids, q_mask, a_ids, a_mask, weights,
             temperature):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, q_ids, q_mask, a_ids, a_mask, weights, temperature
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


class RetrievalTrainState(NamedTuple):
    params: dict
    params_m: dict  # momentum copies of the four tower/proj trees
    opt_state: optax.OptState
    queue: FeatureQueue
    temp: jnp.ndarray  # learnable ITC temperature, clamped [0.001, 0.5]


MOMENTUM_KEYS = ("visual_encoder", "vision_proj", "text_encoder", "text_proj")


def make_retrieval_train_step(cfg: BlipConfig, tx: optax.GradientTransformation,
                              *, alpha: float = 0.4, momentum: float = 0.995,
                              enc_token_id: int, prune_active: bool = True,
                              negative_all_rank: bool = False,
                              data_shards: int = 1,
                              capacities_v=None, capacities_t=None,
                              amp: bool = False):
    """Full ITC+ITM compression step (reference models/blip_retrieval.py:99-282):
    momentum towers + queue soft targets, hard-negative ITM, FDT losses from
    both online and momentum towers.

    Cross-rank semantics under GSPMD (single controller, batch sharded over
    'data' into ``data_shards`` contiguous blocks — each block is one
    reference "rank"):

    * ``negative_all_rank=True``: hard negatives are drawn from the whole
      global batch; the similarity matmul over the sharded features IS the
      reference's ``all_gather_with_grad`` (``:209``) — XLA inserts the
      (differentiable) all-gather, and the cross-shard ``vstate.x[neg]``
      gather carries gradient exactly like GatherLayer (``:348-380``).
    * ``negative_all_rank=False``: candidates are restricted to the query's
      own block — the reference's same-rank mining (``:229-258``).
    * the queue always receives the full global momentum batch — the
      reference's ``concat_all_gather`` before ``_dequeue_and_enqueue``
      (``:172-173,334-345``).

    ``alpha`` (the soft-target mixing weight) is the factory-level default;
    the returned ``step`` also accepts a per-batch traced ``alpha`` so the
    reference's first-epoch linear warmup
    (``compress_retrieval_dtp.py:49-53``:
    ``alpha = config['alpha'] * min(1, i/len(loader))`` at epoch 0) runs
    without recompiling — like ``temperature``, it is a traced scalar.

    Sharded vs single-device runs of the same global batch are numerically
    identical (tests/test_spmd.py)."""

    def towers(params, images, ids, mask, temperature):
        img_feat, vstate, sd_img = blip_retrieval_image_features(
            params, images, cfg, temperature=temperature,
            prune_active=prune_active, capacities=capacities_v,
        )
        txt_feat, tout = blip_retrieval_text_features(
            params, ids, mask, cfg, temperature=temperature,
            prune_active=prune_active, capacities=capacities_t,
        )
        return img_feat, vstate, sd_img, txt_feat, tout

    def loss_fn(params, params_m, queue, temp, rng, images, ids, mask, idx,
                temperature, alpha_t):
        params, images = _amp_cast(amp, params, images)
        if amp:  # momentum towers compute in bf16 too (stop-grad, no VJP)
            params_m = cast_tree(params_m, jnp.bfloat16)
        B = ids.shape[0]
        img_feat, vstate, sd_img, txt_feat, tout = towers(
            params, images, ids, mask, temperature
        )
        sd_txt = tout.sd_txt_ft

        # momentum features (stop-grad; EMA applied outside)
        m_img_feat, _, sd_img_m, m_txt_feat, m_tout = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            towers({**params, **params_m}, images, ids, mask, temperature),
        )
        sd_txt_m = m_tout.sd_txt_ft

        idx_all = jnp.concatenate([idx, queue.idx])
        sim_targets = L.id_match_targets(idx, idx_all)
        img_m_all = jnp.concatenate([m_img_feat.T, queue.image], axis=1)
        txt_m_all = jnp.concatenate([m_txt_feat.T, queue.text], axis=1)

        t_i2t = jax.lax.stop_gradient(
            L.itc_soft_targets(m_img_feat, txt_m_all, sim_targets, temp,
                               alpha_t))
        t_t2i = jax.lax.stop_gradient(
            L.itc_soft_targets(m_txt_feat, img_m_all, sim_targets, temp,
                               alpha_t))
        loss_ita = 0.5 * (
            L.itc_loss(img_feat, txt_m_all, t_i2t, temp)
            + L.itc_loss(txt_feat, img_m_all, t_t2i, temp)
        )

        # FDT alignment (online + momentum towers, reference :154-171)
        loss_fdt = loss_ita
        loss_fdt_m = loss_ita
        if prune_active and sd_img is not None and sd_txt is not None:
            loss_fdt = fdt_alignment_loss(sd_img, sd_txt, cfg.sd_dim)
            loss_fdt_m = fdt_alignment_loss(sd_img_m, sd_txt_m, cfg.sd_dim)

        # ITM with hard negatives (reference :229-281); group restriction
        # implements negative_all_rank=False (same-shard mining only)
        group = None
        if not negative_all_rank and data_shards > 1:
            group = jnp.arange(B) * data_shards // B  # contiguous shard blocks
        enc_ids = ids.at[:, 0].set(enc_token_id)
        k1, k2 = jax.random.split(rng)
        neg_img = L.sample_hard_negatives(
            k1, txt_feat, img_feat, idx, idx, temp,
            group_a=group, group_b=group)  # image index per text
        neg_txt = L.sample_hard_negatives(
            k2, img_feat, txt_feat, idx, idx, temp,
            group_a=group, group_b=group)  # text index per image

        ids_all = jnp.concatenate([enc_ids, enc_ids, enc_ids[neg_txt]], axis=0)
        mask_all = jnp.concatenate([mask, mask, mask[neg_txt]], axis=0)
        vx = jnp.concatenate(
            [vstate.x, vstate.x[neg_img], vstate.x], axis=0)
        va = jnp.concatenate(
            [vstate.alive, vstate.alive[neg_img], vstate.alive], axis=0)
        out = M.med_encoder(
            params["text_encoder"], ids_all, mask_all, cfg.med,
            mode="multimodal", encoder_state=TokenState(vx, va, None),
            space_dict=params["space_dict"], temperature=temperature,
            prune_active=prune_active, capacities=capacities_t,
        )
        vl = linear(params["itm_head"], out.state.x[:, 0, :])
        loss_itm = L.itm_loss(vl, B)

        loss = (loss_ita + loss_itm
                + FDT_WEIGHT * loss_fdt + FDT_WEIGHT * loss_fdt_m)
        metrics = {"loss": loss, "loss_ita": loss_ita, "loss_itm": loss_itm,
                   "loss_fdt": loss_fdt, "loss_fdt_m": loss_fdt_m}
        # queue features stay fp32 regardless of amp (the reference's queue
        # buffers are fp32 and autocast outputs are cast on copy_)
        return loss, (metrics, m_img_feat.astype(jnp.float32),
                      m_txt_feat.astype(jnp.float32))

    # NOTE: no donation here — RetrievalTrainState aliases params/params_m
    # leaves at init (momentum towers start as references to the same
    # buffers), and XLA rejects donating one buffer twice.
    @jax.jit
    def step(state: RetrievalTrainState, rng, images, ids, mask, idx,
             temperature, alpha_t=None):
        a = alpha if alpha_t is None else alpha_t  # None is trace-static
        temp = jnp.clip(state.temp, 0.001, 0.5)  # reference :100-101
        params_m = momentum_update(
            {k: state.params[k] for k in MOMENTUM_KEYS}, state.params_m,
            momentum,
        )
        (_, (metrics, m_img, m_txt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, params_m, state.queue, temp, rng, images, ids, mask,
          idx, temperature, a)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        queue = enqueue(state.queue, m_img, m_txt, idx)
        return RetrievalTrainState(params, params_m, opt_state, queue, temp), metrics

    return step


class ClipTrainState(NamedTuple):
    params: dict
    params_m: dict  # momentum tower copies
    opt_state: optax.OptState
    queue: FeatureQueue
    space_dict: jnp.ndarray  # shared FDT codebook (trained)


CLIP_MOMENTUM_KEYS = ("visual", "token_embedding", "positional_embedding",
                      "blocks", "ln_final", "text_projection")


def make_clip_train_step(cfg, tx: optax.GradientTransformation, *,
                         alpha: float = 0.4, momentum: float = 0.995,
                         prune_active: bool = True, capacities_v=None,
                         amp: bool = False):
    """CLIP compression step (reference clip/model.py:529-595): queue-based
    soft-target InfoNCE on both towers + FDT alignment from online AND
    momentum towers; logit_scale clamped to [0, 4.6052] (:530-531).

    ``capacities_v`` (static tuple): --fast_train gather-mode vision tower
    (see :func:`make_nlvr_train_step`; the causal text tower stays
    mask-mode).

    ``alpha``: factory default; ``step`` also takes a per-batch traced
    ``alpha`` for the reference's epoch-0 linear warmup
    (``compress_retrieval_clip_dtp.py:45-49``) — no recompile per batch."""
    from madtp_tpu.models.blip import fdt_alignment_loss
    from madtp_tpu.models.clip import clip_encode_image, clip_encode_text

    def towers(params, space_dict, images, text, temperature):
        img, sd_img, _ = clip_encode_image(
            params, images, cfg, space_dict=space_dict,
            temperature=temperature, prune_active=prune_active,
            capacities=capacities_v)
        txt, sd_txt, _ = clip_encode_text(
            params, text, cfg, space_dict=space_dict,
            temperature=temperature, prune_active=prune_active)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return img, txt, sd_img, sd_txt

    def loss_fn(params, space_dict, params_m, queue, images, text, idx,
                temperature, alpha_t):
        # logit_scale read in fp32 BEFORE the amp cast (exp in bf16 would
        # quantize the temperature; the reference keeps it fp32 under
        # autocast too — scalar params are autocast-exempt)
        logit_scale = jnp.exp(jnp.clip(params["logit_scale"].astype(
            jnp.float32), 0.0, 4.6052))
        params, images = _amp_cast(amp, params, images)
        if amp:
            params_m = cast_tree(params_m, jnp.bfloat16)
            space_dict = space_dict.astype(jnp.bfloat16)
        img, txt, sd_img, sd_txt = towers(params, space_dict, images, text,
                                          temperature)
        # reference quirk, mirrored for parity (clip/model.py:508-526):
        # encode_text_m runs the ONLINE transformer + ln_final with the
        # MOMENTUM token/positional embeddings and text projection — the
        # transformer_m/ln_final_m copies are EMA-updated but never used
        # (golden-tested in tests/test_golden_train_losses.py)
        m_params = {**params, **params_m,
                    "blocks": params["blocks"],
                    "ln_final": params["ln_final"]}
        m_img, m_txt, sd_img_m, sd_txt_m = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            towers(m_params, space_dict, images, text, temperature))

        idx_all = jnp.concatenate([idx, queue.idx])
        sim_targets = L.id_match_targets(idx, idx_all)
        img_all = jnp.concatenate([m_img.T, queue.image], axis=1)
        txt_all = jnp.concatenate([m_txt.T, queue.text], axis=1)

        sim_i2t_m = logit_scale * (m_img @ txt_all)
        sim_t2i_m = logit_scale * (m_txt @ img_all)
        t_i2t = jax.lax.stop_gradient(
            alpha_t * jax.nn.softmax(sim_i2t_m, axis=1)
            + (1 - alpha_t) * sim_targets)
        t_t2i = jax.lax.stop_gradient(
            alpha_t * jax.nn.softmax(sim_t2i_m, axis=1)
            + (1 - alpha_t) * sim_targets)

        lp_i = jax.nn.log_softmax(logit_scale * (img @ txt_all), axis=1)
        lp_t = jax.nn.log_softmax(logit_scale * (txt @ img_all), axis=1)
        loss_ita = 0.5 * (-jnp.mean(jnp.sum(lp_i * t_i2t, axis=1))
                          - jnp.mean(jnp.sum(lp_t * t_t2i, axis=1)))

        loss_fdt = loss_ita
        loss_fdt_m = loss_ita
        if prune_active and sd_img is not None and sd_txt is not None:
            loss_fdt = fdt_alignment_loss(sd_img, sd_txt, cfg.sd_dim)
            loss_fdt_m = fdt_alignment_loss(sd_img_m, sd_txt_m, cfg.sd_dim)
        loss = loss_ita + FDT_WEIGHT * loss_fdt + FDT_WEIGHT * loss_fdt_m
        metrics = {"loss": loss, "loss_ita": loss_ita, "loss_fdt": loss_fdt,
                   "loss_fdt_m": loss_fdt_m}
        # queue buffers stay fp32 under amp (see make_retrieval_train_step)
        return loss, (metrics, img.astype(jnp.float32),
                      txt.astype(jnp.float32))

    # NOTE: no donation — ClipTrainState aliases params/params_m at init.
    @jax.jit
    def step(state: ClipTrainState, images, text, idx, temperature,
             alpha_t=None):
        a = alpha if alpha_t is None else alpha_t  # None is trace-static
        params_m = momentum_update(
            {k: state.params[k] for k in CLIP_MOMENTUM_KEYS}, state.params_m,
            momentum)
        (_, (metrics, img, txt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True, argnums=(0, 1)
        )(state.params, state.space_dict, params_m, state.queue, images, text,
          idx, temperature, a)
        updates, opt_state = tx.update(
            {"params": grads[0], "space_dict": grads[1]}, state.opt_state,
            {"params": state.params, "space_dict": state.space_dict})
        new = optax.apply_updates(
            {"params": state.params, "space_dict": state.space_dict}, updates)
        queue = enqueue(state.queue, img, txt, idx)
        return ClipTrainState(new["params"], params_m, opt_state, queue,
                              new["space_dict"]), metrics

    return step
