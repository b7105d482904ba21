"""NLVR2 task: eval + compression-train epochs.

Reference: ``compress_nlvr_dtp.py`` (271 LoC driver).  The eval loop returns
both accuracy and the analytic per-sample GFLOPs (replacing per-batch fvcore
tracing, reference ``:93-98``), which feeds the temperature controller.
"""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.models.blip import BlipConfig, blip_nlvr_forward
from madtp_tpu.prune.flops import nlvr_gflops
from madtp_tpu.utils.cache import BoundedCache
from madtp_tpu.utils.logging import MetricLogger

# bounded (LRU-8) like every other step cache: per-epoch recalibrated
# capacity tuples under --fast_train would otherwise accumulate compiled
# executables for the process lifetime
_EVAL_STEP_CACHE: BoundedCache = BoundedCache(maxsize=8)


def make_eval_step(cfg: BlipConfig, prune_active: bool,
                   capacities_v=None, capacities_t=None,
                   row_independent: bool = False):
    key = (cfg, prune_active, capacities_v, capacities_t, row_independent)
    if key not in _EVAL_STEP_CACHE:
        _EVAL_STEP_CACHE[key] = _build_eval_step(
            cfg, prune_active, capacities_v, capacities_t, row_independent)
    return _EVAL_STEP_CACHE[key]


def _build_eval_step(cfg: BlipConfig, prune_active: bool,
                     capacities_v=None, capacities_t=None,
                     row_independent: bool = False):
    if capacities_v is not None:
        from madtp_tpu.models import med as M
        from madtp_tpu.models.blip import _split_state
        from madtp_tpu.models.vit import vit_forward
        from madtp_tpu.ops.layers import linear

        @jax.jit
        def step(params, images, ids, mask, t):
            B = ids.shape[0]
            vstate, _, vk = vit_forward(
                params["visual_encoder"], images, cfg=cfg.vit,
                space_dict=params["space_dict"], temperature=t,
                prune_active=True, capacities=capacities_v,
                row_independent=row_independent,
            )
            st0, st1 = _split_state(vstate, B)
            out = M.med_encoder(
                params["text_encoder"], ids, mask, cfg.med,
                mode="multimodal", encoder_state=st0, encoder_state1=st1,
                space_dict=params["space_dict"], temperature=t,
                prune_active=True, capacities=capacities_t,
                row_independent=row_independent,
            )
            h = jax.nn.relu(linear(params["cls_head"]["fc1"], out.state.x[:, 0, :]))
            logits = linear(params["cls_head"]["fc2"], h)
            return logits, vk, out.kept_counts
    else:
        @jax.jit
        def step(params, images, ids, mask, t):
            logits, (vk, tk) = blip_nlvr_forward(
                params, images, ids, mask, cfg,
                temperature=t, prune_active=prune_active,
                row_independent=row_independent,
            )
            return logits, vk, tk

    return step


def evaluate(params, loader_fn: Callable[[], Iterable], tokenize, cfg: BlipConfig,
             temperature: float, *, prune_active: bool, enc_token_id: int,
             capacities_v=None, capacities_t=None, print_fn=print,
             print_freq: int = 50, mesh=None) -> Tuple[dict, float]:
    """Returns (stats, Cur_Gflops) like the reference eval
    (compress_nlvr_dtp.py:72-107).  ``loader_fn()`` yields
    (image0, image1, sentences, targets) numpy batches; ``tokenize`` maps the
    sentence list to (ids, mask).

    ``mesh``: optional ``jax.sharding.Mesh`` — each batch is sharded over the
    'data' axis and params replicated (GSPMD data-parallel eval; the
    reference's DistributedSampler+DDP equivalent, SURVEY.md §2.5).  Ragged
    final batches are padded by repeating the last sample — exactly neutral
    for DTP's batch-max keep counts (see parallel/mesh.shard_batch_padded) —
    and the padded logits are dropped, so sharded eval metrics are identical
    to single-device."""
    step = make_eval_step(cfg, prune_active, capacities_v, capacities_t)
    dsh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from madtp_tpu.parallel.mesh import replicate

        params = replicate(mesh, params)
        dsh = NamedSharding(mesh, P("data"))

    logger = MetricLogger(print_fn=print_fn)
    t = jnp.float32(temperature)
    gflops_sum, n_batches = 0.0, 0

    def consume(pend):
        """Read back one dispatched batch (the only host<->device sync)."""
        nonlocal gflops_sum, n_batches
        logits, vk, tk, targets, B, text_w = pend
        preds = np.asarray(logits)[:B].argmax(-1)
        acc = float((preds == np.asarray(targets)).mean())
        logger.meters["acc"].update(acc, n=len(targets))
        if prune_active:
            g = nlvr_gflops(cfg.vit, cfg.med, np.asarray(vk), np.asarray(tk),
                            text_w)
        else:
            g = nlvr_gflops(
                cfg.vit, cfg.med, [cfg.vit.num_patches] * cfg.vit.depth,
                [text_w - 1] * cfg.med.num_hidden_layers, text_w)
        gflops_sum += g
        n_batches += 1

    # one-deep pipeline: dispatch batch i+1 (and run its host-side
    # tokenization) before reading batch i back — the device never idles
    # on the host loop and each readback round trip overlaps compute
    pending = None
    for image0, image1, sentences, targets in logger.log_every(
        loader_fn(), print_freq, "Evaluation:"
    ):
        ids, mask = tokenize(sentences)
        ids[:, 0] = enc_token_id  # reference models/blip_nlvr.py:69
        B = len(targets)
        if mesh is not None:
            pad = (-B) % mesh.shape["data"]
            if pad:
                image0, image1, ids, mask = (
                    np.concatenate([np.asarray(a),
                                    np.repeat(np.asarray(a)[-1:], pad, axis=0)])
                    for a in (image0, image1, ids, mask))
        images = np.concatenate([image0, image1], axis=0)
        images, ids_d, mask_d = (
            jnp.asarray(a) if dsh is None else jax.device_put(np.asarray(a), dsh)
            for a in (images, ids, mask))
        logits, vk, tk = step(params, images, ids_d, mask_d, t)
        if pending is not None:
            consume(pending)
        pending = (logits, vk, tk, targets, B, ids.shape[1])
    if pending is not None:
        consume(pending)
    # cross-process metric sync (reference
    # MetricLogger.synchronize_between_processes, utils.py:48-59,128-130):
    # each process evaluated its own loader shard; all-reduce the weighted
    # counts so every process reports the global accuracy, and average the
    # analytic GFLOPs over all shards' batches
    from madtp_tpu.parallel import dist as D

    if D.process_count() > 1:
        logger.synchronize_between_processes(
            lambda v: [float(x) for x in D.host_sum(
                np.asarray(v, np.float64))])
        g = D.host_sum(np.asarray([gflops_sum, n_batches], np.float64))
        gflops_sum, n_batches = float(g[0]), float(g[1])
    cur_gflops = gflops_sum / max(n_batches, 1)
    print_fn(f"Current Temperature: {temperature}")
    print_fn(f"Averaged GFLOPS: {cur_gflops}")
    stats = {k: f"{m.global_avg:.4f}" for k, m in logger.meters.items()}
    return stats, cur_gflops


def train_epoch(params, opt_state, train_step, loader_fn, tokenize,
                enc_token_id: int, temperature: float, *, print_fn=print,
                print_freq: int = 50, lr: float = 0.0, mesh=None,
                stop=None):
    """``stop``: preemption poll (utils/preempt), checked AFTER each step so
    every completed batch counts exactly once; the count comes back in
    ``stats['batches_done']`` (int) for exactly-once mid-epoch resume."""
    """``mesh``: GSPMD data-parallel training — params/optimizer replicated,
    batches sharded over 'data' (XLA inserts the gradient all-reduce; the
    reference's DDP, compress_nlvr_dtp.py:148).  Train batches must divide
    the 'data' axis (use drop_last + a per-device-multiple batch size, like
    the reference's per-GPU batch).

    Process-spanning mesh (multi-process training over the global mesh):
    each process feeds its own loader shard; the 2B image concat
    (reference compress_nlvr_dtp.py:43) must order ALL img0s before ALL
    img1s *globally* or the pair split inside the model mispairs, so the
    two halves are assembled into global arrays first and concatenated on
    device."""
    dsh = None
    spans = False
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from madtp_tpu.parallel.mesh import mesh_spans_processes, replicate

        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        dsh = NamedSharding(mesh, P("data"))
        spans = mesh_spans_processes(mesh)

    def put(a):
        a = np.asarray(a)
        return jnp.asarray(a) if dsh is None else jax.device_put(a, dsh)

    if spans:
        from madtp_tpu.parallel.mesh import shard_batch_padded

        concat_g = jax.jit(lambda a, b: jnp.concatenate([a, b], axis=0),
                           out_shardings=dsh)

    logger = MetricLogger(print_fn=print_fn)
    t = jnp.float32(temperature)
    pending = None
    batches_done = 0
    for image0, image1, sentences, targets in logger.log_every(
        loader_fn(), print_freq, "Train:"
    ):
        ids, mask = tokenize(sentences)
        ids[:, 0] = enc_token_id
        local_d = (len(mesh.local_mesh.devices.flat) if spans
                   else (mesh.shape["data"] if mesh is not None else 1))
        if len(targets) % local_d:
            raise ValueError(
                f"train batch {len(targets)} not divisible by local data "
                f"axis {local_d}; set batch_size_train to a multiple "
                f"(drop_last pads the epoch, reference DistributedSampler)")
        if spans:
            i0_d, i1_d, ids_d, mask_d, tgt_d, _ = shard_batch_padded(
                mesh, image0, image1, ids, mask, np.asarray(targets))
            images_d = concat_g(i0_d, i1_d)
        else:
            images_d = put(np.concatenate([image0, image1], axis=0))
            ids_d, mask_d, tgt_d = put(ids), put(mask), put(targets)
        params, opt_state, metrics = train_step(
            params, opt_state, images_d, ids_d, mask_d, tgt_d, t,
        )
        # one-deep metric lag: reading this step's metrics would sync the
        # host to the device every step; log the PREVIOUS step's instead
        if pending is not None:
            logger.update(temperature=float(temperature), lr=lr,
                          **{k: float(v) for k, v in pending.items()})
        pending = metrics
        batches_done += 1
        if stop is not None and stop():
            # preemption (utils/preempt): checked after the step so the
            # batch counts; every rank breaks on the same batch (the
            # guard's decision is cross-process synced)
            break
    if pending is not None:
        logger.update(temperature=float(temperature), lr=lr,
                      **{k: float(v) for k, v in pending.items()})
    stats = {k: f"{m.global_avg:.4f}" for k, m in logger.meters.items()}
    stats["batches_done"] = batches_done
    return params, opt_state, stats
