"""COCO captioning compression / evaluation driver
(reference ``compress_caption_dtp.py``, 348 LoC).

    python -m madtp_tpu.cli.compress_caption --p 0.5 \
        --pretrained pretrained/model_base_caption_capfilt_large.pth
    python -m madtp_tpu.cli.compress_caption --evaluate --pretrained ...

Evaluation decodes with beam search (num_beams=3, max_length=20, min_length=5,
prompt "a picture of ") over the pruned image tokens and writes per-image
caption JSON (reference eval loop ``:61-105``).  Scoring against COCO ground
truth uses :mod:`madtp_tpu.eval.caption_metrics` (Bleu_1..4 / METEOR /
ROUGE_L / CIDEr / SPICE, all offline clean-room scorers; the checkpoint
gate below sums CIDEr + SPICE_offline, the reference's two-metric
CIDEr+SPICE gate with the scene-graph scorer of eval/spice.py standing in
for the Java pipeline, and is logged as such).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.cli.common import (
    base_parser, driver_mesh, dump_log, enable_compile_cache, load_config,
    make_tokenizer, set_seed,
)
from madtp_tpu.core.config import MedConfig, ViTConfig
from madtp_tpu.models.blip import (
    BlipConfig, blip_caption_encode_image, load_blip_caption,
)
from madtp_tpu.prune.flops import caption_gflops
from madtp_tpu.tasks.caption import beam_generate
from madtp_tpu.train.controller import (
    TemperatureController, presearch_temperature,
)
from madtp_tpu.train.loops import make_caption_train_step
from madtp_tpu.train.optim import cosine_lr, make_adamw_injectable
from madtp_tpu.utils.logging import MetricLogger

ORI_GFLOPS = 65.7  # reference compress_caption_dtp.py:216
PROMPT = "a picture of "


def generate_captions(params, cfg, tokenizer, images, temperature, *,
                      num_beams=3, max_length=20, min_length=5,
                      capacities=None, mesh=None, defer=False):
    """Pruned image encode + beam decode (reference models/blip.py:161-202).

    ``mesh``: GSPMD data-parallel decode — the batch is padded (repeating the
    last image, neutral for DTP batch-max coupling) and sharded over 'data';
    the padded captions are dropped, so results match single-device exactly.

    ``defer=True`` returns the DEVICE arrays (out, v_kept, B) without
    syncing — pair with :func:`finish_captions` to pipeline an eval loop."""
    from madtp_tpu.parallel.mesh import shard_batch_padded

    prune = temperature > 0
    B = images.shape[0]
    images, n = shard_batch_padded(mesh, images)
    vstate, _, v_kept = blip_caption_encode_image(
        params, images, cfg,
        temperature=jnp.float32(temperature), prune_active=prune,
        capacities=capacities,
    )
    prompt = tokenizer([PROMPT] * int(images.shape[0]), padding="longest")
    prompt_ids = prompt["input_ids"][:, :-1]  # drop [SEP] (reference :173)
    prompt_ids[:, 0] = tokenizer.bos_token_id
    prompt_ids, _ = shard_batch_padded(mesh, prompt_ids)
    out = beam_generate(
        params["text_decoder"], vstate, prompt_ids, cfg,
        num_beams=num_beams, max_length=max_length, min_length=min_length,
        eos_token_id=tokenizer.sep_token_id, pad_token_id=tokenizer.pad_token_id,
    )
    if defer:
        return out, v_kept, B
    caps = finish_captions(tokenizer, out, B)
    return caps, np.asarray(v_kept)


def finish_captions(tokenizer, out, B):
    """Host half of :func:`generate_captions` (the only device sync)."""
    caps = [tokenizer.decode(row)[len(PROMPT):].strip()
            if tokenizer.decode(row).startswith(PROMPT)
            else tokenizer.decode(row) for row in np.asarray(out)[:B]]
    return caps


from madtp_tpu.cli.common import codegen_crash_autofallback


@codegen_crash_autofallback
def main():
    args = base_parser("configs/caption_coco.yaml",
                       "pretrained/model_base_caption_capfilt_large.pth"
                       ,
                       default_output="output/Caption_coco").parse_args()
    from madtp_tpu.cli.common import setup_runtime

    setup_runtime(args)  # platform override + multi-process bring-up
    config = load_config(args)
    set_seed(args.seed)
    enable_compile_cache()
    os.makedirs(args.output_dir, exist_ok=True)
    from madtp_tpu.cli.common import dump_config

    dump_config(config, args.output_dir)

    image_size = config.get("image_size", 64 if args.synthetic else 384)
    tokenizer = make_tokenizer(args, config)
    mesh = driver_mesh(args)
    # multi-process: all splits shard across processes (reference
    # create_sampler, compress_caption_dtp.py:181); per-rank caption JSON
    # merges through save_result (data/utils.py:47-86 parity)
    from madtp_tpu.parallel import dist
    n_procs, proc_id = dist.process_count(), dist.process_index()

    def sync_gflops(cur_g):
        """Average the analytic GFLOPs over all processes' eval shards."""
        if n_procs > 1:
            cur_g = float(dist.host_sum(np.asarray([cur_g]))[0]) / n_procs
        return cur_g

    if args.synthetic:
        from madtp_tpu.models.med import init_med_params
        from madtp_tpu.models.vit import init_vit_params

        vit = ViTConfig(image_size=image_size, patch_size=16, embed_dim=64,
                        depth=2, num_heads=4, sd_dim=64)
        med = MedConfig(vocab_size=len(tokenizer.vocab), hidden_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=256, max_position_embeddings=64,
                        encoder_width=64, sd_dim=64)
        cfg = BlipConfig(vit=vit, med=med, sd_dim=64)
        rng = np.random.RandomState(0)
        params = jax.tree.map(jnp.asarray, {
            "visual_encoder": init_vit_params(vit, rng),
            "text_decoder": init_med_params(med, rng),
            "space_dict": rng.randn(10, 64).astype(np.float32),
        })
        temperature = 1.0
    else:
        from madtp_tpu.cli.common import build_blip_cfg, init_blip_params

        cfg = build_blip_cfg(config, image_size)
        if config.get("pretrained"):
            params, temperature = load_blip_caption(config["pretrained"], cfg)
            params = jax.tree.map(jnp.asarray, params)
            if not args.evaluate:
                temperature = 1.0
        else:
            print("WARNING: no --pretrained given; random init")
            params = init_blip_params(cfg, args.seed, heads=(),
                                      with_encoder=False, with_decoder=True)
            temperature = 1.0

    caps_v = None

    def calibrate_fast_eval(probe_batches):
        # multi-batch mask-mode probe (max over batches + margin absorbs
        # cross-batch keep-count variance, tests/test_calibration_drift.py)
        nonlocal caps_v
        import madtp_tpu.models.vit as V

        from madtp_tpu.cli.common import fast_capacity_schedule

        vks = []
        for probe in probe_batches:
            _, _, vk = V.vit_forward(
                params["visual_encoder"], jnp.asarray(probe), cfg=cfg.vit,
                space_dict=params["space_dict"],
                temperature=jnp.float32(temperature), prune_active=True)
            vks.append(np.asarray(vk))
        caps_v, _ = fast_capacity_schedule(np.stack(vks), None, args.cap_mode)
        print("fast_eval vision capacities:", caps_v)

    if args.fast_eval and temperature > 0 and args.synthetic:
        rngp = np.random.RandomState(9)
        calibrate_fast_eval([rngp.randn(4, 3, image_size, image_size)
                             .astype(np.float32) for _ in range(2)])

    def eval_epoch(temperature, loader):
        logger = MetricLogger()
        results = []
        g_sum, n = 0.0, 0

        def consume(pend):
            nonlocal g_sum, n
            out, v_kept, B, img_ids = pend
            for c, i in zip(finish_captions(tokenizer, out, B), img_ids):
                results.append({"image_id": int(i), "caption": c})
            g_sum += caption_gflops(cfg.vit, cfg.med, np.asarray(v_kept), 14)
            n += 1

        # one-deep pipeline: dispatch batch i+1's encode+decode before
        # reading batch i's captions back
        pending = None
        for images, img_ids in logger.log_every(loader(), 10, "Caption eval:"):
            out, v_kept, B = generate_captions(
                params, cfg, tokenizer, images, temperature,
                capacities=caps_v, mesh=mesh, defer=True)
            if pending is not None:
                consume(pending)
            pending = (out, v_kept, B, img_ids)
        if pending is not None:
            consume(pending)
        return results, g_sum / max(n, 1)

    if args.synthetic:
        rng = np.random.RandomState(1)

        def loader():
            for i in range(args.synthetic_batches):
                yield (rng.randn(2, 3, image_size, image_size)
                       .astype(np.float32), np.arange(2) + 2 * i)

        results, cur_g = eval_epoch(temperature, loader)
        # per-rank JSON + rank-0 merge, exactly like the real eval path
        # (reference data/utils.py:47-86) — gives the 2-process tests an
        # end-to-end surface for the merge
        from madtp_tpu.data.text_utils import save_result

        save_result(results, args.output_dir, "test_epoch_eval",
                    remove_duplicate="image_id", rank=proc_id,
                    world_size=n_procs, barrier=dist.barrier)
        cur_g = sync_gflops(cur_g)
        log = {"n_captions": len(results), "Cur_Gflops": round(cur_g, 4),
               "sample": results[0]["caption"] if results else ""}
        if dist.is_main_process():
            dump_log(args.output_dir, "evaluate.txt", log, append=False)
        print("LOG:", log)
        return

    from madtp_tpu.data.datasets import CaptionEvalDataset, CaptionTrainDataset
    from madtp_tpu.data.loader import batched_loader
    from madtp_tpu.cli.common import eval_image_transform

    def make_loader(split):
        ds = CaptionEvalDataset(
            eval_image_transform(args, image_size),
            config["image_root"], config["ann_root"], split)
        return lambda: batched_loader(ds, config.get("batch_size_test", 32),
                                      num_shards=n_procs, shard_id=proc_id)

    if args.evaluate:
        from madtp_tpu.data.text_utils import save_result

        if args.fast_eval and temperature > 0:
            import itertools

            calibrate_fast_eval(
                im for im, _ in itertools.islice(make_loader("test")(), 4))
        results, cur_g = eval_epoch(temperature, make_loader("test"))
        save_result(results, args.output_dir, "test_epoch_eval",
                    remove_duplicate="image_id", rank=proc_id,
                    world_size=n_procs, barrier=dist.barrier)
        cur_g = sync_gflops(cur_g)
        if dist.is_main_process():
            dump_log(args.output_dir, "evaluate.txt",
                     {"Cur_Gflops": round(cur_g, 2)}, append=False)
        return

    # ---- compression training ----
    # (reference compress_caption_dtp.py:218-311: temperature pre-search then
    # an epoch loop gated on caption quality + the GFLOPs budget; quality
    # gate here is CIDEr from the offline scorer)
    from madtp_tpu.ckpt.export import (
        export_med, export_vit, save_torch_checkpoint,
    )
    from madtp_tpu.train.controller import TemperatureController
    from madtp_tpu.train.loops import make_caption_train_step
    from madtp_tpu.train.optim import cosine_lr, make_adamw_injectable

    target = ORI_GFLOPS * (1.0 - config["p"])
    tx = make_adamw_injectable(config.get("weight_decay", 0.05))
    opt_state = tx.init(params)
    train_step = make_caption_train_step(cfg, tx, amp=args.amp)
    controller = TemperatureController(target_gflops=target)

    import random as _random

    from madtp_tpu.cli.common import train_image_transform
    from madtp_tpu.data.transforms import PerSampleRng

    _trng = PerSampleRng(args.seed)
    ds = CaptionTrainDataset(
        train_image_transform(args, image_size, _trng),
        config["image_root"], config["ann_root"],
        prompt=config.get("prompt", PROMPT))
    # reference models/blip.py:109: prompt_length = len(tok(prompt).ids) - 1
    prompt_length = len(tokenizer.encode(config.get("prompt", PROMPT))) - 1

    # temperature pre-search before epoch 0 (reference :106-158): probe the
    # image tower in mask mode and bisect against the analytic FLOPs model.
    # 3 shuffled probe batches, cached once (multi-batch probes absorb
    # cross-batch keep-count variance — the --fast_eval calibration policy)
    from madtp_tpu.cli.common import cached_probe_batches

    probe_cache = [None]
    probe_bs = min(8, config.get("batch_size", 32))
    # drop partial batches only when a full one exists — a tiny (fixture)
    # dataset would otherwise yield ZERO probe batches
    probe_imgs_list = [b[0] for b in cached_probe_batches(
        probe_cache, lambda: batched_loader(
            ds, probe_bs, shuffle=True,
            num_workers=0, drop_last=len(ds) >= probe_bs), n=3)]

    @jax.jit
    def probe(params, images, t):
        _, _, kept = blip_caption_encode_image(
            params, images, cfg, temperature=t, prune_active=True)
        return kept

    def measure(t):
        kept = np.asarray(probe(params, jnp.asarray(probe_imgs_list[0]),
                                jnp.float32(t)))
        return caption_gflops(cfg.vit, cfg.med, kept, 14)

    if not args.resume:  # resume restores the controller state instead
        controller.temperature = presearch_temperature(
            measure, target, t0=1.0, tol=1.0)
        print("pre-searched temperature:", controller.temperature)

    from madtp_tpu.parallel.mesh import replicate as _replicate

    # multi-process: train over the GLOBAL mesh (XLA inserts the gradient
    # psum — the reference's DDP allreduce); each process feeds its own
    # loader shard
    tmesh = mesh
    if n_procs > 1:
        from madtp_tpu.parallel.mesh import global_data_mesh

        tmesh = global_data_mesh()

    def put_batch(*arrays):
        from madtp_tpu.parallel.mesh import shard_batch_padded

        local_d = (len(tmesh.local_mesh.devices.flat)
                   if tmesh is not None else 1)
        if arrays[0].shape[0] % local_d:
            raise ValueError(
                f"train batch {arrays[0].shape[0]} not divisible by local "
                f"data axis {local_d}; set --batch_size_train accordingly")
        out = shard_batch_padded(tmesh, *arrays)
        return out[:-1]

    if tmesh is not None:
        params = _replicate(tmesh, params)
        opt_state = _replicate(tmesh, opt_state)

    from madtp_tpu.utils.cache import BoundedCache

    step_cache = BoundedCache()  # --fast_train: capacity schedule -> step

    def fast_train_step(temperature):
        """Calibrate ViT capacities from the cached mask-mode probe batches
        at this epoch's temperature (max over batches + margin — same policy
        as --fast_eval); gather-mode training step (see
        compress_nlvr.fast_train_step).  The decoder runs unpruned
        (reference behavior) so only the vision schedule applies."""
        from madtp_tpu.cli.common import fast_capacity_schedule

        vk = np.stack([np.asarray(probe(params, jnp.asarray(im),
                                        jnp.float32(temperature)))
                       for im in probe_imgs_list])
        cv, _ = fast_capacity_schedule(vk, None, args.cap_mode)
        if cv not in step_cache:
            step_cache[cv] = make_caption_train_step(cfg, tx,
                                                     capacities_v=cv,
                                                     amp=args.amp)
        return step_cache[cv], cv

    from madtp_tpu.cli.common import load_resume, save_resume
    from madtp_tpu.utils.preempt import PreemptionGuard

    best, cur_g = -1.0, ORI_GFLOPS
    start_epoch = 0
    resume_skip = 0  # trained batches to skip on the resumed epoch
    if args.resume:
        (params, opt_state), meta = load_resume(
            args.resume, (params, opt_state),
            {"epoch": 0, "temperature": 0.0, "cur_gflops": 0.0, "best": 0.0,
             "batches_done": 0})
        start_epoch = int(meta["epoch"]) + 1
        controller.temperature = float(meta["temperature"])
        cur_g, best = float(meta["cur_gflops"]), float(meta["best"])
        resume_skip = int(meta["batches_done"])
        if tmesh is not None:  # restored host leaves -> replicated arrays
            params = _replicate(tmesh, params)
            opt_state = _replicate(tmesh, opt_state)
        print(f"resumed from {args.resume} at epoch {start_epoch}")
    guard = PreemptionGuard()
    print("LOG: preemption guard armed", flush=True)
    for epoch in range(start_epoch, config["max_epoch"]):
        pre_temp = controller.temperature  # for interrupted-epoch resume
        if epoch > 0:
            controller.update(cur_g)
        temperature = controller.temperature
        lr = cosine_lr(epoch, config["max_epoch"],
                       config.get("init_lr", 1e-5), config.get("min_lr", 0.0))
        opt_state.hyperparams["learning_rate"] = np.float32(lr)
        step_fn = train_step
        if args.fast_train and temperature > 0:
            step_fn, sched = fast_train_step(temperature)
            print("fast_train capacities:", sched)
        logger = MetricLogger()
        pending_m = None  # one-deep metric lag (no per-step device sync)
        skip = resume_skip if epoch == start_epoch else 0
        done = skip
        for images, captions, img_ids in logger.log_every(
            batched_loader(ds, config.get("batch_size", 32), shuffle=True,
                           epoch=epoch, num_shards=n_procs,
                           shard_id=proc_id, drop_last=n_procs > 1,
                           # exactly-once mid-epoch resume: deterministic
                           # (seed, epoch) schedule, skip what's trained
                           batch_range=(skip, 1 << 31) if skip else None),
            50, f"Train [{epoch}]"):
            # multi-process: fixed-length padding — per-shard 'longest'
            # shapes would diverge across processes under the global mesh
            pad_mode = "max_length" if n_procs > 1 else "longest"
            tok = tokenizer(list(captions), padding=pad_mode, max_length=40)
            ids, mask = tok["input_ids"], tok["attention_mask"]
            ids[:, 0] = tokenizer.bos_token_id  # reference models/blip.py:118
            labels = np.where(ids == tokenizer.pad_token_id, -100, ids)
            labels[:, :prompt_length] = -100  # reference models/blip.py:121
            images_d, ids_d, mask_d, labels_d = put_batch(
                images, ids, mask, labels)
            params, opt_state, metrics = step_fn(
                params, opt_state, images_d, ids_d, mask_d, labels_d,
                jnp.float32(temperature))
            if pending_m is not None:
                logger.update(**{k: float(v) for k, v in pending_m.items()})
            pending_m = metrics
            done += 1
            if guard.should_stop():  # after the step: the batch counts
                break
        if pending_m is not None:
            logger.update(**{k: float(v) for k, v in pending_m.items()})
        if guard.sync_now():
            # preempted mid-epoch: PRE-epoch controller state + completed
            # batch count — --resume restarts THIS epoch, skips trained
            # batches (exactly-once), re-derives the temperature
            save_resume(args.output_dir, (params, opt_state),
                        {"epoch": epoch - 1, "temperature": float(pre_temp),
                         "cur_gflops": float(cur_g), "best": float(best),
                         "batches_done": done})
            print("LOG: preempted — resume checkpoint saved; restart with "
                  "--resume")
            return
        if n_procs > 1:
            # host copies: eval/decode runs per-process on the LOCAL mesh
            params = jax.tree.map(np.asarray, params)
        results, cur_g = eval_epoch(temperature, make_loader("val"))
        if n_procs > 1:
            # merge the per-process val shards so rank 0 scores the FULL
            # split (reference save_result + coco_caption_eval)
            from madtp_tpu.data.text_utils import save_result
            import json as _json

            merged_file = save_result(
                results, args.output_dir, f"val_epoch{epoch}",
                remove_duplicate="image_id", rank=proc_id,
                world_size=n_procs, barrier=dist.barrier)
            if dist.is_main_process():
                results = _json.load(open(merged_file))
        cur_g = sync_gflops(cur_g)
        log = {"epoch": epoch, "Cur_Gflops": round(cur_g, 2),
               "train_loss": f"{logger.meters['loss'].global_avg:.4f}"}
        # Best-checkpoint gate: CIDEr + SPICE_offline, the reference's
        # TWO-metric CIDEr+SPICE sum (compress_caption_dtp.py:303) with
        # the clean-room scene-graph scorer standing in for the Java
        # SPICE pipeline (eval/spice.py — same tuple-F1 formula, rule
        # parser + built-in synonyms instead of Stanford parser +
        # WordNet).  Deviation from the reference gate quantified in
        # tools/measure_gate_deviation.py: a second content metric can
        # only flip checkpoints tied on CIDEr (0 flips in 1454 pairs
        # with |dCIDEr| >= 0.05; 0.52% of gate pairs, all CIDEr-ties).
        gt_root = config.get("coco_gt_root", "")
        gt_path = os.path.join(gt_root, "gt.json")
        if not os.path.exists(gt_path):
            gt_path = os.path.join(gt_root, "caption_gt.json")  # fixture name
        if os.path.exists(gt_path) and dist.is_main_process():
            import json as _json

            from madtp_tpu.eval.caption_metrics import coco_caption_scores

            scores = coco_caption_scores(results, _json.load(open(gt_path)))
            log.update({k: round(v, 4) for k, v in scores.items()})
            metric = scores["CIDEr"] + scores["SPICE_offline"]
            log["ckpt_gate"] = "CIDEr+SPICE_offline (reference: CIDEr+SPICE)"
        else:
            metric = 0.0
        if (metric >= best and cur_g - target < 5.0
                and dist.is_main_process()):
            sd = {}
            sd.update(export_vit(jax.tree.map(np.asarray,
                                              params["visual_encoder"]),
                                 patch_size=cfg.vit.patch_size))
            sd.update(export_med(jax.tree.map(np.asarray,
                                              params["text_decoder"]),
                                 "text_decoder.", has_lm_head=True))
            sd["space_dict"] = np.asarray(params["space_dict"])
            save_torch_checkpoint(
                os.path.join(args.output_dir, "checkpoint_best.pth"), sd,
                epoch=epoch, temperature=temperature)
            best = metric
        if dist.is_main_process():
            dump_log(args.output_dir, "log.txt", log)
        print("LOG:", log)
        # mid-run resume checkpoint (params + optimizer + controller)
        save_resume(args.output_dir, (params, opt_state),
                    {"epoch": epoch, "temperature": float(temperature),
                     "cur_gflops": float(cur_g), "best": float(best),
                     "batches_done": 0})


if __name__ == "__main__":
    main()
