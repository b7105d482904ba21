"""BLIP image-text retrieval compression / evaluation driver
(reference ``compress_retrieval_dtp.py`` / ``compress_retrieval_flickr_dtp.py``
— the two differ only in config; here one driver takes either yaml).

    python -m madtp_tpu.cli.compress_retrieval --config configs/retrieval_coco.yaml \
        --evaluate --pretrained ...
    python -m madtp_tpu.cli.compress_retrieval --config configs/retrieval_flickr.yaml ...
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.cli.common import (
    base_parser, driver_mesh, dump_log, enable_compile_cache, load_config,
    make_tokenizer, set_seed, setup_runtime,
)
from madtp_tpu.core.config import MedConfig, ViTConfig
from madtp_tpu.eval.metrics import itm_eval
from madtp_tpu.models.blip import BlipConfig, load_blip_retrieval
from madtp_tpu.parallel import dist
from madtp_tpu.tasks.retrieval import encode_corpus, rerank_scores

ORI_GFLOPS = 153.2  # reference compress_retrieval_dtp.py:383


from madtp_tpu.cli.common import codegen_crash_autofallback


@codegen_crash_autofallback
def main():
    # default config mirrors the reference quirk: compress_retrieval_dtp.py
    # defaults to the FLICKR yaml with a COCO checkpoint (its scripts always
    # pass --config explicitly)
    args = base_parser("configs/retrieval_flickr.yaml",
                       "pretrained/model_base_retrieval_coco.pth"
                       ,
                       default_output="output/Retrieval_flickr").parse_args()
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
    k_test = config.get("k_test", 4 if args.synthetic else 256)

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
            "text_encoder": init_med_params(med, rng),
            "space_dict": rng.randn(10, 64).astype(np.float32),
            "vision_proj": {"kernel": rng.randn(64, 16).astype(np.float32) * 0.1,
                            "bias": np.zeros(16, np.float32)},
            "text_proj": {"kernel": rng.randn(64, 16).astype(np.float32) * 0.1,
                          "bias": np.zeros(16, np.float32)},
            "itm_head": {"kernel": rng.randn(64, 2).astype(np.float32) * 0.1,
                         "bias": np.zeros(2, np.float32)},
        })
        temperature = 1.0
        # corpus size is configurable so multi-process tests can exercise
        # uneven / EMPTY shards (reference_row_shard's n//world+1 stepping
        # yields empty and start>end ranges when world is large vs the
        # corpus); batches of 3 with a ragged final batch
        n_img = args.synthetic_corpus
        rng2 = np.random.RandomState(1)
        image_batches = [rng2.randn(min(3, n_img - i), 3, image_size,
                                    image_size).astype(np.float32)
                         for i in range(0, n_img, 3)]
        image_batches_fn = lambda: iter(list(image_batches))
        image_block_fn = lambda lo, hi: iter(list(image_batches)[lo:hi])
        texts = [f"a picture of w{i}" for i in range(n_img)]
        txt2img = {i: i for i in range(n_img)}
        img2txt = {i: [i] for i in range(n_img)}
    else:
        from madtp_tpu.cli.common import build_blip_cfg, init_blip_params

        cfg = build_blip_cfg(config, image_size)
        if config.get("pretrained"):
            params, temperature = load_blip_retrieval(config["pretrained"], cfg)
            params = jax.tree.map(jnp.asarray, params)
        else:
            print("WARNING: no --pretrained given; random init")
            params = init_blip_params(cfg, args.seed, heads=("retrieval",))
            temperature = 1.0

        from madtp_tpu.data.datasets import RetrievalEvalDataset
        from madtp_tpu.data.loader import batched_loader
        from madtp_tpu.cli.common import eval_image_transform

        ds = RetrievalEvalDataset(
            eval_image_transform(args, image_size),
            config["image_root"], config["ann_root"], "test",
            dataset=config.get("dataset", "coco"))
        texts = ds.text
        txt2img, img2txt = ds.txt2img, ds.img2txt
        def image_batches_fn():
            return (b[0] for b in batched_loader(
                ds, config.get("batch_size_test", 32)))

        def image_block_fn(lo, hi):
            # range-restricted loader: the skipped batches never decode
            # (an islice would decode everything before lo on every rank)
            return (b[0] for b in batched_loader(
                ds, config.get("batch_size_test", 32),
                batch_range=(lo, hi)))

        image_batches = image_batches_fn()

    tok = tokenizer(texts, padding="longest", max_length=35)
    text_ids, text_mask = tok["input_ids"], tok["attention_mask"]

    prune = temperature > 0
    caps_v = caps_t = None
    if args.fast_eval and prune:
        # multi-batch mask-mode probe (max + margin absorbs cross-batch
        # keep-count variance, tests/test_calibration_drift.py)
        import itertools

        import madtp_tpu.models.vit as V
        from madtp_tpu.models import med as MM

        vks = []
        for probe in itertools.islice(
                image_batches_fn() if callable(image_batches_fn)
                else iter(image_batches), 4):
            _, _, vk = V.vit_forward(
                params["visual_encoder"], jnp.asarray(probe), cfg=cfg.vit,
                space_dict=params["space_dict"],
                temperature=jnp.float32(temperature), prune_active=True)
            vks.append(np.asarray(vk))
        tks = []
        for i in range(0, min(len(text_ids), 32), 8):
            tout = MM.med_encoder(
                params["text_encoder"], jnp.asarray(text_ids[i:i + 8]),
                jnp.asarray(text_mask[i:i + 8]), cfg.med, mode="text",
                space_dict=params["space_dict"],
                temperature=jnp.float32(temperature), prune_active=True)
            tks.append(np.asarray(tout.kept_counts))
        from madtp_tpu.cli.common import fast_capacity_schedule

        caps_v, caps_t = fast_capacity_schedule(np.stack(vks), np.stack(tks),
                                                args.cap_mode)
        print("fast_eval capacities:", caps_v, caps_t)

    # single-process: encode the full corpus like the reference (the test
    # loader is unsharded, compress_retrieval_dtp.py:338-346).
    # multi-process: each process streams a contiguous BLOCK of batches
    # (exceeds the reference's redundant full-corpus-per-rank encode,
    # bit-exact — tasks/retrieval.encode_corpus_sharded); the rerank rows
    # shard by the reference arithmetic and the -100-initialized score
    # matrices merge (reference dist.all_reduce(SUM) :202-205)
    shard = ((dist.process_count(), dist.process_index())
             if dist.process_count() > 1 else None)
    n_image_batches = (
        len(image_batches) if args.synthetic  # the synthetic corpus above
        else -(-len(ds.image) // config.get("batch_size_test", 32)))

    def full_scores(params, temperature, prune, caps_v, caps_t,
                    image_batches):
        if shard is not None:
            from madtp_tpu.tasks.retrieval import encode_corpus_sharded

            img_feats, img_states, txt_feats = encode_corpus_sharded(
                params, cfg, image_block_fn, text_ids, text_mask,
                n_batches=n_image_batches,
                temperature=temperature, prune_active=prune,
                capacities_v=caps_v, capacities_t=caps_t, mesh=mesh,
            )
        else:
            img_feats, img_states, txt_feats = encode_corpus(
                params, cfg, image_batches, text_ids, text_mask,
                temperature=temperature, prune_active=prune,
                capacities_v=caps_v, capacities_t=caps_t, mesh=mesh,
            )
        s_i2t, s_t2i = rerank_scores(
            params, cfg, img_feats, img_states, txt_feats, enc_ids, text_mask,
            k_test=min(k_test, len(texts)), temperature=temperature,
            prune_active=prune, capacities_t=caps_t, mesh=mesh, shard=shard,
        )
        if shard is not None:
            # named checkpoint before the merge: merge_scores' allgather
            # already synchronizes, but a named barrier turns a rank that
            # died mid-rerank into a clear timeout HERE instead of a shape
            # mismatch inside the gather
            dist.barrier("retrieval_scores")
            s_i2t = dist.merge_scores(s_i2t)
            s_t2i = dist.merge_scores(s_t2i)
        return s_i2t, s_t2i

    # ITM rerank uses [ENC]-token text (reference compress_retrieval_dtp:168)
    enc_ids = text_ids.copy()
    enc_ids[:, 0] = tokenizer.enc_token_id
    s_i2t, s_t2i = full_scores(params, temperature, prune, caps_v, caps_t,
                               iter(image_batches))
    if os.environ.get("MADTP_DUMP_SCORES"):
        # per-rank filenames: post-merge matrices are identical on every
        # rank (the 2-process test PROVES it by comparing the dumps), and
        # distinct names keep concurrent writes to a SHARED output_dir
        # from corrupting each other
        name = ("scores.npz" if dist.process_count() <= 1
                else f"scores_r{dist.process_index()}.npz")
        np.savez(os.path.join(args.output_dir, name),
                 i2t=s_i2t, t2i=s_t2i)
    stats = itm_eval(s_i2t, s_t2i, txt2img, img2txt)
    log = {k: round(v, 3) for k, v in stats.items()}
    if dist.is_main_process():
        dump_log(args.output_dir, "evaluate.txt", log, append=False)
    print("LOG:", log)

    if args.evaluate or args.synthetic:
        return

    # ---- compression training ----
    # (reference compress_retrieval_dtp.py:389-470: controller-driven epochs;
    # best checkpoint gated on r_mean AND a <10-GFLOPs budget slack)
    import random as _random

    import jax.random as jrandom

    from madtp_tpu.ckpt.export import (
        export_med, export_vit, save_torch_checkpoint,
    )
    from madtp_tpu.data.datasets import CaptionTrainDataset
    from madtp_tpu.data.loader import batched_loader, num_batches
    from madtp_tpu.cli.common import train_image_transform
    from madtp_tpu.data.transforms import PerSampleRng
    from madtp_tpu.prune.flops import retrieval_gflops
    from madtp_tpu.train.controller import TemperatureController
    from madtp_tpu.train.loops import (
        MOMENTUM_KEYS, RetrievalTrainState, make_retrieval_train_step,
    )
    from madtp_tpu.train.momentum import init_queue
    from madtp_tpu.train.optim import cosine_lr, make_adamw_injectable
    from madtp_tpu.utils.logging import MetricLogger

    target = ORI_GFLOPS * (1.0 - config["p"])
    tx = make_adamw_injectable(config.get("weight_decay", 0.05))

    # training rides the GLOBAL mesh under multi-process execution: jit over
    # all processes' devices and XLA inserts the cross-process gradient psum
    # (the reference's DDP allreduce boundary); each process feeds its own
    # loader shard (DistributedSampler parity, data/loader.shard_indices)
    tmesh = mesh
    n_procs, proc_id = dist.process_count(), dist.process_index()
    if n_procs > 1:
        from madtp_tpu.parallel.mesh import global_data_mesh

        tmesh = global_data_mesh()
    train_step = make_retrieval_train_step(
        cfg, tx, alpha=config.get("alpha", 0.4),
        enc_token_id=tokenizer.enc_token_id,
        negative_all_rank=config.get("negative_all_rank", False),
        data_shards=tmesh.shape["data"] if tmesh is not None else 1,
        amp=args.amp)
    state = RetrievalTrainState(
        params=params,
        params_m={k: params[k] for k in MOMENTUM_KEYS},
        opt_state=tx.init(params),
        queue=init_queue(np.asarray(params["vision_proj"]["kernel"]).shape[1],
                         config.get("queue_size", 57600)),
        temp=jnp.float32(0.07),
    )
    controller = TemperatureController(target_gflops=target)

    from madtp_tpu.parallel.mesh import replicate as _replicate, \
        shard_batch_padded as _shard

    if tmesh is not None:
        state = _replicate(tmesh, state)

    def put_train(*arrays):
        local_d = (len(tmesh.local_mesh.devices.flat)
                   if tmesh is not None else 1)
        if arrays[0].shape[0] % local_d:
            raise ValueError(
                f"train batch {arrays[0].shape[0]} not divisible by local "
                f"data axis {local_d}; set --batch_size_train accordingly")
        return _shard(tmesh, *arrays)[:-1]

    _trng = PerSampleRng(args.seed)
    train_ds = CaptionTrainDataset(
        train_image_transform(args, image_size, _trng),
        config["image_root"], config["ann_root"],
        dataset=config.get("dataset", "coco"))

    from madtp_tpu.utils.cache import BoundedCache

    step_cache = BoundedCache()  # --fast_train: capacity schedule -> step
    probe_cache = [None]  # cached probe batches (cli/common.cached_probe_batches)

    def _make_ft_probe():
        import madtp_tpu.models.vit as V
        from madtp_tpu.models import med as M_

        @jax.jit
        def probe(params, images, ids, mask, t):
            """Mask-mode kept counts for all three pruned passes the gather
            step will run: vit tower, text tower, and the multimodal ITM
            encoder — ITM keep counts under image conditioning differ from
            text mode, so calibrating from text mode alone under-covers the
            ITM pass."""
            vstate, _, vkk = V.vit_forward(
                params["visual_encoder"], images, cfg=cfg.vit,
                space_dict=params["space_dict"], temperature=t,
                prune_active=True)
            out_txt = M_.med_encoder(
                params["text_encoder"], ids, mask, cfg.med, mode="text",
                space_dict=params["space_dict"], temperature=t,
                prune_active=True)
            enc_ids = ids.at[:, 0].set(tokenizer.enc_token_id)
            out_mm = M_.med_encoder(
                params["text_encoder"], enc_ids, mask, cfg.med,
                mode="multimodal", encoder_state=vstate,
                space_dict=params["space_dict"], temperature=t,
                prune_active=True)
            return vkk, jnp.maximum(out_txt.kept_counts, out_mm.kept_counts)

        return probe

    ft_probe = _make_ft_probe()  # jitted ONCE (probing is epoch-independent)

    def fast_train_step(state, temperature, epoch):
        """Calibrate tower capacities from cached mask-mode probe batches at
        this epoch's temperature; gather-mode retrieval train step (see
        compress_nlvr.fast_train_step).  Both online and momentum towers and
        the ITM pass run compacted.  The ITM pass batches 3B rows (pos + 2
        hard negatives), so its batch-max keep can exceed the B-row probe's;
        margin=8 plus the max over text/multimodal probes covers it, and any
        residual overflow folds into the merge token (the bounded-drift
        behavior measured in tests/test_calibration_drift.py)."""
        from madtp_tpu.cli.common import (
            cached_probe_batches, fast_capacity_schedule,
        )

        vks, tks = [], []
        probe_bs = config.get("batch_size_train", 16)
        for images, captions, _ in cached_probe_batches(
                probe_cache, lambda: batched_loader(
                    train_ds, probe_bs, shuffle=True, epoch=0,
                    # keep the partial batch when it's the only one
                    drop_last=len(train_ds) >= probe_bs)):
            tok = tokenizer(list(captions), padding="max_length",
                            max_length=35)
            vk, tk = ft_probe(
                state.params, jnp.asarray(images),
                jnp.asarray(tok["input_ids"]),
                jnp.asarray(tok["attention_mask"]), jnp.float32(temperature))
            vks.append(np.asarray(vk))
            tks.append(np.asarray(tk))
        cv, ct = fast_capacity_schedule(np.stack(vks), np.stack(tks),
                                        args.cap_mode, margin_t=8)
        key = (cv, ct)
        if key not in step_cache:
            step_cache[key] = make_retrieval_train_step(
                cfg, tx, alpha=config.get("alpha", 0.4),
                enc_token_id=tokenizer.enc_token_id,
                negative_all_rank=config.get("negative_all_rank", False),
                data_shards=tmesh.shape["data"] if tmesh is not None else 1,
                capacities_v=cv, capacities_t=ct, amp=args.amp)
        return step_cache[key], key

    from madtp_tpu.cli.common import load_resume, save_resume
    from madtp_tpu.utils.preempt import PreemptionGuard

    rng_key = jrandom.PRNGKey(args.seed)
    best, cur_g = 0.0, ORI_GFLOPS
    start_epoch = 0
    resume_skip = 0  # trained batches to skip on the resumed epoch
    if args.resume:
        # full train state: params + momentum towers + queues + optimizer
        # (+ the hard-negative sampling key)
        (state, rng_key), meta = load_resume(
            args.resume, (state, rng_key),
            {"epoch": 0, "temperature": 0.0, "cur_gflops": 0.0, "best": 0.0,
             "batches_done": 0})
        start_epoch = int(meta["epoch"]) + 1
        controller.temperature = float(meta["temperature"])
        cur_g, best = float(meta["cur_gflops"]), float(meta["best"])
        resume_skip = int(meta["batches_done"])
        if tmesh is not None:  # restored host leaves -> replicated arrays
            state = _replicate(tmesh, state)
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
        state.opt_state.hyperparams["learning_rate"] = np.float32(lr)
        step_fn = train_step
        if args.fast_train and temperature > 0:
            step_fn, sched = fast_train_step(state, temperature, epoch)
            print("fast_train capacities:", sched)
        logger = MetricLogger()
        pending_m = None  # one-deep metric lag (no per-step device sync)
        skip = resume_skip if epoch == start_epoch else 0
        done = skip
        # reference compress_retrieval_dtp.py:49-53: epoch 0 ramps the
        # soft-target mixing weight linearly over the epoch's batches;
        # alpha is a TRACED scalar (like temperature) so this never
        # recompiles.  `done` keeps the ramp position across mid-epoch
        # resume (the reference restarts the ramp; exactly-once semantics
        # here make continuing it the faithful reading).
        alpha_cfg = float(config.get("alpha", 0.4))
        epoch_len = num_batches(
            len(train_ds), config.get("batch_size_train", 16),
            num_shards=n_procs, drop_last=True)
        for images, captions, img_idx in logger.log_every(
            batched_loader(train_ds, config.get("batch_size_train", 16),
                           shuffle=True, epoch=epoch, drop_last=True,
                           num_shards=n_procs, shard_id=proc_id,
                           # exactly-once mid-epoch resume
                           batch_range=(skip, 1 << 31) if skip else None),
            50, f"Train [{epoch}]"):
            tok = tokenizer(list(captions), padding="max_length", max_length=35)
            rng_key, sub = jrandom.split(rng_key)
            batch_d = put_train(images, tok["input_ids"],
                                tok["attention_mask"], np.asarray(img_idx))
            alpha = (alpha_cfg if epoch > 0
                     else alpha_cfg * min(1.0, done / max(1, epoch_len)))
            state, metrics = step_fn(
                state, sub, *batch_d, jnp.float32(temperature),
                jnp.float32(alpha))
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
            # batch count (exactly-once resume)
            save_resume(args.output_dir, (state, rng_key),
                        {"epoch": epoch - 1, "temperature": float(pre_temp),
                         "cur_gflops": float(cur_g), "best": float(best),
                         "batches_done": done})
            print("LOG: preempted — resume checkpoint saved; restart with "
                  "--resume")
            return
        # eval epoch: re-embed + rerank with current weights (host copies —
        # the eval path runs per-process on the LOCAL mesh)
        params = (jax.tree.map(np.asarray, state.params)
                  if n_procs > 1 else state.params)
        s_i2t, s_t2i = full_scores(params, temperature, True, None, None,
                                   iter(image_batches_fn()))
        stats = itm_eval(s_i2t, s_t2i, txt2img, img2txt)
        # analytic GFLOPs from a mask-mode probe
        from madtp_tpu.models.blip import blip_retrieval_image_features
        probe_im = next(iter(image_batches_fn()))
        _, vs, _ = blip_retrieval_image_features(
            params, jnp.asarray(probe_im), cfg,
            temperature=jnp.float32(temperature), prune_active=True)
        v_alive = int(np.asarray(vs.alive[0]).sum()) - 1
        cur_g = retrieval_gflops(
            cfg.vit, cfg.med, [v_alive] * cfg.vit.depth,
            [text_ids.shape[1] - 1] * cfg.med.num_hidden_layers,
            text_ids.shape[1])
        log = {"epoch": epoch, "Cur_Gflops": round(cur_g, 2),
               **{k: round(v, 3) for k, v in stats.items()}}
        # track `best` on EVERY rank (merged metrics are identical); only
        # rank 0 writes the checkpoint
        improved = stats["r_mean"] > best and cur_g - target < 10.0
        if improved:
            best = stats["r_mean"]
        if improved and dist.is_main_process():
            sd = {}
            sd.update(export_vit(jax.tree.map(np.asarray,
                                              params["visual_encoder"]),
                                 patch_size=cfg.vit.patch_size))
            sd.update(export_med(jax.tree.map(np.asarray,
                                              params["text_encoder"]),
                                 "text_encoder."))
            for nm in ("vision_proj", "text_proj", "itm_head"):
                sd[nm + ".weight"] = np.asarray(params[nm]["kernel"]).T
                sd[nm + ".bias"] = np.asarray(params[nm]["bias"])
            sd["space_dict"] = np.asarray(params["space_dict"])
            save_torch_checkpoint(
                os.path.join(args.output_dir, "checkpoint_best.pth"), sd,
                epoch=epoch, temperature=temperature)
        if dist.is_main_process():
            dump_log(args.output_dir, "log.txt", log)
        print("LOG:", log)
        # mid-run resume checkpoint (full train state + controller)
        save_resume(args.output_dir, (state, rng_key),
                    {"epoch": epoch, "temperature": float(temperature),
                     "cur_gflops": float(cur_g), "best": float(best),
                     "batches_done": 0})


if __name__ == "__main__":
    main()
