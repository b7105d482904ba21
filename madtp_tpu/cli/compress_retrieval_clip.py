"""CLIP retrieval compression / evaluation driver
(reference ``compress_retrieval_clip_dtp.py``): dual-tower ITC scoring only,
no ITM rerank (``:78-124``).

    python -m madtp_tpu.cli.compress_retrieval_clip \
        --config configs/retrieval_flickr_clip.yaml --evaluate --pretrained ...
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.cli.common import (
    base_parser, driver_mesh, dump_log, enable_compile_cache, load_config,
    set_seed,
)
from madtp_tpu.core.config import CLIPConfig
from madtp_tpu.eval.metrics import itm_eval
from madtp_tpu.models.clip import clip_encode_image, clip_encode_text
from madtp_tpu.prune.flops import clip_gflops

ORI_GFLOPS = 395.7  # reference compress_retrieval_clip_dtp.py:281


def infer_clip_config(sd, sd_dim=768) -> CLIPConfig:
    """Arch from checkpoint shapes (reference clip/model.py:678-701),
    including the ModifiedResNet branch (``:688-694``)."""
    if "visual.proj" not in sd:  # RN visual
        counts = tuple(len({k.split(".")[2] for k in sd
                            if k.startswith(f"visual.layer{b}.")})
                       for b in (1, 2, 3, 4))
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_w = round((sd["visual.attnpool.positional_embedding"].shape[0]
                       - 1) ** 0.5)
        return CLIPConfig(
            embed_dim=sd["text_projection"].shape[1],
            image_resolution=out_w * 32,
            vision_layers=sum(counts),
            vision_width=vision_width,
            vision_patch_size=32,  # unused for RN (grid = res // 32)
            resnet_layers=counts,
            context_length=sd["positional_embedding"].shape[0],
            vocab_size=sd["token_embedding.weight"].shape[0],
            transformer_width=sd["ln_final.weight"].shape[0],
            transformer_heads=sd["ln_final.weight"].shape[0] // 64,
            transformer_layers=len({k.split(".")[2] for k in sd
                                    if k.startswith("transformer.resblocks")}),
            sd_dim=sd_dim,
        )
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len([k for k in sd
                         if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")])
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=vision_patch_size * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len({k.split(".")[2] for k in sd
                                if k.startswith("transformer.resblocks")}),
        sd_dim=sd_dim,
    )


from madtp_tpu.cli.common import codegen_crash_autofallback


@codegen_crash_autofallback
def main():
    # the reference defaults to the (BLIP) retrieval_flickr.yaml here, which
    # its CLIP driver cannot actually load — we default to the CLIP yaml
    args = base_parser("configs/retrieval_flickr_clip.yaml",
                       "pretrained/clip_large_retrieval_flickr.pth"
                       ,
                       default_output="output/Retrieval_flickr").parse_args()
    from madtp_tpu.cli.common import setup_runtime

    setup_runtime(args)  # platform override + multi-process bring-up
    config = load_config(args)
    set_seed(args.seed)
    enable_compile_cache()
    os.makedirs(args.output_dir, exist_ok=True)
    from madtp_tpu.cli.common import dump_config

    dump_config(config, args.output_dir)
    # multi-process: TRAIN shards across processes like the reference
    # (create_sampler([train])+[None,None], compress_retrieval_clip_dtp.py:252);
    # the ITC eval's tower encode ALSO shards here (contiguous batch blocks
    # + allgather, bit-exact — see encode_towers), exceeding the reference's
    # full-corpus-on-every-rank eval
    from madtp_tpu.parallel import dist
    n_procs, proc_id = dist.process_count(), dist.process_index()

    if args.synthetic:
        from madtp_tpu.models.clip import init_clip_params

        cfg = CLIPConfig(
            embed_dim=16, image_resolution=64, vision_layers=2,
            vision_width=64, vision_patch_size=16, vision_heads_override=4,
            context_length=16, vocab_size=200, transformer_width=64,
            transformer_heads=4, transformer_layers=2, sd_dim=64,
        )
        rng = np.random.RandomState(0)
        params = jax.tree.map(jnp.asarray, init_clip_params(cfg, rng))
        space_dict = jnp.asarray(rng.randn(10, 64).astype(np.float32))
        temperature = 1.0
        n = 6
        images = rng.randn(n, 3, 64, 64).astype(np.float32)
        text = np.zeros((n, 16), np.int64)
        for i in range(n):
            text[i, 0] = 197  # sot
            text[i, 1 : 3 + i % 3] = rng.randint(5, 190, size=2 + i % 3)
            text[i, 3 + i % 3] = 199  # eot (highest id)
        txt2img = {i: i for i in range(n)}
        img2txt = {i: [i] for i in range(n)}
    else:
        from madtp_tpu.ckpt import load_state_dict, remap_clip
        from madtp_tpu.data.tokenizer_clip import ClipBPETokenizer, clip_tokenize

        sd, extras = load_state_dict(config["pretrained"])
        cfg = infer_clip_config(sd, config.get("sd_dim", 768))
        params = jax.tree.map(jnp.asarray, remap_clip(sd))
        space_dict = jnp.asarray(np.asarray(sd["space_dict"], np.float32)) \
            if "space_dict" in sd else None
        temperature = float(extras.get("temperature", 0.0))

        from madtp_tpu.data.datasets import RetrievalEvalDataset
        from madtp_tpu.data.loader import batched_loader
        from madtp_tpu.cli.common import eval_image_transform

        ds = RetrievalEvalDataset(
            eval_image_transform(args, cfg.image_resolution),
            config["image_root"], config["ann_root"], "test",
            dataset=config.get("dataset", "flickr"))
        tokzr = ClipBPETokenizer()
        text = clip_tokenize(tokzr, ds.text, cfg.context_length)
        txt2img, img2txt = ds.txt2img, ds.img2txt

    bt = int(config.get("batch_size_test", 32))
    if args.synthetic:
        n_images = len(images)

        def image_block_fn(lo, hi):
            return (images[b * bt : (b + 1) * bt] for b in range(lo, hi))
    else:
        n_images = len(ds)
        _corpus = []  # single-process: decoded once, reused across epochs

        def image_block_fn(lo, hi):
            # Multi-process: range-restricted loader — each rank decodes
            # ONLY its block, every epoch (caching P blocks per rank would
            # still be P-1/P redundant across the fleet if ranks re-shard).
            # Single-process: decode the corpus ONCE and slice (training
            # evals run every epoch; re-decoding ~1k images/epoch on the
            # host would dominate the epoch).
            from madtp_tpu.parallel import dist as _dist

            if _dist.process_count() > 1:
                return (b[0] for b in batched_loader(
                    ds, bt, batch_range=(lo, hi)))
            if not _corpus:
                _corpus.append(np.concatenate(
                    [b[0] for b in batched_loader(ds, bt)]))
            arr = _corpus[0]
            return (arr[b * bt : (b + 1) * bt] for b in range(lo, hi))

    prune = temperature > 0
    mesh = driver_mesh(args)
    from madtp_tpu.parallel.mesh import replicate as _replicate, \
        shard_batch_padded as _shard

    if mesh is not None:
        params = _replicate(mesh, params)
        if space_dict is not None:
            space_dict = _replicate(mesh, space_dict)

    caps_v = None
    if (args.fast_eval and prune and not cfg.is_resnet
            and (args.evaluate or args.synthetic)):
        # (evaluation runs only: during compression training the temperature
        # moves every epoch, so a startup-calibrated schedule would go stale
        # for the per-epoch evals)
        # calibrate a static vision-capacity schedule from mask-mode probe
        # batches, then run the gather fast path (the text tower stays
        # mask-mode: causal + 77 tokens, see models/clip.py:_tower_gather)
        from madtp_tpu.cli.common import fast_capacity_schedule

        probe = jax.jit(lambda p, im, s, t: clip_encode_image(
            p, im, cfg, space_dict=s, temperature=t, prune_active=True)[2])
        n_probe = min(n_images, 4 * 16)
        probe_imgs = np.concatenate(
            list(image_block_fn(0, -(-n_probe // bt))))[:n_probe]
        vks = []
        for i in range(0, n_probe, 16):
            im_d, _ = _shard(mesh, probe_imgs[i : i + 16])
            vks.append(np.asarray(probe(params, im_d, space_dict,
                                        jnp.float32(temperature))))
        caps_v, _ = fast_capacity_schedule(np.stack(vks), None, args.cap_mode)
        print("fast_eval vision capacities:", caps_v)

    from madtp_tpu.utils.cache import BoundedCache

    _tower_steps = BoundedCache()

    def tower_steps(prune_flag: bool):
        """Jitted (img_step, txt_step) for a prune mode.  The flag must
        follow the CURRENT temperature — the controller moves it every
        epoch, and a fresh compression run loads a DENSE checkpoint
        (temperature 0.0): freezing prune_active at startup made every
        per-epoch training eval run dense, so the controller never saw
        Cur_Gflops move and the saved checkpoint (pruned at its stored
        temperature) evaluated differently from the train-time log
        (caught by tests/test_driver_clip_train.py going flaky)."""
        if prune_flag not in _tower_steps:
            @jax.jit
            def img_step(params, images, sd, t):
                f, _, kept = clip_encode_image(
                    params, images, cfg, space_dict=sd, temperature=t,
                    prune_active=prune_flag, capacities=caps_v)
                return f / jnp.linalg.norm(f, axis=-1, keepdims=True), kept

            @jax.jit
            def txt_step(params, text, sd, t):
                f, _, kept = clip_encode_text(
                    params, text, cfg, space_dict=sd, temperature=t,
                    prune_active=prune_flag)
                return f / jnp.linalg.norm(f, axis=-1, keepdims=True), kept

            _tower_steps[prune_flag] = (img_step, txt_step)
        return _tower_steps[prune_flag]

    def encode_towers(params, space_dict, image_blocks, n_imgs, text_arr, t,
                      prune_flag):
        """Both towers over the corpus with a bounded dispatch-ahead
        pipeline (madtp_tpu.utils.pipeline): no per-batch host sync.
        Returns (img_feats, txt_feats, v_kept, t_kept).

        Multi-process: each process encodes a contiguous BLOCK of the
        batch schedule and features allgather back in corpus order —
        EXCEEDS the reference, whose CLIP eval runs the full corpus on
        every rank (samplers [None,None] for val/test,
        compress_retrieval_clip_dtp.py:252).  ``image_blocks(lo, hi)``
        yields just that slice of the batch schedule, so each rank also
        DECODES only its own block (batched_loader batch_range).  Batch membership is
        identical to single-process (same bt, same order), so DTP's
        batch-max coupling is unchanged and the result is bit-exact.
        Kept counts are taken from the GLOBAL last batch of each tower
        (the one single-process would report) so the Cur_Gflops every
        rank feeds its controller is identical — ranks diverging here
        would trace different programs and deadlock the global mesh."""
        from madtp_tpu.utils.pipeline import pipelined

        nb_i = -(-n_imgs // bt)
        nb_t = -(-len(text_arr) // bt)
        sharded = n_procs > 1 and nb_i >= n_procs and nb_t >= n_procs
        if sharded:
            ilo, ihi = proc_id * nb_i // n_procs, (proc_id + 1) * nb_i // n_procs
            tlo, thi = proc_id * nb_t // n_procs, (proc_id + 1) * nb_t // n_procs
        else:
            ilo, ihi, tlo, thi = 0, nb_i, 0, nb_t

        img_l, txt_l = [], []
        kept = {"v": None, "t": None}

        img_step, txt_step = tower_steps(prune_flag)

        def dispatches():
            for im in image_blocks(ilo, ihi):
                im_d, n = _shard(mesh, im)
                yield ("img", n, img_step(params, im_d, space_dict, t))
            for b in range(tlo, thi):
                tx_d, n = _shard(mesh, text_arr[b * bt : (b + 1) * bt])
                yield ("txt", n, txt_step(params, tx_d, space_dict, t))

        def consume(item):
            kind, n, out = item
            f, k = out
            (img_l if kind == "img" else txt_l).append(np.asarray(f)[:n])
            kept["v" if kind == "img" else "t"] = k

        pipelined(dispatches(), consume)
        img_f, txt_f = np.concatenate(img_l), np.concatenate(txt_l)
        kept_v, kept_t = kept["v"], kept["t"]
        if sharded:
            def gather_cat(a, nb, total):
                # per-rank feature counts are deterministic block arithmetic
                # (same ilo/ihi math as above) — no collective needed
                counts = [min(((p + 1) * nb // n_procs) * bt, total)
                          - (p * nb // n_procs) * bt for p in range(n_procs)]
                m = max(counts)
                pad = np.zeros((m - a.shape[0],) + a.shape[1:], a.dtype)
                g = dist.host_allgather(np.concatenate([a, pad]))
                return np.concatenate(
                    [g[p, : counts[p]] for p in range(n_procs)])

            img_f = gather_cat(img_f, nb_i, n_imgs)
            txt_f = gather_cat(txt_f, nb_t, len(text_arr))
            # global last batch lives on the last process (balanced blocks)
            kept_v = dist.host_allgather(np.asarray(kept_v))[-1]
            kept_t = dist.host_allgather(np.asarray(kept_t))[-1]
        return img_f, txt_f, kept_v, kept_t

    t = jnp.float32(temperature)
    img_feats, txt_feats, v_kept, t_kept = encode_towers(
        params, space_dict, image_block_fn, n_images, text, t, prune)

    sims = img_feats @ txt_feats.T
    if os.environ.get("MADTP_DUMP_SCORES"):  # test hook: post-allgather sims
        np.savez(os.path.join(args.output_dir, f"clip_sims_r{proc_id}.npz"),
                 sims=sims)
    stats = itm_eval(sims, sims.T, txt2img, img2txt)
    # kept counts from a dense (prune_active=False) encode are the full
    # per-layer token counts, so this is the dense GFLOPs there (verified)
    cur_g = clip_gflops(cfg, np.asarray(v_kept), np.asarray(t_kept))
    log = {**{k: round(v, 3) for k, v in stats.items()},
           "Cur_Gflops": round(cur_g, 3)}
    if dist.is_main_process():
        dump_log(args.output_dir, "evaluate.txt", log, append=False)
    print("LOG:", log)

    if args.evaluate or args.synthetic:
        return

    # ---- compression training ----
    # (reference compress_retrieval_clip_dtp.py:283-365: queue-InfoNCE epochs
    # under the controller; best gated on r_mean and a <5-GFLOPs slack)
    import random as _random

    from madtp_tpu.data.datasets import CaptionTrainDataset
    from madtp_tpu.data.loader import batched_loader, num_batches
    from madtp_tpu.cli.common import train_image_transform
    from madtp_tpu.data.transforms import PerSampleRng
    from madtp_tpu.train.controller import TemperatureController
    from madtp_tpu.train.loops import (
        CLIP_MOMENTUM_KEYS, ClipTrainState, make_clip_train_step,
    )
    from madtp_tpu.train.momentum import init_queue
    from madtp_tpu.train.optim import cosine_lr, make_adamw_injectable
    from madtp_tpu.utils.logging import MetricLogger

    target = ORI_GFLOPS * (1.0 - config["p"])
    tx = make_adamw_injectable(config.get("weight_decay", 0.2))
    train_step = make_clip_train_step(cfg, tx, alpha=config.get("alpha", 0.4),
                                      amp=args.amp)
    state = ClipTrainState(
        params=params,
        params_m={k: params[k] for k in CLIP_MOMENTUM_KEYS},
        opt_state=tx.init({"params": params, "space_dict": space_dict}),
        queue=init_queue(cfg.embed_dim, config.get("queue_size", 57600)),
        space_dict=space_dict,
    )
    controller = TemperatureController(target_gflops=target)
    # multi-process: train over the GLOBAL mesh (XLA inserts the gradient
    # psum — the reference's DDP allreduce)
    tmesh = mesh
    if n_procs > 1:
        from madtp_tpu.parallel.mesh import global_data_mesh

        tmesh = global_data_mesh()
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
        train_image_transform(args, cfg.image_resolution, _trng),
        config["image_root"], config["ann_root"],
        dataset=config.get("dataset", "flickr"))

    from madtp_tpu.utils.cache import BoundedCache

    step_cache = BoundedCache()  # --fast_train: vision capacity sched -> step
    probe_cache = [None]  # cached probe batches (cli/common.cached_probe_batches)

    @jax.jit
    def ft_probe(params, space_dict, images, t):
        return clip_encode_image(params, images, cfg, space_dict=space_dict,
                                 temperature=t, prune_active=True)[2]

    def fast_train_step(state, temperature, epoch):
        """Calibrate vision capacities from cached mask-mode probe batches at
        this epoch's temperature; gather-mode CLIP train step (the causal
        text tower stays mask-mode)."""
        from madtp_tpu.cli.common import (
            cached_probe_batches, fast_capacity_schedule,
        )

        vk = np.stack([
            np.asarray(ft_probe(state.params, state.space_dict,
                                jnp.asarray(images_p), jnp.float32(temperature)))
            for images_p, _, _ in cached_probe_batches(
                probe_cache, lambda: batched_loader(
                    train_ds, config.get("batch_size_train", 16),
                    shuffle=True, epoch=0,
                    # keep the partial batch when it's the only one
                    drop_last=(len(train_ds)
                               >= config.get("batch_size_train", 16))))])
        cv, _ = fast_capacity_schedule(vk, None, args.cap_mode)
        if cv not in step_cache:
            step_cache[cv] = make_clip_train_step(
                cfg, tx, alpha=config.get("alpha", 0.4), capacities_v=cv,
                amp=args.amp)
        return step_cache[cv], cv

    from madtp_tpu.cli.common import load_resume, save_resume
    from madtp_tpu.utils.preempt import PreemptionGuard

    best, cur_g = 0.0, ORI_GFLOPS
    start_epoch = 0
    resume_skip = 0  # trained batches to skip on the resumed epoch
    if args.resume:
        # full train state: params + momentum subset + queue + optimizer
        state, meta = load_resume(
            args.resume, state,
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
        if args.fast_train and temperature > 0 and not cfg.is_resnet:
            step_fn, sched = fast_train_step(state, temperature, epoch)
            print("fast_train capacities:", sched)
        logger = MetricLogger()
        pending_m = None  # one-deep metric lag (no per-step device sync)
        skip = resume_skip if epoch == start_epoch else 0
        done = skip
        # reference compress_retrieval_clip_dtp.py:45-49: epoch-0 linear
        # alpha warmup; traced scalar -> no recompile (see
        # compress_retrieval.py for the resume-position note)
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
            txt = clip_tokenize(tokzr, list(captions), cfg.context_length)
            batch_d = put_train(images, txt, np.asarray(img_idx))
            alpha = (alpha_cfg if epoch > 0
                     else alpha_cfg * min(1.0, done / max(1, epoch_len)))
            state, metrics = step_fn(
                state, *batch_d, jnp.float32(temperature),
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
            save_resume(args.output_dir, state,
                        {"epoch": epoch - 1, "temperature": float(pre_temp),
                         "cur_gflops": float(cur_g), "best": float(best),
                         "batches_done": done})
            print("LOG: preempted — resume checkpoint saved; restart with "
                  "--resume")
            return
        params, space_dict = state.params, state.space_dict
        if n_procs > 1:
            # host copies: eval runs per-process on the LOCAL mesh
            params = jax.tree.map(np.asarray, params)
            space_dict = (np.asarray(space_dict)
                          if space_dict is not None else None)
        # eval epoch (ITC-only like the reference CLIP driver); prune flag
        # follows the epoch's controller temperature, NOT the (dense)
        # pretrained checkpoint's
        ep_prune = temperature > 0
        img_feats, txt_feats, v_kept, t_kept = encode_towers(
            params, space_dict, image_block_fn, n_images, text,
            jnp.float32(temperature), ep_prune)
        sims = img_feats @ txt_feats.T
        stats = itm_eval(sims, sims.T, txt2img, img2txt)
        cur_g = clip_gflops(cfg, np.asarray(v_kept), np.asarray(t_kept))
        log = {"epoch": epoch, "Cur_Gflops": round(cur_g, 2),
               **{k: round(v, 3) for k, v in stats.items()}}
        # track `best` on EVERY rank (eval is replicated); rank 0 writes
        improved = stats["r_mean"] > best and cur_g - target < 5.0
        if improved:
            best = stats["r_mean"]
        if improved and dist.is_main_process():
            # reference-interchange .pth (compress_retrieval_clip_dtp.py:358
            # saves checkpoint_best.pth; the evaluate_* scripts load it)
            from madtp_tpu.ckpt.export import export_clip, save_torch_checkpoint

            sd_out = export_clip(jax.tree.map(np.asarray, params))
            if space_dict is not None:
                sd_out["space_dict"] = np.asarray(space_dict)
            save_torch_checkpoint(
                os.path.join(args.output_dir, "checkpoint_best.pth"), sd_out,
                epoch=epoch, temperature=float(temperature))
        if dist.is_main_process():
            dump_log(args.output_dir, "log.txt", log)
        print("LOG:", log)
        # mid-run resume checkpoint (full train state + controller)
        save_resume(args.output_dir, state,
                    {"epoch": epoch, "temperature": float(temperature),
                     "cur_gflops": float(cur_g), "best": float(best),
                     "batches_done": 0})


if __name__ == "__main__":
    main()
