"""NLVR2 compression / evaluation driver.

CLI parity with the reference (``compress_nlvr_dtp.py``):

    python -m madtp_tpu.cli.compress_nlvr --p 0.5 \
        --pretrained pretrained/model_base_nlvr.pth --config configs/nlvr.yaml
    python -m madtp_tpu.cli.compress_nlvr --evaluate \
        --pretrained output/NLVR/checkpoint_best.pth

``--synthetic`` runs the identical pipeline on random weights/data (no
checkpoints or datasets needed) — the operational smoke test this repo uses
in place of the reference's "single-GPU fallback" mode.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.cli.common import (
    base_parser, driver_mesh, dump_log, enable_compile_cache, load_config,
    make_tokenizer, set_seed,
)
from madtp_tpu.models.blip import load_blip_nlvr
from madtp_tpu.tasks import nlvr as task
from madtp_tpu.train.controller import TemperatureController
from madtp_tpu.train.loops import make_nlvr_train_step
from madtp_tpu.train.optim import cosine_lr, make_adamw_injectable

ORI_GFLOPS = 132.54  # reference compress_nlvr_dtp.py:162


def build_cfg(config, image_size):
    from madtp_tpu.cli.common import build_blip_cfg

    return build_blip_cfg(config, image_size, twin_cross=True)


def synthetic_loader(n_batches, batch, image_size, seed=0, batch_skip=0):
    rng = np.random.RandomState(seed)
    data = []
    for _ in range(n_batches):
        img0 = rng.randn(batch, 3, image_size, image_size).astype(np.float32)
        img1 = rng.randn(batch, 3, image_size, image_size).astype(np.float32)
        sents = ["the object is on the left" for _ in range(batch)]
        targets = rng.randint(0, 2, size=(batch,))
        data.append((img0, img1, sents, targets))
    return lambda: iter(data[batch_skip:])


def real_loader(config, split, tokenizer, *, train, batch, epoch=0,
                num_shards=1, shard_id=0, batch_skip=0, uint8=False):
    from madtp_tpu.cli.common import eval_image_transform, train_image_transform
    from madtp_tpu.data.transforms import PerSampleRng
    from madtp_tpu.data.datasets import NLVRDataset
    from madtp_tpu.data.loader import batched_loader
    import random as _random

    # uint8: --uint8_feed — 4x less host->device traffic; vit_forward
    # normalizes on device (ops/layers.normalize_images)
    size = config["image_size"]
    if train:
        tf = train_image_transform(None, size, PerSampleRng(42),
                                   uint8=uint8)
    else:
        tf = eval_image_transform(None, size, uint8=uint8)
    ds = NLVRDataset(tf, config["image_root"], config["ann_root"], split)

    def it():
        # batch_skip: exactly-once mid-epoch resume — the schedule is
        # deterministic in (seed, epoch), so skipping the first k batches
        # resumes the epoch with every batch trained exactly once
        for batch_data in batched_loader(ds, batch, shuffle=train, epoch=epoch,
                                         drop_last=train,
                                         num_shards=num_shards,
                                         shard_id=shard_id,
                                         batch_range=((batch_skip, 1 << 31)
                                                      if batch_skip else None)):
            yield batch_data

    return it


from madtp_tpu.cli.common import codegen_crash_autofallback


@codegen_crash_autofallback
def main():
    args = base_parser("configs/nlvr.yaml",
                       "pretrained/model_base_nlvr.pth",
                       default_epoch=15,
                       default_output="output/NLVR").parse_args()
    from madtp_tpu.cli.common import setup_runtime

    setup_runtime(args)  # platform override + multi-process bring-up
    config = load_config(args)
    set_seed(args.seed)
    enable_compile_cache()
    os.makedirs(args.output_dir, exist_ok=True)
    from madtp_tpu.cli.common import dump_config

    dump_config(config, args.output_dir)

    image_size = config.get("image_size", 64 if args.synthetic else 384)
    if args.synthetic:
        config.setdefault("image_size", image_size)
    cfg = build_cfg(config, image_size)
    tokenizer = make_tokenizer(args, config)

    from madtp_tpu.parallel import dist

    def tokenize(sentences):
        # eval + calibration: 'longest' like the reference — eval runs
        # per-process on the LOCAL mesh, so cross-process shape divergence
        # is fine and nothing gets truncated
        out = tokenizer(sentences, padding="longest")
        return out["input_ids"], out["attention_mask"]

    def tokenize_train(sentences):
        # TRAIN under the global multi-process mesh: fixed-length padding —
        # per-shard 'longest' shapes would diverge across processes and the
        # collectives mismatch.  Single-process keeps the reference's
        # 'longest' (no truncation).
        if dist.process_count() > 1:
            out = tokenizer(sentences, padding="max_length", max_length=40)
            return out["input_ids"], out["attention_mask"]
        return tokenize(sentences)

    # ---- model ----
    temperature = 1.0
    if args.synthetic:
        from __graft_entry__ import _nlvr_setup

        if image_size <= 128:
            cfg_small, params, *_ = _nlvr_setup(
                image_size=image_size, B=2, text_len=12,
                vit_kw=dict(patch_size=16, embed_dim=64, depth=2, num_heads=4,
                            sd_dim=64),
                med_kw=dict(vocab_size=len(tokenizer.vocab), hidden_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=256, max_position_embeddings=64),
            )
            cfg = cfg_small._replace(sd_dim=64)
        else:
            _, params, *_ = _nlvr_setup(image_size=image_size)
        if args.evaluate and args.pretrained and os.path.exists(args.pretrained):
            params, temperature = load_blip_nlvr(args.pretrained, cfg)
            params = jax.tree.map(jnp.asarray, params)
    elif config.get("pretrained"):
        params, ckpt_temp = load_blip_nlvr(config["pretrained"], cfg)
        params = jax.tree.map(jnp.asarray, params)
        if args.evaluate:
            temperature = ckpt_temp
    else:
        # random init (fixture/testing; the reference always starts from a
        # pretrained checkpoint)
        from madtp_tpu.models.med import init_med_params
        from madtp_tpu.models.vit import init_vit_params

        print("WARNING: no --pretrained given; random init")
        rng0 = np.random.RandomState(args.seed)
        H = cfg.med.hidden_size
        params = jax.tree.map(jnp.asarray, {
            "visual_encoder": init_vit_params(cfg.vit, rng0),
            "text_encoder": init_med_params(cfg.med, rng0),
            "space_dict": rng0.randn(cfg.sd_num, cfg.sd_dim).astype(np.float32),
            "cls_head": {
                "fc1": {"kernel": (rng0.randn(H, H) * 0.02).astype(np.float32),
                        "bias": np.zeros((H,), np.float32)},
                "fc2": {"kernel": (rng0.randn(H, 2) * 0.02).astype(np.float32),
                        "bias": np.zeros((2,), np.float32)},
            },
        })

    mesh = driver_mesh(args)
    target_gflops = ORI_GFLOPS * (1.0 - config["p"])
    batch_train = config.get("batch_size_train", 4 if args.synthetic else 16)
    batch_test = config.get("batch_size_test", 4 if args.synthetic else 32)
    if mesh is not None:
        d = mesh.shape["data"]
        batch_train += (-batch_train) % d  # train batches must divide 'data'
        if args.synthetic:  # synthetic loader feeds training too
            batch_test += (-batch_test) % d

    # multi-process: every split shards across processes (the reference's
    # create_sampler over [train,val,test], compress_nlvr_dtp.py:131); eval
    # metrics all-reduce in tasks/nlvr.evaluate
    n_procs, proc_id = dist.process_count(), dist.process_index()

    def get_loader(split, train=False, epoch=0, sharded=True, batch_skip=0):
        # ``sharded=False``: identical batches on every process — required
        # for --fast_train calibration probes, whose derived capacity
        # schedule must match across processes (divergent schedules would
        # trace different global-mesh programs and deadlock the collectives)
        if args.synthetic:
            return synthetic_loader(args.synthetic_batches, batch_test,
                                    image_size, batch_skip=batch_skip)
        ns, si = (n_procs, proc_id) if sharded else (1, 0)
        return real_loader(config, split, tokenizer, train=train,
                           batch=batch_train if train else batch_test,
                           epoch=epoch, num_shards=ns, shard_id=si,
                           batch_skip=batch_skip, uint8=args.uint8_feed)

    caps_v = caps_t = None
    if args.evaluate and args.fast_eval and temperature > 0:
        # calibrate static gather capacities from several mask-mode batches
        # (one-batch schedules risk under-covering unlucky batches; the max
        # over a probe set plus margin absorbs cross-batch variance —
        # measured in tests/test_calibration_drift.py)
        import itertools

        step = task.make_eval_step(cfg, True)
        vks, tks = [], []
        for image0, image1, sentences, _ in itertools.islice(
                get_loader("val")(), 4):
            ids0, mask0 = tokenize(sentences)
            ids0[:, 0] = tokenizer.enc_token_id
            _, vk, tk = step(params,
                             jnp.asarray(np.concatenate([image0, image1])),
                             jnp.asarray(ids0), jnp.asarray(mask0),
                             jnp.float32(temperature))
            vks.append(np.asarray(vk))
            tks.append(np.asarray(tk))
        from madtp_tpu.cli.common import fast_capacity_schedule

        caps_v, caps_t = fast_capacity_schedule(np.stack(vks), np.stack(tks),
                                                args.cap_mode)
        print("fast_eval capacities:", caps_v, caps_t)

    if args.evaluate:
        val_stats, cur_g = task.evaluate(
            params, get_loader("val"), tokenize, cfg, temperature,
            prune_active=temperature > 0, enc_token_id=tokenizer.enc_token_id,
            capacities_v=caps_v, capacities_t=caps_t, mesh=mesh,
        )
        test_stats, _ = task.evaluate(
            params, get_loader("test"), tokenize, cfg, temperature,
            prune_active=temperature > 0, enc_token_id=tokenizer.enc_token_id,
            capacities_v=caps_v, capacities_t=caps_t, mesh=mesh,
        )
        log = {**{f"val_{k}": v for k, v in val_stats.items()},
               **{f"test_{k}": v for k, v in test_stats.items()},
               "Cur_Gflops": round(cur_g, 2)}
        dump_log(args.output_dir, "evaluate.txt", log, append=False)
        print("LOG:", log)
        return

    # ---- compression training ----
    # multi-process: the train step jits over the GLOBAL mesh (XLA inserts
    # the cross-process gradient psum — the reference's DDP allreduce);
    # eval keeps the per-process local mesh + host metric sync
    tmesh = mesh
    if n_procs > 1:
        from madtp_tpu.parallel.mesh import global_data_mesh

        tmesh = global_data_mesh()
    tx = make_adamw_injectable(config.get("weight_decay", 0.05))
    opt_state = tx.init(params)
    train_step = make_nlvr_train_step(cfg, tx, amp=args.amp)
    from madtp_tpu.utils.cache import BoundedCache

    step_cache = BoundedCache()  # capacity schedule -> compiled train step
    ft_probe = [None]  # lazily-built mask-mode probe, jitted ONCE
    probe_cache = [None]  # cached probe batches (cli/common.cached_probe_batches)

    def fast_train_step(params, temperature, epoch):
        """--fast_train: calibrate ceil (lossless + margin) capacities from
        cached mask-mode probe batches at this epoch's temperature and return
        a gather-mode train step.  Distinct schedules compile once (bounded by
        the 64/8-multiple bucketing); repeats hit ``step_cache``."""
        from madtp_tpu.cli.common import (
            cached_probe_batches, fast_capacity_schedule,
        )

        if ft_probe[0] is None:  # don't re-trace the full forward per epoch
            ft_probe[0] = task.make_eval_step(cfg, True)
        probe = ft_probe[0]
        vks, tks = [], []
        for image0, image1, sentences, _ in cached_probe_batches(
                probe_cache, get_loader("train", True, 0, sharded=False)):
            ids0, mask0 = tokenize(sentences)
            ids0[:, 0] = tokenizer.enc_token_id
            _, vk, tk = probe(params,
                              jnp.asarray(np.concatenate([image0, image1])),
                              jnp.asarray(ids0), jnp.asarray(mask0),
                              jnp.float32(temperature))
            vks.append(np.asarray(vk))
            tks.append(np.asarray(tk))
        caps_v, caps_t = fast_capacity_schedule(
            np.stack(vks), np.stack(tks), args.cap_mode)
        key = (caps_v, caps_t)
        if key not in step_cache:
            step_cache[key] = make_nlvr_train_step(
                cfg, tx, capacities_v=caps_v, capacities_t=caps_t,
                amp=args.amp)
        return step_cache[key], key

    controller = TemperatureController(target_gflops=target_gflops)
    if args.synthetic:
        controller.target_gflops = 1e-3  # tiny model: exercise the ladder

    best, best_epoch = 0.0, 0
    cur_g = ORI_GFLOPS
    start_epoch = 0
    resume_skip = 0  # trained batches to skip on the resumed epoch
    if args.resume:
        # shared resume format (cli/common.save_resume): flat leaf list
        # against the freshly-initialized template (npz multi-process /
        # orbax single-process)
        from madtp_tpu.cli.common import load_resume

        (params, opt_state), meta = load_resume(
            args.resume, (params, opt_state),
            {"epoch": 0, "temperature": 0.0, "cur_gflops": 0.0, "best": 0.0,
             "batches_done": 0})
        start_epoch = int(meta["epoch"]) + 1
        controller.temperature = float(meta["temperature"])
        cur_g, best = float(meta["cur_gflops"]), float(meta["best"])
        resume_skip = int(meta["batches_done"])
        print(f"resumed from {args.resume} at epoch {start_epoch}"
              + (f" (skipping {resume_skip} trained batches)"
                 if resume_skip else ""))

    from madtp_tpu.cli.common import save_resume
    from madtp_tpu.utils.preempt import PreemptionGuard

    guard = PreemptionGuard()
    # marker consumed by tests (and useful in pod logs): from here on a
    # SIGTERM is handled gracefully instead of taking the default action
    print("LOG: preemption guard armed", flush=True)
    for epoch in range(start_epoch, config["max_epoch"]):
        pre_temp = controller.temperature  # for interrupted-epoch resume
        if epoch > 0:
            controller.update(cur_g)
        temperature = controller.temperature
        print("Temperature:", temperature)

        lr = cosine_lr(epoch, config["max_epoch"],
                       config.get("init_lr", 3e-6), config.get("min_lr", 0.0))
        opt_state.hyperparams["learning_rate"] = np.float32(lr)
        step_fn = train_step
        if args.fast_train and temperature > 0:
            step_fn, sched = fast_train_step(params, temperature, epoch)
            print("fast_train capacities:", sched)
        skip = resume_skip if epoch == start_epoch else 0
        params, opt_state, train_stats = task.train_epoch(
            params, opt_state, step_fn,
            get_loader("train", True, epoch, batch_skip=skip),
            tokenize_train, tokenizer.enc_token_id, temperature, lr=lr,
            mesh=tmesh, stop=guard.should_stop,
        )
        done = skip + int(train_stats.pop("batches_done", 0))
        if guard.sync_now():
            # preempted mid-epoch: save with PRE-epoch controller state +
            # the completed-batch count — --resume restarts THIS epoch,
            # skips the already-trained batches (exactly-once), and the
            # deterministic controller re-derives the temperature
            save_resume(args.output_dir, (params, opt_state),
                        {"epoch": epoch - 1, "temperature": float(pre_temp),
                         "cur_gflops": float(cur_g), "best": float(best),
                         "batches_done": done})
            print("LOG: preempted — resume checkpoint saved; restart with "
                  "--resume")
            return
        if n_procs > 1:
            # host copies: eval runs per-process on the LOCAL mesh and the
            # global-mesh arrays can't be re-placed locally directly
            params = jax.tree.map(np.asarray, params)
        val_stats, cur_g = task.evaluate(
            params, get_loader("val"), tokenize, cfg, temperature,
            prune_active=True, enc_token_id=tokenizer.enc_token_id, mesh=mesh,
        )
        test_stats, _ = task.evaluate(
            params, get_loader("test"), tokenize, cfg, temperature,
            prune_active=True, enc_token_id=tokenizer.enc_token_id, mesh=mesh,
        )
        log = {**{f"train_{k}": v for k, v in train_stats.items()},
               **{f"val_{k}": v for k, v in val_stats.items()},
               **{f"test_{k}": v for k, v in test_stats.items()},
               "epoch": epoch, "Cur_Gflops": round(cur_g, 2)}
        acc = float(test_stats["acc"])
        # track `best` on EVERY rank (metrics are synced, so the decision
        # is identical); only rank 0 writes the checkpoint
        improved = acc > best and cur_g - controller.target_gflops < 5.0
        if improved:
            best, best_epoch = acc, epoch
        if improved and dist.is_main_process():
            from madtp_tpu.ckpt.export import (
                export_med, export_vit, save_torch_checkpoint,
            )

            sd = {}
            sd.update(export_vit(jax.tree.map(np.asarray,
                                              params["visual_encoder"]),
                                 patch_size=cfg.vit.patch_size))
            sd.update(export_med(jax.tree.map(np.asarray,
                                              params["text_encoder"]),
                                 "text_encoder.", twin_cross=True))
            sd["space_dict"] = np.asarray(params["space_dict"])
            sd["cls_head.0.weight"] = np.asarray(params["cls_head"]["fc1"]["kernel"]).T
            sd["cls_head.0.bias"] = np.asarray(params["cls_head"]["fc1"]["bias"])
            sd["cls_head.2.weight"] = np.asarray(params["cls_head"]["fc2"]["kernel"]).T
            sd["cls_head.2.bias"] = np.asarray(params["cls_head"]["fc2"]["bias"])
            save_torch_checkpoint(
                os.path.join(args.output_dir, "checkpoint_best.pth"), sd,
                epoch=epoch, temperature=temperature,
            )
        if dist.is_main_process():
            dump_log(args.output_dir, "log.txt", log)
        print("LOG:", log)

        # mid-run resume checkpoint (params + optimizer + controller)
        save_resume(args.output_dir, (params, opt_state),
                    {"epoch": epoch, "temperature": float(temperature),
                     "cur_gflops": float(cur_g), "best": float(best),
                     "batches_done": 0})
    print(f"LOG: best epoch: {best_epoch}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    main()
