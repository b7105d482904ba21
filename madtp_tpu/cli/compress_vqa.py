"""VQAv2 compression / evaluation driver (reference ``compress_vqa_dtp.py``).

    python -m madtp_tpu.cli.compress_vqa --p 0.5 \
        --pretrained pretrained/model_base_vqa_capfilt_large.pth
    python -m madtp_tpu.cli.compress_vqa --evaluate --pretrained ...

Eval ranks each question against the 3,128-answer list (k_test=128 two-stage
rerank, reference ``models/blip_vqa.py:156-203``) and writes the eval.ai
submission JSON (reference ``README.md:114``).
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
from madtp_tpu.models.blip import BlipConfig, blip_vqa_encode, load_blip_vqa
from madtp_tpu.prune.flops import vqa_gflops
from madtp_tpu.tasks.vqa import rank_answers
from madtp_tpu.utils.logging import MetricLogger

ORI_GFLOPS = 186.1  # reference compress_vqa_dtp.py:239


def tokenize_answers(tokenizer, answers, bos_id):
    out = tokenizer(list(answers), padding="longest")
    ids, mask = out["input_ids"], out["attention_mask"]
    ids[:, 0] = bos_id  # reference models/blip_vqa.py:73,86
    return ids, mask


from madtp_tpu.cli.common import codegen_crash_autofallback


@codegen_crash_autofallback
def main():
    args = base_parser("configs/vqa.yaml",
                       "pretrained/model_base_vqa_capfilt_large.pth"
                       ,
                       default_output="output/VQA").parse_args()
    from madtp_tpu.cli.common import setup_runtime

    setup_runtime(args)  # platform override + multi-process bring-up
    config = load_config(args)
    set_seed(args.seed)
    enable_compile_cache()
    os.makedirs(args.output_dir, exist_ok=True)
    from madtp_tpu.cli.common import dump_config

    dump_config(config, args.output_dir)

    image_size = config.get("image_size", 64 if args.synthetic else 480)
    tokenizer = make_tokenizer(args, config)
    mesh = driver_mesh(args)
    k_test = config.get("k_test", 8 if args.synthetic else 128)
    # multi-process: train + test shard across processes (reference
    # create_sampler over [train, test], compress_vqa_dtp.py:193); per-rank
    # answer JSON merges through save_result
    from madtp_tpu.parallel import dist
    n_procs, proc_id = dist.process_count(), dist.process_index()

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
            "text_decoder": init_med_params(med, rng),
            "space_dict": rng.randn(10, 64).astype(np.float32),
        })
        temperature = 1.0
        answer_list = [f"w{i}" for i in range(16)]
    else:
        from madtp_tpu.cli.common import build_blip_cfg, init_blip_params

        cfg = build_blip_cfg(config, image_size)
        if config.get("pretrained"):
            params, temperature = load_blip_vqa(config["pretrained"], cfg)
            params = jax.tree.map(jnp.asarray, params)
        else:
            print("WARNING: no --pretrained given; random init")
            params = init_blip_params(cfg, args.seed, heads=(),
                                      with_decoder=True)
            temperature = 1.0
        import json

        answer_list = json.load(
            open(os.path.join(config["ann_root"], "answer_list.json")))

    a_ids, a_mask = tokenize_answers(tokenizer, answer_list,
                                     tokenizer.bos_token_id)
    a_ids, a_mask = jnp.asarray(a_ids), jnp.asarray(a_mask)

    inference = config.get("inference", "rank")
    caps_v = caps_t = None

    @jax.jit
    def eval_step(params, images, q_ids, q_mask, t):
        out, _, vkept = blip_vqa_encode(
            params, images, q_ids, q_mask, cfg,
            temperature=t, prune_active=True,
            capacities_v=caps_v, capacities_t=caps_t,
        )
        best, _ = rank_answers(
            params["text_decoder"], out.state, a_ids, a_mask, cfg,
            k=min(k_test, len(answer_list)),
            pad_token_id=tokenizer.pad_token_id,
        )
        return best, vkept, out.kept_counts

    @jax.jit
    def gen_step(params, images, q_ids, q_mask, t):
        """inference='generate' (reference models/blip_vqa.py:127-147):
        beam=3 answer decoding over the question states."""
        from madtp_tpu.tasks.caption import beam_generate

        out, _, vkept = blip_vqa_encode(
            params, images, q_ids, q_mask, cfg,
            temperature=t, prune_active=True,
        )
        B = q_ids.shape[0]
        bos = jnp.full((B, 1), tokenizer.bos_token_id, q_ids.dtype)
        seqs = beam_generate(
            params["text_decoder"], out.state, bos, cfg,
            num_beams=3, max_length=10, min_length=1,
            eos_token_id=tokenizer.sep_token_id,
            pad_token_id=tokenizer.pad_token_id,
        )
        return seqs, vkept, out.kept_counts

    @jax.jit
    def kept_probe(params, images, q_ids, q_mask, t):
        # one jitted mask-mode forward supplies BOTH towers' kept counts
        out, _, vkept = blip_vqa_encode(
            params, images, q_ids, q_mask, cfg, temperature=t,
            prune_active=True)
        return vkept, out.kept_counts

    def calibrate_fast_eval(loader):
        # multi-batch mask-mode probe (max + margin absorbs cross-batch
        # keep-count variance, tests/test_calibration_drift.py)
        nonlocal caps_v, caps_t
        import itertools

        vks, tks = [], []
        for images, questions, _ in itertools.islice(loader(), 4):
            # fixed-length padding: "longest" would give every probe batch
            # its own shape and retrace/compile the jitted probe each time
            q = tokenizer(list(questions), padding="max_length",
                          max_length=35)
            qi = q["input_ids"]; qi[:, 0] = tokenizer.enc_token_id
            vk, tk = kept_probe(
                params, jnp.asarray(images), jnp.asarray(qi),
                jnp.asarray(q["attention_mask"]), jnp.float32(temperature))
            vks.append(np.asarray(vk))
            tks.append(np.asarray(tk))
        from madtp_tpu.cli.common import fast_capacity_schedule

        caps_v, caps_t = fast_capacity_schedule(np.stack(vks), np.stack(tks),
                                                args.cap_mode)
        print("fast_eval capacities:", caps_v, caps_t)

    def run_eval(loader):
        # GSPMD data-parallel eval: batch padded (repeat last sample — neutral
        # for DTP batch-max coupling) and sharded over 'data'; padded rows
        # dropped, so sharded metrics == single-device (tests/test_spmd.py).
        from madtp_tpu.parallel.mesh import shard_batch_padded

        logger = MetricLogger()
        results = []
        g_sum, n = 0.0, 0

        def consume(pend):
            nonlocal g_sum, n
            out, vkept, tkept, nb, qids, text_w = pend
            if inference == "generate":
                for row, qid in zip(np.asarray(out)[:nb], qids):
                    results.append({"question_id": int(qid),
                                    "answer": tokenizer.decode(row)})
            else:
                for b, qid in zip(np.asarray(out)[:nb], qids):
                    results.append({"question_id": int(qid),
                                    "answer": answer_list[int(b)]})
            # REAL vision kept counts (a dense-vision placeholder here fed
            # the controller a cur_g that could never reach its target)
            g_sum += vqa_gflops(
                cfg.vit, cfg.med, np.asarray(vkept),
                np.asarray(tkept), text_w, n_answers=k_test)
            n += 1

        # one-deep pipeline: dispatch batch i+1 before reading batch i
        pending = None
        for images, questions, qids in logger.log_every(loader(), 10, "VQA:"):
            q = tokenizer(list(questions), padding="longest")
            q_ids_np = q["input_ids"]
            q_ids_np[:, 0] = tokenizer.enc_token_id
            images_d, q_ids_d, q_mask_d, nb = shard_batch_padded(
                mesh, images, q_ids_np, q["attention_mask"])
            step = gen_step if inference == "generate" else eval_step
            out, vkept, tkept = step(params, images_d, q_ids_d, q_mask_d,
                                     jnp.float32(temperature))
            if pending is not None:
                consume(pending)
            pending = (out, vkept, tkept, nb, qids, q_ids_np.shape[1])
        if pending is not None:
            consume(pending)
        return results, g_sum / max(n, 1)

    def sync_gflops(cur_g):
        """Average the analytic GFLOPs over all processes' eval shards."""
        if n_procs > 1:
            cur_g = float(dist.host_sum(np.asarray([cur_g]))[0]) / n_procs
        return cur_g

    if args.synthetic:
        rng = np.random.RandomState(1)

        def loader():
            for i in range(args.synthetic_batches):
                yield (rng.randn(2, 3, image_size, image_size).astype(np.float32),
                       ["where is the object"] * 2, np.arange(2) + 2 * i)

        if args.fast_eval:
            calibrate_fast_eval(loader)
        results, cur_g = run_eval(loader)
        # per-rank JSON + rank-0 merge like the real eval path (reference
        # data/utils.py:47-86) — the 2-process tests' merge surface
        from madtp_tpu.data.text_utils import save_result

        save_result(results, args.output_dir, "vqa_result",
                    remove_duplicate="question_id", rank=proc_id,
                    world_size=n_procs, barrier=dist.barrier)
        cur_g = sync_gflops(cur_g)
        log = {"n_answers": len(results), "Cur_Gflops": round(cur_g, 4),
               "sample": results[0]["answer"]}
        if dist.is_main_process():
            dump_log(args.output_dir, "evaluate.txt", log, append=False)
        print("LOG:", log)
        return

    from madtp_tpu.data.datasets import VQADataset
    from madtp_tpu.data.loader import batched_loader
    from madtp_tpu.cli.common import eval_image_transform
    from madtp_tpu.data.text_utils import save_result

    ds = VQADataset(eval_image_transform(args, image_size),
                    config["ann_root"], config["vqa_root"],
                    config.get("vg_root", ""), split="test")

    def test_loader():
        return batched_loader(ds, config.get("batch_size_test", 16),
                              num_shards=n_procs, shard_id=proc_id)

    if args.evaluate:
        if args.fast_eval:
            calibrate_fast_eval(test_loader)
        results, cur_g = run_eval(test_loader)
        # dedup on question_id like the reference (data/utils.py:76-82):
        # shard_indices pads ragged shards by repeating indices, and those
        # duplicates must not reach the scoring server
        save_result(results, args.output_dir, "vqa_result",
                    remove_duplicate="question_id", rank=proc_id,
                    world_size=n_procs, barrier=dist.barrier)
        cur_g = sync_gflops(cur_g)
        if dist.is_main_process():
            dump_log(args.output_dir, "evaluate.txt",
                     {"Cur_Gflops": round(cur_g, 2)}, append=False)
        return

    # ---- compression training ----
    # (reference compress_vqa_dtp.py:246-292: controller-driven epochs, a
    # checkpoint saved EVERY epoch)
    import random as _random

    from madtp_tpu.ckpt.export import (
        export_med, export_vit, save_torch_checkpoint,
    )
    from madtp_tpu.data.datasets import VQADataset, vqa_collate
    from madtp_tpu.cli.common import train_image_transform
    from madtp_tpu.data.transforms import PerSampleRng
    from madtp_tpu.train.controller import TemperatureController
    from madtp_tpu.train.loops import make_vqa_train_step
    from madtp_tpu.train.optim import cosine_lr, make_adamw_injectable

    target = ORI_GFLOPS * (1.0 - config["p"])
    tx = make_adamw_injectable(config.get("weight_decay", 0.05))
    opt_state = tx.init(params)
    MAX_A = 10  # VQAv2 has 10 annotators; soft-weight lists fit in 10
    train_step = make_vqa_train_step(cfg, tx, max_answers_per_q=MAX_A,
                                     amp=args.amp)
    controller = TemperatureController(target_gflops=target)

    _trng = PerSampleRng(args.seed)
    train_ds = VQADataset(
        train_image_transform(args, image_size, _trng),
        config["ann_root"], config["vqa_root"], config.get("vg_root", ""),
        split="train", train_files=tuple(config.get(
            "train_files", ("vqa_train", "vqa_val", "vg_qa"))))

    # multi-process: train over the GLOBAL mesh (XLA inserts the gradient
    # psum — the reference's DDP allreduce); each process feeds its own
    # loader shard
    tmesh = mesh
    if n_procs > 1:
        from madtp_tpu.parallel.mesh import global_data_mesh

        tmesh = global_data_mesh()

    if tmesh is not None:
        from madtp_tpu.parallel.mesh import replicate as _replicate

        params = _replicate(tmesh, params)
        opt_state = _replicate(tmesh, opt_state)

    def put_train(*arrays):
        from madtp_tpu.parallel.mesh import shard_batch_padded

        local_d = (len(tmesh.local_mesh.devices.flat)
                   if tmesh is not None else 1)
        if arrays[0].shape[0] % local_d:
            raise ValueError(
                f"train batch {arrays[0].shape[0]} not divisible by local "
                f"data axis {local_d}; set --batch_size_train accordingly")
        return shard_batch_padded(tmesh, *arrays)[:-1]

    from madtp_tpu.utils.cache import BoundedCache

    step_cache = BoundedCache()  # --fast_train: capacity schedule -> step
    probe_cache = [None]  # cached probe batches (cli/common.cached_probe_batches)

    def fast_train_step(temperature, epoch):
        """Calibrate ceil/nearest capacities from cached mask-mode train
        batches at this epoch's temperature; gather-mode training step (see
        compress_nlvr.fast_train_step)."""
        from madtp_tpu.cli.common import (
            cached_probe_batches, fast_capacity_schedule,
        )

        vks, tks = [], []
        for images, questions, *_ in cached_probe_batches(
                probe_cache, lambda: batched_loader(
                    train_ds, config.get("batch_size_train", 16),
                    shuffle=True, epoch=0, collate=vqa_collate)):
            # fixed-length padding: one compiled probe shape across epochs
            q = tokenizer(list(questions), padding="max_length", max_length=35)
            qi = q["input_ids"]; qi[:, 0] = tokenizer.enc_token_id
            vk, tk = kept_probe(
                params, jnp.asarray(images), jnp.asarray(qi),
                jnp.asarray(q["attention_mask"]), jnp.float32(temperature))
            vks.append(np.asarray(vk))
            tks.append(np.asarray(tk))
        cv, ct = fast_capacity_schedule(np.stack(vks), np.stack(tks),
                                        args.cap_mode)
        key = (cv, ct)
        if key not in step_cache:
            step_cache[key] = make_vqa_train_step(
                cfg, tx, max_answers_per_q=MAX_A,
                capacities_v=cv, capacities_t=ct, amp=args.amp)
        return step_cache[key], key

    from madtp_tpu.cli.common import load_resume, save_resume
    from madtp_tpu.utils.preempt import PreemptionGuard

    cur_g = ORI_GFLOPS
    start_epoch = 0
    resume_skip = 0  # trained batches to skip on the resumed epoch
    if args.resume:
        (params, opt_state), meta = load_resume(
            args.resume, (params, opt_state),
            {"epoch": 0, "temperature": 0.0, "cur_gflops": 0.0,
             "batches_done": 0})
        start_epoch = int(meta["epoch"]) + 1
        controller.temperature = float(meta["temperature"])
        cur_g = float(meta["cur_gflops"])
        resume_skip = int(meta["batches_done"])
        if tmesh is not None:  # restored host leaves -> replicated arrays
            from madtp_tpu.parallel.mesh import replicate as _replicate

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
                       config.get("init_lr", 2e-5), config.get("min_lr", 0.0))
        opt_state.hyperparams["learning_rate"] = np.float32(lr)
        step_fn = train_step
        if args.fast_train and temperature > 0:
            step_fn, sched = fast_train_step(temperature, epoch)
            print("fast_train capacities:", sched)
        logger = MetricLogger()
        pending_m = None  # one-deep metric lag (no per-step device sync)
        # multi-process: fixed-length padding — per-shard 'longest' shapes
        # would diverge across processes under the global mesh.  The
        # max_length caps (35 questions / 24 answers) apply ONLY there;
        # single-process keeps the reference's untruncated 'longest'.
        # questions truncate at 35 like the reference
        # (models/blip_vqa.py tokenizes with truncation max_length=35);
        # answers are untruncated in the reference, so the 24-cap applies
        # only where fixed shapes are mandatory
        pad_q = (dict(padding="max_length", max_length=35) if n_procs > 1
                 else dict(padding="longest", max_length=35))
        pad_a = (dict(padding="max_length", max_length=24) if n_procs > 1
                 else dict(padding="longest"))
        skip = resume_skip if epoch == start_epoch else 0
        done = skip
        for images, questions, answers, weights, n in logger.log_every(
            batched_loader(train_ds, config.get("batch_size_train", 16),
                           shuffle=True, epoch=epoch, collate=vqa_collate,
                           num_shards=n_procs, shard_id=proc_id,
                           drop_last=n_procs > 1,
                           # exactly-once mid-epoch resume
                           batch_range=(skip, 1 << 31) if skip else None),
            50, f"Train [{epoch}]"):
            B = images.shape[0]
            q = tokenizer(list(questions), **pad_q)
            q_ids = q["input_ids"]; q_ids[:, 0] = tokenizer.enc_token_id
            # pad the ragged flattened answers to [B, MAX_A, La]
            a = tokenizer(list(answers), **pad_a)
            La = a["input_ids"].shape[1]
            ans_ids = np.zeros((B, MAX_A, La), np.int32)
            ans_msk = np.zeros((B, MAX_A, La), np.int32)
            w = np.zeros((B, MAX_A), np.float32)
            pos = 0
            for b, cnt in enumerate(n):
                cnt = min(cnt, MAX_A)
                ans_ids[b, :cnt] = a["input_ids"][pos : pos + cnt]
                ans_ids[b, :cnt, 0] = tokenizer.bos_token_id
                ans_msk[b, :cnt] = a["attention_mask"][pos : pos + cnt]
                w[b, :cnt] = weights[pos : pos + cnt]
                pos += cnt
            batch_d = put_train(images, q_ids, q["attention_mask"],
                                ans_ids, ans_msk, w)
            params, opt_state, metrics = step_fn(
                params, opt_state, *batch_d, jnp.float32(temperature))
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
            save_resume(args.output_dir, (params, opt_state),
                        {"epoch": epoch - 1, "temperature": float(pre_temp),
                         "cur_gflops": float(cur_g), "batches_done": done})
            print("LOG: preempted — resume checkpoint saved; restart with "
                  "--resume")
            return
        if n_procs > 1:
            # host copies: eval runs per-process on the LOCAL mesh
            params = jax.tree.map(np.asarray, params)
        results, cur_g = run_eval(test_loader)
        save_result(results, args.output_dir, f"vqa_result_epoch{epoch}",
                    remove_duplicate="question_id", rank=proc_id,
                    world_size=n_procs, barrier=dist.barrier)
        cur_g = sync_gflops(cur_g)
        if dist.is_main_process():
            sd = {}
            sd.update(export_vit(
                jax.tree.map(np.asarray, params["visual_encoder"]),
                patch_size=cfg.vit.patch_size))
            sd.update(export_med(
                jax.tree.map(np.asarray, params["text_encoder"]),
                "text_encoder."))
            sd.update(export_med(
                jax.tree.map(np.asarray, params["text_decoder"]),
                "text_decoder.", has_lm_head=True))
            sd["space_dict"] = np.asarray(params["space_dict"])
            save_torch_checkpoint(
                os.path.join(args.output_dir, f"checkpoint_{epoch:02d}.pth"),
                sd, epoch=epoch, temperature=temperature)
            dump_log(args.output_dir, "log.txt",
                     {"epoch": epoch, "Cur_Gflops": round(cur_g, 2),
                      "train_loss":
                          f"{logger.meters['loss'].global_avg:.4f}"})
        # mid-run resume checkpoint (params + optimizer + controller)
        save_resume(args.output_dir, (params, opt_state),
                    {"epoch": epoch, "temperature": float(temperature),
                     "cur_gflops": float(cur_g), "batches_done": 0})


if __name__ == "__main__":
    main()
