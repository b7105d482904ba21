"""Shared CLI plumbing for the compress_* drivers (reference driver boilerplate:
argparse + yaml merge + seeding, e.g. ``compress_nlvr_dtp.py:252-271``)."""

from __future__ import annotations

import argparse
import json
import os
import random
from typing import Optional

import numpy as np


def base_parser(default_config: str, default_pretrained: str = "",
                default_epoch: int = 5,
                default_output: str = "output/run") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=default_config)
    p.add_argument("--output_dir", default=default_output)
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--pretrained", default=default_pretrained, type=str)
    # reference per-driver defaults: 15 for NLVR, 5 elsewhere
    # (compress_*_dtp.py argparse); --epoch always overrides max_epoch
    p.add_argument("--epoch", default=default_epoch, type=int)
    p.add_argument("--p", default=0.5, type=float,
                   help="total compression ratio")
    p.add_argument("--bert_vocab", default="", type=str,
                   help="path to bert-base-uncased vocab.txt")
    p.add_argument("--fast_eval", action="store_true",
                   help="use calibrated gather capacities for eval speed")
    p.add_argument("--cap_mode", default="ceil", choices=["ceil", "nearest"],
                   help="--fast_eval capacity rounding: 'ceil' (lossless) or "
                        "'nearest' to the 128-lane kernel granularity "
                        "(faster; bounded decision drift, see "
                        "tests/test_calibration_drift.py)")
    p.add_argument("--fast_train", action="store_true",
                   help="gather-mode TRAINING: recalibrate static capacities "
                        "each epoch (mask-mode probe batch) and run the "
                        "compression train step physically compacted — the "
                        "TPU analogue of the reference's shrinking training "
                        "sequences; one recompile per distinct schedule")
    p.add_argument("--synthetic", action="store_true",
                   help="random weights + synthetic data (pipeline smoke run; "
                        "no checkpoints/datasets required)")
    p.add_argument("--synthetic_batches", default=4, type=int)
    p.add_argument("--synthetic_corpus", default=6, type=int,
                   help="synthetic retrieval corpus size (images/texts); "
                        "small values vs --num_processes exercise the "
                        "uneven/empty eval-shard paths")
    p.add_argument("--resume", default="", type=str,
                   help="resume compression from an orbax checkpoint dir "
                        "(params + optimizer state + controller state; "
                        "capability the reference lacks, SURVEY.md §5)")
    p.add_argument("--dp", default="auto", choices=["auto", "off"],
                   help="data-parallel over all visible devices (the "
                        "reference's default 8-way DDP, "
                        "compress_nlvr_dtp.py:148); 'off' forces single-device")
    p.add_argument("--batch_size_train", default=0, type=int,
                   help="override config batch_size_train (0 = config default)")
    p.add_argument("--batch_size_test", default=0, type=int,
                   help="override config batch_size_test (0 = config default)")
    p.add_argument("--num_processes", default=0, type=int,
                   help="multi-process (multi-host) bring-up: total process "
                        "count (torchrun --nproc_per_node parity; 0/1 = "
                        "single process).  Env fallback MADTP_NUM_PROCESSES")
    p.add_argument("--process_id", default=-1, type=int,
                   help="this process's rank (env fallback MADTP_PROCESS_ID)")
    p.add_argument("--coordinator", default="",
                   help="coordinator host:port for jax.distributed "
                        "(env fallback MADTP_COORDINATOR, default "
                        "127.0.0.1:29500)")
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu"],
                   help="force a JAX platform (the env var JAX_PLATFORMS is "
                        "read before driver code under sitecustomize; this "
                        "flag applies jax.config.update early instead)")
    p.add_argument("--amp", action="store_true",
                   help="mixed-precision training (reference "
                        "compress_*_dtp.py '--amp': fp16 autocast + "
                        "GradScaler).  TPU-native equivalent: bf16 compute "
                        "against fp32 master params/optimizer state; no loss "
                        "scaler needed (bf16 keeps fp32's exponent range). "
                        "Training-only, like the reference (scaler is built "
                        "'if not args.evaluate and args.amp')")
    p.add_argument("--uint8_feed", action="store_true",
                   help="ship images (eval AND train) host->device as uint8 "
                        "HWC (4x less transfer + no host normalize); the "
                        "model normalizes on device "
                        "(ops/layers.normalize_images, matches the host "
                        "transform to ~1e-5)")
    return p


def eval_image_transform(args, image_size: int, *, uint8=None):
    """The eval-side image transform: fp32 host-normalized CHW (reference
    torchvision parity) or, under ``--uint8_feed``, bicubic-resized uint8
    HWC that the model normalizes on device (vit_forward /
    clip_encode_image accept uint8 natively).  ``uint8`` overrides the
    args flag for callers that carry a plain bool (NLVR's real_loader)."""
    from madtp_tpu.data.transforms import eval_resize_uint8, eval_transform

    if uint8 is None:
        uint8 = getattr(args, "uint8_feed", False)
    if uint8:
        return lambda im: eval_resize_uint8(im, image_size)
    return lambda im: eval_transform(im, image_size)


def train_image_transform(args, image_size: int, rng, *, uint8=None):
    """Train-side image transform (crop/flip/RandAugment), fp32 CHW or —
    under ``--uint8_feed`` — augmented uint8 HWC normalized on device.
    Both consume the same rng stream (same crops/flips/augments)."""
    from madtp_tpu.data.transforms import (
        train_transform, train_transform_uint8,
    )

    if uint8 is None:
        uint8 = getattr(args, "uint8_feed", False)
    if uint8:
        return lambda im: train_transform_uint8(im, image_size, rng)
    return lambda im: train_transform(im, image_size, rng)


def setup_runtime(args) -> None:
    """Platform override + multi-process bring-up.  MUST run before the
    first device query (driver_mesh / any jit)."""
    if getattr(args, "platform", ""):
        import jax

        jax.config.update("jax_platforms", args.platform)
    from madtp_tpu.parallel.dist import init_from_args

    init_from_args(args)


def dump_config(config: dict, output_dir: str) -> None:
    """Reference parity: every driver dumps the merged run config to
    ``<output_dir>/config.yaml`` (e.g. compress_nlvr_dtp.py:270) so a run
    is reproducible from its output directory alone."""
    from madtp_tpu.parallel import dist

    if not dist.is_main_process():
        return
    import yaml

    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        yaml.dump(config, f)


def driver_mesh(args):
    """Build the driver's data-parallel mesh (None if single-device/--dp off),
    logging the decision once."""
    from madtp_tpu.parallel.mesh import data_mesh

    mesh = data_mesh(enable=args.dp != "off")
    if mesh is not None:
        print(f"data-parallel: {mesh.shape['data']} devices over 'data'")
    return mesh


def load_config(args) -> dict:
    import yaml

    if args.synthetic:
        config = {}  # synthetic smoke runs ignore task yamls entirely
    else:
        config = yaml.safe_load(open(args.config))
    config["pretrained"] = args.pretrained or config.get("pretrained", "")
    config["max_epoch"] = args.epoch
    config["p"] = args.p
    if getattr(args, "batch_size_train", 0):
        config["batch_size_train"] = args.batch_size_train
        config["batch_size"] = args.batch_size_train  # caption yaml key
    if getattr(args, "batch_size_test", 0):
        config["batch_size_test"] = args.batch_size_test
    # yaml 1.1 parses exponent-without-dot floats ('3e-6') as strings
    for k, v in list(config.items()):
        if isinstance(v, str):
            try:
                config[k] = float(v) if any(c in v for c in ".eE") and (
                    v.replace(".", "").replace("e", "").replace("E", "")
                    .replace("-", "").replace("+", "").isdigit()) else v
            except ValueError:
                pass
    return config


def enable_compile_cache(path: Optional[str] = None):
    """Persistent XLA compilation cache — avoids re-paying the remote-compile
    latency across driver invocations.  Keyed per backend (a CPU AOT entry
    must not be replayed on another machine type)."""
    import jax

    try:
        if path is None:
            path = f"/tmp/jax_cache_{jax.default_backend()}"
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def set_seed(seed: int):
    np.random.seed(seed)
    random.seed(seed)


def dump_log(output_dir: str, name: str, stats: dict, append: bool = True):
    os.makedirs(output_dir, exist_ok=True)
    mode = "a" if append else "w"
    with open(os.path.join(output_dir, name), mode) as f:
        f.write(json.dumps(stats) + "\n")


def make_tokenizer(args, config):
    """BERT tokenizer from a local vocab; synthetic mode builds a toy one."""
    from madtp_tpu.data.tokenizer_bert import BertWordPieceTokenizer

    vocab_path = args.bert_vocab or config.get("bert_vocab", "")
    if vocab_path and os.path.exists(vocab_path):
        return BertWordPieceTokenizer(vocab_path)
    if not args.synthetic:
        raise FileNotFoundError(
            "bert vocab.txt not found; pass --bert_vocab (zero-egress env, "
            "no hub download) or use --synthetic"
        )
    words = [f"w{i}" for i in range(64)] + [
        "the", "a", "left", "right", "is", "on", "object", "picture", "of"]
    return BertWordPieceTokenizer.toy(words)


def cached_probe_batches(cache: list, loader_factory, n: int = 2):
    """Pull ``n`` probe batches ONCE and memoize them in ``cache`` (a
    one-element ``[None]`` list owned by the caller).

    Multi-batch probes absorb cross-batch keep-count variance — the same
    policy the ``--fast_eval`` calibrators use — and reusing one cached set
    across epochs avoids churning a fresh loader (and abandoning its
    prefetch iterator/workers) every epoch just to read one batch."""
    if cache[0] is None:
        import itertools

        it = loader_factory()
        cache[0] = list(itertools.islice(it, n))
        close = getattr(it, "close", None)
        if close is not None:
            close()
        if not cache[0]:
            raise ValueError(
                "probe loader yielded no batches — dataset smaller than "
                "the probe batch size with drop_last=True?")
    return cache[0]


def fast_capacity_schedule(vk, tk, cap_mode: str, *, margin_v: int = 16,
                           margin_t: int = 4):
    """Shared --fast_train/--fast_eval calibration: vision capacities at the
    fused kernel's granularity (nearest-128, or lossless ceil-64), text at
    ceil-8.  One bucketing policy for every driver — the per-driver copies
    drifted independently before this helper existed.  ``tk=None`` skips the
    text schedule (caption/CLIP: decoder or causal text tower unpruned)."""
    from madtp_tpu.prune.calibrate import calibrate_capacities

    vk = np.asarray(vk)
    cv = calibrate_capacities(
        vk if vk.ndim == 2 else vk[None, :], margin=margin_v,
        multiple=128 if cap_mode == "nearest" else 64, mode=cap_mode)
    if tk is None:
        return _forced_caps("MADTP_FORCE_CAPS_V", cv), None
    tk = np.asarray(tk)
    ct = calibrate_capacities(tk if tk.ndim == 2 else tk[None, :],
                              margin=margin_t, multiple=8)
    return (_forced_caps("MADTP_FORCE_CAPS_V", cv),
            _forced_caps("MADTP_FORCE_CAPS_T", ct))


def _forced_caps(env_key: str, calibrated):
    """Env override for a calibrated capacity schedule
    (``MADTP_FORCE_CAPS_V=256,256,...`` / ``MADTP_FORCE_CAPS_T=...``):
    an operational escape hatch when a calibrated schedule misbehaves, and
    the fault-injection hook for the codegen-crash auto-fallback test
    (tools/repro_sched_crash.py documents the known-bad schedules)."""
    raw = os.environ.get(env_key, "")
    if not raw:
        return calibrated
    forced = tuple(int(x) for x in raw.split(","))
    if len(forced) != len(calibrated):
        raise SystemExit(
            f"{env_key} has {len(forced)} entries; the model needs "
            f"{len(calibrated)} (one per layer)")
    print(f"WARNING: {env_key} overrides the calibrated capacity schedule "
          f"{tuple(calibrated)} -> {forced}")
    return forced


def backend_reachable(attempts: int = 4, probe_timeout: int = 150,
                      cooldown: int = 20) -> bool:
    """Probe the accelerator backend in a bounded SUBPROCESS (a downed
    remote TPU worker makes ``jax.devices()`` hang forever in-process —
    bench.py's outage pattern).  Each probe is a tiny matmul in a fresh
    interpreter; a crashed worker's stuck chip claim clears within ~a
    minute, so a few spaced attempts distinguish 'restarting' from
    'down'."""
    import subprocess
    import sys
    import time

    code = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
            "print('PROBE_OK', float(jnp.sum(x @ x)))")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_timeout, capture_output=True)
            if r.returncode == 0 and b"PROBE_OK" in r.stdout:
                return True
            msg = (r.stdout + r.stderr).decode(errors="replace")[-200:]
        except subprocess.TimeoutExpired:
            msg = f"probe timed out after {probe_timeout}s"
        print(f"backend probe {i + 1}/{attempts} failed: {msg}", flush=True)
        if i + 1 < attempts:
            time.sleep(cooldown)
    return False


_CRASH_SIGNATURE = "TPU worker process crashed or restarted"


def codegen_crash_autofallback(main_fn):
    """Auto-mitigate the known backend codegen fault: certain capacity
    schedules crash the remote TPU worker at whole-program compile/execute
    with the fused Pallas scoring attention enabled (deterministic repro +
    bisection matrix: tools/repro_sched_crash.py; every schedule our
    calibrators produce is green — the fault needs an unlucky user/forced
    schedule).

    The crash poisons the in-process jax client permanently (measured: the
    raised ``JaxRuntimeError`` is catchable but every subsequent dispatch
    fails with the same UNAVAILABLE), so in-process retry is impossible.
    Instead: wait for the worker to restart (bounded subprocess probes),
    then RE-EXEC this driver with ``MADTP_NO_FUSED_ATTN=1`` (pure-XLA
    scoring attention — correct, ~25% slower at bench shapes) and
    ``--resume`` when a resume checkpoint already exists, so completed
    epochs are not retrained.  One fallback attempt only: a second crash
    without the fused kernel is a different bug and re-raises."""
    import functools

    @functools.wraps(main_fn)
    def wrapper(*a, **kw):
        try:
            return main_fn(*a, **kw)
        except Exception as e:
            if _CRASH_SIGNATURE not in f"{type(e).__name__}: {e}":
                raise
            if os.environ.get("MADTP_NO_FUSED_ATTN") or \
                    os.environ.get("MADTP_CRASH_FALLBACK") == "1":
                raise  # fused kernel already off — not the known fault
            print("=" * 72)
            print("FATAL backend fault: the TPU worker crashed compiling/"
                  "running this program — the known codegen fault for "
                  "unlucky capacity schedules (tools/repro_sched_crash.py)."
                  "\nAuto-fallback: restarting this driver with "
                  "MADTP_NO_FUSED_ATTN=1 (pure-XLA scoring attention; "
                  "correct, ~25% slower).", flush=True)
            print("=" * 72)
            # a crashed worker can take many minutes to restart (measured
            # round 4: >20 min once) — wait patiently before giving up
            if not backend_reachable(attempts=10, cooldown=60):
                raise RuntimeError(
                    "backend did not come back after the worker crash; "
                    "re-run manually with MADTP_NO_FUSED_ATTN=1") from e
            import sys

            argv = [sys.executable] + sys.argv
            # resume completed epochs instead of retraining them
            out = ""
            if "--output_dir" in sys.argv:
                out = sys.argv[sys.argv.index("--output_dir") + 1]
            if out and "--resume" not in sys.argv:
                for cand in ("resume_ckpt", "resume_ckpt.npz"):
                    if os.path.exists(os.path.join(out, cand)):
                        argv += ["--resume", os.path.join(out, cand)]
                        break
            env = dict(os.environ)
            env["MADTP_NO_FUSED_ATTN"] = "1"
            env["MADTP_CRASH_FALLBACK"] = "1"
            print(f"re-exec: {' '.join(argv)}", flush=True)
            sys.stdout.flush()
            sys.stderr.flush()
            os.execve(sys.executable, argv, env)

    return wrapper


def build_blip_cfg(config: dict, image_size: int, *, twin_cross: bool = False):
    """Shared BLIP model-config builder: reference presets base/large
    (models/blip.py:228-247) plus a 'tiny' preset for fixture/CI runs
    (tools/make_fixture.py)."""
    from madtp_tpu.core.config import MedConfig, ViTConfig
    from madtp_tpu.models.blip import BlipConfig

    import dataclasses

    preset = config.get("vit", "base")
    # reference yaml key vit_grad_ckpt (models/vit.py:119-121); the reference
    # ships it False on 80G A100s — here it defaults ON for full-size
    # presets because a BLIP-base training step does not fit 16G HBM without
    # remat (forward-only eval is unaffected by jax.checkpoint)
    remat = bool(config.get("vit_grad_ckpt", preset != "tiny"))
    # reference yaml key vit_ckpt_layer (models/vit.py:255): remat only the
    # last N ViT blocks; honored exactly when the user's yaml carries it
    # (incl. the grad_ckpt=True + ckpt_layer=0 -> no remat quirk).  Absent
    # key -> -1 = all blocks (this repo's default when remat is on).
    ckpt_layers = int(config.get("vit_ckpt_layer", -1))

    def make_med(**kw):
        # optional custom BERT arch json — the reference's med_config
        # parameter (models/blip_nlvr.py:21, configs/med_config.json);
        # encoder_width is always overridden by the vision width like the
        # reference does (models/blip_nlvr.py:53)
        import os

        path = config.get("med_config", "")
        if path and os.path.exists(path):
            return MedConfig.from_json(path, **kw)
        return MedConfig(**kw)

    if preset == "large":
        vit = dataclasses.replace(ViTConfig.large(image_size),
                                  grad_checkpoint=remat,
                                  ckpt_layers=ckpt_layers)
        med = make_med(twin_cross=twin_cross, encoder_width=vit.embed_dim)
        return BlipConfig(vit=vit, med=med,
                          sd_num=config.get("sd_num", 100),
                          sd_dim=config.get("sd_dim", 768))
    if preset == "tiny":
        vit = ViTConfig(image_size=image_size, patch_size=16, embed_dim=64,
                        depth=2, num_heads=4, sd_dim=64,
                        grad_checkpoint=remat, ckpt_layers=ckpt_layers)
        med = make_med(twin_cross=twin_cross, encoder_width=64,
                       hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=256,
                       vocab_size=config.get("vocab_size", 30524), sd_dim=64)
        return BlipConfig(vit=vit, med=med,
                          sd_num=config.get("sd_num", 100), sd_dim=64)
    vit = ViTConfig(image_size=image_size, grad_checkpoint=remat,
                    ckpt_layers=ckpt_layers)
    med = make_med(twin_cross=twin_cross, encoder_width=vit.embed_dim)
    return BlipConfig(vit=vit, med=med,
                      sd_num=config.get("sd_num", 100),
                      sd_dim=config.get("sd_dim", 768))


def init_blip_params(cfg, seed: int, *, heads=("cls",), with_decoder=False,
                     with_encoder=True):
    """Random init of a full BLIP param tree (fixture/testing; the reference
    always fine-tunes from a checkpoint)."""
    import jax
    import jax.numpy as jnp

    from madtp_tpu.models.med import init_med_params
    from madtp_tpu.models.vit import init_vit_params

    rng = np.random.RandomState(seed)
    H = cfg.med.hidden_size
    params = {
        "visual_encoder": init_vit_params(cfg.vit, rng),
        "space_dict": rng.randn(cfg.sd_num, cfg.sd_dim).astype(np.float32),
    }
    if with_encoder:
        params["text_encoder"] = init_med_params(cfg.med, rng)
    if with_decoder:
        from dataclasses import replace

        params["text_decoder"] = init_med_params(
            replace(cfg.med, twin_cross=False), rng)
    if "cls" in heads:
        params["cls_head"] = {
            "fc1": {"kernel": (rng.randn(H, H) * 0.02).astype(np.float32),
                    "bias": np.zeros((H,), np.float32)},
            "fc2": {"kernel": (rng.randn(H, 2) * 0.02).astype(np.float32),
                    "bias": np.zeros((2,), np.float32)},
        }
    if "retrieval" in heads:
        E = 16 if cfg.med.hidden_size <= 64 else 256
        for nm, od in (("vision_proj", E), ("text_proj", E), ("itm_head", 2)):
            params[nm] = {
                "kernel": (rng.randn(H, od) * 0.02).astype(np.float32),
                "bias": np.zeros((od,), np.float32)}
    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Mid-run resume checkpoints (shared by all five drivers).
# The reference has NO resume at all (a crash restarts from the last best
# checkpoint manually, SURVEY §5); here every driver writes a resume
# checkpoint at each epoch boundary and on preemption (utils/preempt).
# ---------------------------------------------------------------------------


def save_resume(output_dir: str, state_tree, meta: dict) -> str:
    """Save ``state_tree`` (any pytree: params / optimizer / momentum /
    queues) + ``meta`` (flat str->float/int dict).

    Multi-process: rank-0 writes the native npz format (orbax's save()
    barriers across ALL processes — a rank-0-only call deadlocks, see
    CLAUDE.md); single-process uses an orbax directory.  Returns the path
    that ``--resume`` takes."""
    import jax

    from madtp_tpu.parallel import dist

    if dist.process_count() > 1:
        path = os.path.join(output_dir, "resume_ckpt.npz")
        if dist.is_main_process():
            from madtp_tpu.ckpt.export import save_native

            leaves = {f"{i:05d}": np.asarray(l) for i, l in
                      enumerate(jax.tree_util.tree_leaves(state_tree))}
            save_native(path, {"leaves": leaves}, extras=meta)
        return path
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, "resume_ckpt"))
    # crash-safe generation swap: write the new checkpoint beside the old
    # one and rename into place, so a kill mid-save (preemption grace
    # window expiring) never destroys the only resume state
    new, old = path + ".new", path + ".stale"
    for d in (new, old):
        if os.path.exists(d):
            shutil.rmtree(d)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(new, {"state": state_tree, "meta": meta}, force=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(new, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return path


def load_resume(path: str, state_template, meta_template: dict):
    """Restore a ``save_resume`` checkpoint.  ``state_template`` must be a
    freshly-initialized pytree with the run's exact structure (the npz
    format stores a flat leaf list and unflattens against it)."""
    import jax

    if path.endswith(".npz"):
        from madtp_tpu.ckpt.export import load_native

        tree, meta = load_native(path, require_extras=True)
        leaves = [tree["leaves"][f"{i:05d}"]
                  for i in range(len(tree["leaves"]))]
        state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state_template), leaves)
        return state, {k: meta.get(k, meta_template[k])
                       for k in meta_template}
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path),
            item={"state": state_template, "meta": dict(meta_template)})
    return restored["state"], restored["meta"]
