"""On-chip compression TRAINING step timing: mask mode vs gather mode.

The reference trains with physically shrinking sequences, so its training
steps get faster as the temperature rises (dynamic shapes, GPU).  Our
mask-mode training step (exact reference semantics, fixed 1+P+depth buffer)
pays full-buffer FLOPs every step; the gather fast path (static calibrated
capacities) banks the same token reduction the reference gets — at the cost
of one recompile per distinct capacity schedule (bounded by bucketing).

Times (batch ``--batch`` pairs, ViT-B/384 NLVR, fp32 params like the
drivers):
  - dense training step (prune off)          [the no-compression baseline]
  - mask-mode pruned training step           [driver default]
  - gather-mode pruned training step         [--fast_train candidate]
  - dense + gather under --amp               [bf16 compute / fp32 masters]

Run: python tools/bench_train.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=16, image_size=384, text_len=26, reps=3, pipeline=4):
    # default batch 16 (r5 sweep): per-pair step time still improves 8->16
    # (gather+amp 7.8 -> 6.5 ms/pair, MFU 0.349 -> 0.421); 32 OOMs the
    # mask-mode full-buffer step, which timed() records as null.
    import jax
    import jax.numpy as jnp
    import optax

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _nlvr_setup
    from madtp_tpu.models.blip import blip_nlvr_forward
    from madtp_tpu.prune.calibrate import calibrate_capacities
    from madtp_tpu.train.optim import make_adamw

    # remat over the ViT block scan: without it the backward saves
    # [12,B*2,12,577,577] attention probabilities (~6.4G fp32 at batch 8)
    # and a full-size training step cannot fit 16G HBM at any useful batch
    cfg, params, images, ids, mask, targets = _nlvr_setup(
        image_size=image_size, B=batch, text_len=text_len,
        vit_kw=dict(grad_checkpoint=True))
    tx = make_adamw(lr=3e-6, weight_decay=0.05)
    opt_state = tx.init(params)
    t_star = jnp.float32(3.4785)  # the p=0.5 bench temperature

    from madtp_tpu.train.loops import _amp_cast

    def make_step(prune_active, capacities_v=None, capacities_t=None,
                  amp=False):
        def loss_fn(params, images, ids, mask, targets, temperature):
            params, images = _amp_cast(amp, params, images)
            loss_ori, loss_fdt, _ = blip_nlvr_forward(
                params, images, ids, mask, cfg,
                temperature=temperature, prune_active=prune_active,
                train=True, targets=targets,
                capacities_v=capacities_v, capacities_t=capacities_t,
            )
            return loss_ori + 0.1 * loss_fdt

        @jax.jit
        def step(params, opt_state, images, ids, mask, targets, temperature):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, images, ids, mask, targets, temperature)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    rng = np.random.RandomState(7)
    ims = [jnp.asarray(rng.randn(*images.shape).astype(np.float32))
           for _ in range(pipeline)]

    def timed(step):
        # train steps donate (params, opt_state) — give each variant fresh
        # device buffers so the module-level trees stay valid
        try:
            p = jax.tree.map(jnp.array, params)
            o = tx.init(p)
            p, o, loss = step(p, o, ims[0], ids, mask, targets, t_star)
            float(loss)  # compile + warm
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                for im in ims:
                    p, o, loss = step(p, o, im, ids, mask, targets, t_star)
                float(loss)
                best = min(best, (time.perf_counter() - t0) / len(ims))
            return best * 1000
        except Exception as e:  # a variant OOMing must not void the others
            if "RESOURCE_EXHAUSTED" not in str(e) + type(e).__name__:
                raise
            print(f"bench_train: variant OOM at batch {batch} pairs — "
                  f"recorded as null", file=sys.stderr, flush=True)
            return None

    def r1(x):
        return None if x is None else round(x, 1)

    def ratio(a, b):
        return None if (a is None or b is None) else round(a / b, 3)

    res = {"batch_pairs": batch}

    res["dense_step_ms"] = r1(timed(make_step(False)))
    res["mask_step_ms"] = r1(timed(make_step(True)))

    # capacity schedule from one mask-mode probe batch at t_star (what a
    # --fast_train epoch would calibrate)
    @jax.jit
    def probe(params, images, ids, mask, t):
        _, kept = blip_nlvr_forward(params, images, ids, mask, cfg,
                                    temperature=t, prune_active=True)
        return kept

    # probe at the bench batch; on OOM (large-batch mask buffers + the HBM
    # already held by the timed variants' donated trees) fall back to a
    # halved probe batch — keep counts grow with batch so the schedule is
    # slightly tight, but gather-mode overflow folds into the merge token
    # (semantics preserved; speed stays representative)
    pb = batch
    while True:
        try:
            vk, tk = probe(params, ims[0][:2 * pb], ids[:pb], mask[:pb],
                           t_star)
            break
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) + type(e).__name__:
                raise
            if pb <= 4:
                # an earlier OOM'd variant can wedge the backend (observed:
                # even a host slice then OOMs) — emit what we measured
                # rather than dying with a traceback
                print("bench_train: backend out of memory even at the "
                      "minimum probe batch; emitting partial result",
                      file=sys.stderr, flush=True)
                res["oom_truncated"] = True
                print(json.dumps(res, indent=1))
                return
            pb //= 2
            print(f"bench_train: probe OOM, retrying at probe batch {pb}",
                  file=sys.stderr, flush=True)
    res["probe_batch"] = pb
    caps_v = calibrate_capacities(np.asarray(vk)[None, :], margin=8,
                                  multiple=128, mode="nearest")
    caps_t = calibrate_capacities(np.asarray(tk)[None, :], margin=2, multiple=8)
    res["capacities_vision"] = list(caps_v)
    res["capacities_text"] = list(caps_t)

    res["gather_step_ms"] = r1(timed(make_step(True, caps_v, caps_t)))

    res["gather_speedup_vs_mask"] = ratio(
        res["mask_step_ms"], res["gather_step_ms"])
    res["gather_speedup_vs_dense"] = ratio(
        res["dense_step_ms"], res["gather_step_ms"])

    # --amp (r5): bf16 compute / fp32 masters, the drivers' mixed-precision
    # switch (train/loops._amp_cast).  amp-gather vs amp-dense is the
    # matched-precision training comparison (same convention as bench.py's
    # bf16-vs-bf16 eval headline).
    res["dense_amp_step_ms"] = r1(timed(make_step(False, amp=True)))
    res["mask_amp_step_ms"] = r1(timed(make_step(True, amp=True)))
    res["gather_amp_step_ms"] = r1(
        timed(make_step(True, caps_v, caps_t, amp=True)))
    res["amp_speedup_dense"] = ratio(
        res["dense_step_ms"], res["dense_amp_step_ms"])
    res["amp_speedup_mask"] = ratio(
        res["mask_step_ms"], res["mask_amp_step_ms"])
    res["amp_speedup_gather"] = ratio(
        res["gather_step_ms"], res["gather_amp_step_ms"])
    res["gather_amp_speedup_vs_dense_amp"] = ratio(
        res["dense_amp_step_ms"], res["gather_amp_step_ms"])

    # A/B the fused Pallas BACKWARD vs the XLA-recompute VJP in the same
    # process (r3; the env var gates the custom-vjp dispatch at TRACE time,
    # and a fresh python function gets a fresh jit cache entry)
    import os

    os.environ["MADTP_NO_FUSED_BWD"] = "1"
    res["mask_step_xla_bwd_ms"] = r1(timed(make_step(True)))
    res["gather_step_xla_bwd_ms"] = r1(
        timed(make_step(True, caps_v, caps_t)))
    del os.environ["MADTP_NO_FUSED_BWD"]
    res["fused_bwd_speedup_mask"] = ratio(
        res["mask_step_xla_bwd_ms"], res["mask_step_ms"])
    res["fused_bwd_speedup_gather"] = ratio(
        res["gather_step_xla_bwd_ms"], res["gather_step_ms"])

    # train throughput + MFU at p=0.5 (VERDICT r3 item 7).  FLOPs per train
    # step ~= 4x the forward (fwd + ~2x bwd + the remat re-forward of the
    # block scans); MAC-convention x2 like bench.py's eval MFU.  'samples'
    # are NLVR pairs (2 images each), matching the eval metric.
    from madtp_tpu.prune.flops import nlvr_gflops

    g_pruned = nlvr_gflops(cfg.vit, cfg.med, np.asarray(vk), np.asarray(tk),
                           text_len)
    g_dense = nlvr_gflops(cfg.vit, cfg.med,
                          [cfg.vit.num_patches] * cfg.vit.depth,
                          [text_len - 1] * cfg.med.num_hidden_layers,
                          text_len)
    peak_tflops = float(os.environ.get("MADTP_PEAK_TFLOPS", 197.0))

    def train_stats(step_ms, gflops):
        if step_ms is None:
            return None, None
        sps = batch / (step_ms / 1000.0)
        mfu = (sps * gflops * 4.0 * 2.0 / 1000.0) / peak_tflops
        return round(sps, 2), round(mfu, 3)

    (res["train_samples_per_sec_gather"],
     res["train_mfu_gather"]) = train_stats(res["gather_step_ms"], g_pruned)
    (res["train_samples_per_sec_mask"],
     res["train_mfu_mask"]) = train_stats(res["mask_step_ms"], g_pruned)
    (res["train_samples_per_sec_dense"],
     res["train_mfu_dense"]) = train_stats(res["dense_step_ms"], g_dense)
    (res["train_samples_per_sec_gather_amp"],
     res["train_mfu_gather_amp"]) = train_stats(
        res["gather_amp_step_ms"], g_pruned)
    (res["train_samples_per_sec_dense_amp"],
     res["train_mfu_dense_amp"]) = train_stats(
        res["dense_amp_step_ms"], g_dense)
    res["train_flops_convention"] = "4x fwd (fwd+bwd+remat), MACs x2"
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main(**({"batch": int(sys.argv[1])} if len(sys.argv) > 1 else {}))
