"""Batch-size MFU sweep for the NLVR eval fast path (VERDICT r4 item 4).

Hypothesis to test: batch 32 underfills the 128-slot capacity layers (the
fused kernel's lane granularity) and a larger batch amortizes the DTP glue,
so MFU should rise with batch.  For each batch in --batches:

  1. reuse ONE temperature (bisected at the base batch toward
     Ori*(1-p) GFLOPs, same as bench.py);
  2. recalibrate the static capacity schedule at THAT batch from a
     mask-mode probe (batch-max keep counts grow with batch — exactly what
     a per-batch-size serving export does);
  3. time the bf16 gather step pipelined (bench.py methodology: distinct
     batches queued, one readback) and the matched bf16 dense baseline;
  4. report samples/s, vs_dense, and MFU (MAC x2 over MADTP_PEAK_TFLOPS,
     default v5e-class 197).

Prints one JSON line with a per-batch table.  Run on the real chip:
    python tools/bench_batch_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batches=(32, 64, 128), p_target=0.5, image_size=384, text_len=26,
         iters=8):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _nlvr_setup
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models.blip import blip_nlvr_forward
    from madtp_tpu.prune.calibrate import calibrate_capacities
    from madtp_tpu.prune.flops import nlvr_gflops
    from madtp_tpu.tasks.nlvr import make_eval_step

    cfg, params, images0, ids0, mask0, _ = _nlvr_setup(
        image_size=image_size, B=batches[0], text_len=text_len)
    params16 = cast_tree(params, jnp.bfloat16)

    ori = nlvr_gflops(cfg.vit, cfg.med, [cfg.vit.num_patches] * cfg.vit.depth,
                      [text_len - 1] * cfg.med.num_hidden_layers, text_len)
    target = ori * (1.0 - p_target)

    @jax.jit
    def fwd_mask(params, images, ids, mask, t):
        _, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True)
        return vk, tk

    def probe(t, images, ids, mask):
        vk, tk = jax.block_until_ready(
            fwd_mask(params, images, ids, mask, jnp.float32(t)))
        g = nlvr_gflops(cfg.vit, cfg.med, np.asarray(vk), np.asarray(tk),
                        text_len)
        return g, np.asarray(vk), np.asarray(tk)

    lo_t, hi_t = 0.05, 60.0
    for _ in range(18):
        t = (lo_t * hi_t) ** 0.5
        g, _, _ = probe(t, images0, ids0, mask0)
        if g > target:
            lo_t = t
        else:
            hi_t = t
    t_star = (lo_t * hi_t) ** 0.5
    tj = jnp.float32(t_star)
    peak_tflops = float(os.environ.get("MADTP_PEAK_TFLOPS", 197.0))

    rng = np.random.RandomState(7)
    rows = []
    for B in batches:
      # Large batches can OOM the DENSE baseline (its XLA attention
      # materializes [2B,H,N,N] fp32 probs ~4 GB at B=128; the pruned path
      # is fused and does not) — one failed row must not void the sweep.
      try:
        ids = jnp.asarray(rng.randint(1, cfg.med.vocab_size,
                                      size=(B, text_len)))
        mask = jnp.ones((B, text_len), jnp.int32)
        probe_im = jnp.asarray(
            rng.randn(2 * B, 3, image_size, image_size).astype(np.float32))
        g, vk, tk = probe(t_star, probe_im, ids, mask)
        caps_v = calibrate_capacities(vk[None], margin=8, multiple=128,
                                      mode="nearest")
        caps_t = calibrate_capacities(tk[None], margin=2, multiple=8)
        step = make_eval_step(cfg, True, tuple(caps_v), tuple(caps_t))

        ims = [jnp.asarray(rng.randn(2 * B, 3, image_size, image_size)
                           .astype(np.float32)).astype(jnp.bfloat16)
               for _ in range(iters)]

        def timed(f):
            float(jnp.sum(jax.tree.leaves(f(ims[0]))[0]))  # compile+warm
            t0 = time.perf_counter()
            outs = [f(im) for im in ims]
            float(jnp.sum(jax.tree.leaves(outs[-1])[0]))
            return (time.perf_counter() - t0) / len(ims)

        dt = timed(lambda im: step(params16, im, ids, mask, tj))

        @jax.jit
        def fwd_dense(params, images, ids, mask):
            logits, _ = blip_nlvr_forward(
                params, images, ids, mask, cfg, temperature=0.0,
                prune_active=False)
            return logits

        dt_dense = timed(lambda im: fwd_dense(params16, im, ids, mask))

        sps, sps_d = B / dt, B / dt_dense
        rows.append({
            "batch": B,
            "samples_per_sec": round(sps, 2),
            "dense_samples_per_sec": round(sps_d, 2),
            "vs_dense": round(sps / sps_d, 3),
            "mfu": round((sps * g * 2.0 / 1000.0) / peak_tflops, 3),
            "mfu_dense": round((sps_d * ori * 2.0 / 1000.0) / peak_tflops, 3),
            "gflops_pruned": round(g, 2),
            "capacities_vision": list(map(int, caps_v)),
        })
        print(f"batch {B}: {rows[-1]}", file=sys.stderr)
      except Exception as e:  # noqa: BLE001 — record the row, keep sweeping
        rows.append({"batch": B, "error": f"{type(e).__name__}: {e}"[:300]})
        print(f"batch {B}: FAILED {rows[-1]['error']}", file=sys.stderr)

    ok = [r for r in rows if "error" not in r]
    if not ok:
        print(json.dumps({"metric": f"nlvr2_eval_batch_sweep@p={p_target}",
                          "value": None, "unit": "samples/s",
                          "vs_baseline": None, "detail": {"rows": rows}}))
        return
    best = max(ok, key=lambda r: r["samples_per_sec"])
    print(json.dumps({
        "metric": f"nlvr2_eval_batch_sweep@p={p_target}",
        "value": best["samples_per_sec"],
        "unit": "samples/s",
        "vs_baseline": best["vs_dense"],
        "detail": {"temperature": round(float(t_star), 4),
                   "gflops_dense": round(ori, 2),
                   "peak_tflops_assumed": peak_tflops,
                   "rows": rows},
    }))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128")
    ap.add_argument("--p", default=0.5, type=float)
    args = ap.parse_args()
    main(batches=tuple(int(b) for b in args.batches.split(",")),
         p_target=args.p)
