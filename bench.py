"""Headline benchmark: BLIP-NLVR2 eval throughput at p=0.5 on one TPU chip.

Mirrors the reference's operational benchmark (NLVR2 eval loop,
``compress_nlvr_dtp.py:72-107``; north-star metric in BASELINE.md): samples/sec
through the full pruned model (one sample = an image PAIR + sentence, as the
reference counts accuracy per pair).

Procedure:
1. bisect the DTP temperature until the analytic GFLOPs hits
   ``Ori * (1 - p)`` — the same target the reference's bang-bang controller
   chases with fvcore tracing;
2. calibrate a static per-layer capacity schedule from mask-mode kept counts;
3. time the gather-mode eval step (the TPU fast path);
4. baseline = the same model dense (temperature 0, no pruning), SAME dtype
   (bf16 both sides; the fp32 dense number is reported in detail only).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Weights are random (no reference checkpoints are shipped in-tree); throughput
is weight-independent.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main(p_target: float = 0.5, batch: int = 32, iters: int = 20,
         image_size: int = 384, text_len: int = 26):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _nlvr_setup
    from madtp_tpu.models.blip import blip_nlvr_forward
    from madtp_tpu.prune.calibrate import calibrate_capacities
    from madtp_tpu.prune.flops import nlvr_gflops

    cfg, params, images, ids, mask, _ = _nlvr_setup(
        image_size=image_size, B=batch, text_len=text_len
    )

    ori = nlvr_gflops(cfg.vit, cfg.med, [cfg.vit.num_patches] * cfg.vit.depth,
                      [text_len - 1] * cfg.med.num_hidden_layers, text_len)
    target = ori * (1.0 - p_target)

    @jax.jit
    def fwd_mask(params, images, ids, mask, t):
        logits, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True
        )
        return logits, vk, tk

    def measured_gflops(t):
        _, vk, tk = jax.block_until_ready(
            fwd_mask(params, images, ids, mask, jnp.float32(t)))
        return (
            nlvr_gflops(cfg.vit, cfg.med, np.asarray(vk), np.asarray(tk), text_len),
            np.asarray(vk), np.asarray(tk),
        )

    # temperature bisection toward the GFLOPs target (controller analogue)
    lo_t, hi_t = 0.05, 60.0
    best = None
    for _ in range(18):
        t = (lo_t * hi_t) ** 0.5  # geometric bisection
        g, vk, tk = measured_gflops(t)
        best = (t, g, vk, tk)
        if g > target:
            lo_t = t
        else:
            hi_t = t
    t_star, g_star, vk, tk = best
    # Vision capacities rounded to the NEAREST 128 — the fused kernel's lane
    # granularity — instead of ceil-64: a 320-slot buffer costs the same
    # 384-lane kernel as a 384-slot one, so layers just past a boundary are
    # clamped down to 256 (overflow folds into the merge token).  On-chip
    # A/B (tools/bench_ablate.py): 468 vs 400 samples/s; decision drift is
    # quantified in tests/test_calibration_drift.py + COVERAGE.md.
    caps_v = calibrate_capacities(vk[None, :], margin=8, multiple=128,
                                  mode="nearest")
    caps_t = calibrate_capacities(tk[None, :], margin=2, multiple=8)

    @jax.jit
    def fwd_gather(params, images, ids, mask, t):
        from madtp_tpu.models import med as M
        from madtp_tpu.models.blip import _split_state
        from madtp_tpu.models.vit import vit_forward
        from madtp_tpu.ops.layers import linear

        B = ids.shape[0]
        vstate, _, vkept = vit_forward(
            params["visual_encoder"], images, cfg=cfg.vit,
            space_dict=params["space_dict"], temperature=t,
            prune_active=True, capacities=caps_v,
        )
        st0, st1 = _split_state(vstate, B)
        out = M.med_encoder(
            params["text_encoder"], ids, mask, cfg.med,
            mode="multimodal", encoder_state=st0, encoder_state1=st1,
            space_dict=params["space_dict"], temperature=t,
            prune_active=True, capacities=caps_t,
        )
        h = jax.nn.relu(linear(params["cls_head"]["fc1"], out.state.x[:, 0, :]))
        return linear(params["cls_head"]["fc2"], h)

    def time_fn(f, images_list, *args):
        """Pipelined throughput timing: queue ``iters`` batches with distinct
        inputs, force completion once at the end (the device executes
        in-order, so total/iters = per-batch device time without paying the
        tunnel's per-call readback latency)."""
        float(jnp.sum(f(images_list[0], *args)))  # compile + warm
        t0 = time.perf_counter()
        outs = [f(im, *args) for im in images_list]
        float(jnp.sum(outs[-1]))
        dt_pipelined = (time.perf_counter() - t0) / len(images_list)
        # latency (single batch incl. sync) for reference
        t0 = time.perf_counter()
        float(jnp.sum(f(images_list[0], *args)))
        dt_latency = time.perf_counter() - t0
        return dt_pipelined, dt_latency

    tj = jnp.float32(t_star)
    rng = np.random.RandomState(7)
    images_list = [
        jnp.asarray(rng.randn(*images.shape).astype(np.float32))
        for _ in range(min(iters, 8))
    ]

    from madtp_tpu.core.tree import cast_tree

    params16 = cast_tree(params, jnp.bfloat16)
    images16 = [im.astype(jnp.bfloat16) for im in images_list]

    dt_pruned, lat_pruned = time_fn(
        lambda im: fwd_gather(params16, im, ids, mask, tj), images16)

    @jax.jit
    def fwd_dense(params, images, ids, mask):
        logits, _ = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=0.0, prune_active=False
        )
        return logits

    # dense baseline in the SAME dtype as the pruned path (bf16) so
    # vs_baseline isolates the pruning speedup; fp32 dense reported aside
    dt_dense, lat_dense = time_fn(
        lambda im: fwd_dense(params16, im, ids, mask), images16)
    dt_dense32, _ = time_fn(
        lambda im: fwd_dense(params, im, ids, mask), images_list)

    # host-transfer saturation probe (VERDICT r2 #7): ship the images as
    # uint8 (the natural camera format; cast+scale on device) — if the
    # batch-32 saturation is transfer-bound, quartering the host->device
    # bytes moves throughput
    @jax.jit
    def fwd_gather_u8(params, images_u8, ids, mask, t):
        im = images_u8.astype(jnp.bfloat16) * (1.0 / 127.5) - 1.0
        return fwd_gather(params, im, ids, mask, t)

    images_u8 = [
        np.clip((np.asarray(im, np.float32) + 1) * 127.5, 0, 255)
        .astype(np.uint8) for im in images_list
    ]

    def time_host(f, ims):
        """Includes the host->device transfer each iter (device_put inside
        the loop) — the end-to-end feeding cost an eval loop actually pays."""
        float(jnp.sum(f(jnp.asarray(ims[0]))))
        t0 = time.perf_counter()
        outs = [f(jnp.asarray(im)) for im in ims]
        float(jnp.sum(outs[-1]))
        return (time.perf_counter() - t0) / len(ims)

    dt_host_f32 = time_host(
        lambda im: fwd_gather(params16, im.astype(jnp.bfloat16), ids, mask,
                              tj),
        [np.asarray(im, np.float32) for im in images_list])
    dt_host_u8 = time_host(
        lambda im: fwd_gather_u8(params16, im, ids, mask, tj), images_u8)

    sps = batch / dt_pruned
    sps_dense = batch / dt_dense
    # MFU (MAC convention x2): analytic model FLOPs at the measured
    # throughput over the chip's bf16 peak (v5e-class ~197 TFLOP/s;
    # override with MADTP_PEAK_TFLOPS for other chips)
    peak_tflops = float(os.environ.get("MADTP_PEAK_TFLOPS", 197.0))
    mfu = (sps * g_star * 2.0 / 1000.0) / peak_tflops
    mfu_dense = (sps_dense * ori * 2.0 / 1000.0) / peak_tflops
    result = {
        "metric": f"nlvr2_eval_samples_per_sec_per_chip@p={p_target}",
        "value": round(sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(sps / sps_dense, 3),
        "detail": {
            "dense_samples_per_sec": round(sps_dense, 2),
            "dense_fp32_samples_per_sec": round(batch / dt_dense32, 2),
            "temperature": round(float(t_star), 4),
            "gflops_pruned": round(g_star, 2),
            "gflops_dense": round(ori, 2),
            "gflops_target": round(target, 2),
            "capacities_vision": list(caps_v),
            "capacities_text": list(caps_t),
            "batch": batch,
            "latency_ms_pruned": round(lat_pruned * 1000, 1),
            "latency_ms_dense": round(lat_dense * 1000, 1),
            "mfu": round(mfu, 3),
            "mfu_dense": round(mfu_dense, 3),
            "peak_tflops_assumed": peak_tflops,
            "samples_per_sec_with_host_transfer_f32": round(
                batch / dt_host_f32, 2),
            "samples_per_sec_with_host_transfer_u8": round(
                batch / dt_host_u8, 2),
            "compute_dtype": "bfloat16 (both; matched baseline)",
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


def _backend_reachable(attempts: int = 3, probe_timeout: int = 240) -> bool:
    """The remote TPU backend can go down entirely (observed mid-round:
    ``jax.devices()`` hangs forever, no error).  Probe it in a SUBPROCESS
    with a hard timeout so this benchmark fails loudly and boundedly
    instead of hanging the harness.  Retries cover the other failure mode
    (a killed process holding the chip claim for ~a minute)."""
    import subprocess

    code = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
            "print('BENCH_PROBE_OK', float(jnp.sum(x @ x)))")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_timeout, capture_output=True)
            if r.returncode == 0 and b"BENCH_PROBE_OK" in r.stdout:
                return True
            msg = r.stderr.decode(errors="replace")[-500:]
        except subprocess.TimeoutExpired:
            msg = f"probe timed out after {probe_timeout}s"
        print(f"bench: backend probe {i + 1}/{attempts} failed: {msg}",
              file=sys.stderr)
        if i < attempts - 1:  # no pointless sleep after the final attempt
            time.sleep(30)
    return False


def _backend_reachable_with_late_retry() -> bool:
    """Round 4's official bench artifact was voided by a ~2h transient
    outage that ended after the run gave up — so after the quick probe
    fails, wait out up to two more windows (default 30+30 min, override
    ``MADTP_BENCH_RETRY_MIN=m1,m2,...``; ``=0`` disables) re-probing before
    declaring the round's measurement lost.  Still bounded: worst case
    ~75 min, then rc=3."""
    import os

    if _backend_reachable():
        return True
    waits = os.environ.get("MADTP_BENCH_RETRY_MIN", "30,30")
    mins = [float(w) for w in waits.split(",") if w and float(w) > 0]
    for i, m in enumerate(mins):
        print(f"bench: backend down — late retry {i + 1}/{len(mins)}: "
              f"sleeping {m:g} min before re-probing "
              f"(MADTP_BENCH_RETRY_MIN={waits})", file=sys.stderr)
        time.sleep(m * 60)
        if _backend_reachable(attempts=2):
            print(f"bench: backend RECOVERED after late retry {i + 1}",
                  file=sys.stderr)
            return True
    return False


if __name__ == "__main__":
    if not _backend_reachable_with_late_retry():
        # Loud, bounded failure: non-zero rc + a tail the harness records.
        # (Do NOT print a fake JSON metric — a fabricated value would be
        # recorded as this round's measurement.)
        print("bench: TPU backend UNREACHABLE (outage — jax.devices() "
              "hangs; nothing on the framework side causes or fixes it). "
              "Last good on-chip run: 548.66 samples/s pruned vs 231.5 "
              "dense bf16 (vs_baseline 2.37, MFU 0.372) — see "
              "BENCH_r03.json / COVERAGE.md.", file=sys.stderr)
        sys.exit(3)
    main()
