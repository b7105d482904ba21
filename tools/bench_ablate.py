"""On-chip A/B ablation for the NLVR bench fast path (VERDICT r1 items 3/9).

Times, in ONE process (same chip/tunnel conditions):
  1. pruned gather, fused kernel everywhere (FUSED_MIN_N=0)
  2. pruned gather, text-side XLA bypass (FUSED_MIN_N=192)
  3. (2) + vision capacities rounded to the NEAREST 128 (tighter buffers;
     clamped tokens fold into the merge token)
  4. dense bf16 baseline

Run: python tools/bench_ablate.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(p_target=0.5, batch=32, image_size=384, text_len=26, reps=3):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _nlvr_setup
    import madtp_tpu.ops.attention as A
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models import med as M
    from madtp_tpu.models.blip import _split_state, blip_nlvr_forward
    from madtp_tpu.models.vit import vit_forward
    from madtp_tpu.ops.layers import linear
    from madtp_tpu.prune.calibrate import calibrate_capacities
    from madtp_tpu.prune.flops import nlvr_gflops

    cfg, params, images, ids, mask, _ = _nlvr_setup(
        image_size=image_size, B=batch, text_len=text_len)

    ori = nlvr_gflops(cfg.vit, cfg.med, [cfg.vit.num_patches] * cfg.vit.depth,
                      [text_len - 1] * cfg.med.num_hidden_layers, text_len)
    target = ori * (1.0 - p_target)

    @jax.jit
    def fwd_mask(params, images, ids, mask, t):
        logits, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True)
        return logits, vk, tk

    lo_t, hi_t = 0.05, 60.0
    for _ in range(18):
        t = (lo_t * hi_t) ** 0.5
        _, vk, tk = jax.block_until_ready(
            fwd_mask(params, images, ids, mask, jnp.float32(t)))
        g = nlvr_gflops(cfg.vit, cfg.med, np.asarray(vk), np.asarray(tk),
                        text_len)
        if g > target:
            lo_t = t
        else:
            hi_t = t
    vk, tk = np.asarray(vk), np.asarray(tk)
    t_star = t

    def make_gather(caps_v, caps_t):
        def fwd(params, images, ids, mask, t):
            B = ids.shape[0]
            vstate, _, _ = vit_forward(
                params["visual_encoder"], images, cfg=cfg.vit,
                space_dict=params["space_dict"], temperature=t,
                prune_active=True, capacities=caps_v)
            st0, st1 = _split_state(vstate, B)
            out = M.med_encoder(
                params["text_encoder"], ids, mask, cfg.med,
                mode="multimodal", encoder_state=st0, encoder_state1=st1,
                space_dict=params["space_dict"], temperature=t,
                prune_active=True, capacities=caps_t)
            h = jax.nn.relu(linear(params["cls_head"]["fc1"],
                                   out.state.x[:, 0, :]))
            return linear(params["cls_head"]["fc2"], h)
        return jax.jit(fwd)

    caps_v_64 = calibrate_capacities(vk[None], margin=8, multiple=64)
    caps_t_8 = calibrate_capacities(tk[None], margin=2, multiple=8)
    caps_v_n128 = calibrate_capacities(vk[None], margin=8, multiple=128,
                                       mode="nearest")

    params16 = cast_tree(params, jnp.bfloat16)
    rng = np.random.RandomState(7)
    im16 = [jnp.asarray(rng.randn(*images.shape).astype(np.float32)
                        ).astype(jnp.bfloat16) for _ in range(8)]
    ids_j, mask_j, tj = jnp.asarray(ids), jnp.asarray(mask), jnp.float32(t_star)

    def time_fn(f):
        float(jnp.sum(f(im16[0])))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [f(im) for im in im16]
            float(jnp.sum(outs[-1]))
            best = min(best, (time.perf_counter() - t0) / len(im16))
        return batch / best  # samples/s (median-ish: best-of-reps)

    results = {}

    A.FUSED_MIN_N = 0
    f1 = make_gather(caps_v_64, caps_t_8)
    results["fused_all_caps64"] = time_fn(
        lambda im: f1(params16, im, ids_j, mask_j, tj))

    A.FUSED_MIN_N = 192
    f2 = make_gather(caps_v_64, caps_t_8)
    results["text_xla_caps64"] = time_fn(
        lambda im: f2(params16, im, ids_j, mask_j, tj))

    f3 = make_gather(caps_v_n128, caps_t_8)
    results["text_xla_caps_n128"] = time_fn(
        lambda im: f3(params16, im, ids_j, mask_j, tj))

    A.FUSED_MIN_N = 0
    f4 = make_gather(caps_v_n128, caps_t_8)
    results["fused_all_caps_n128"] = time_fn(
        lambda im: f4(params16, im, ids_j, mask_j, tj))

    @jax.jit
    def fwd_dense(params, images, ids, mask):
        logits, _ = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=0.0,
            prune_active=False)
        return logits

    results["dense_bf16"] = time_fn(
        lambda im: fwd_dense(params16, im, ids_j, mask_j))

    print(json.dumps({
        "samples_per_sec": {k: round(v, 1) for k, v in results.items()},
        "caps_v_64": list(caps_v_64), "caps_v_n128": list(caps_v_n128),
        "caps_t": list(caps_t_8), "temperature": round(float(t_star), 3),
        "ratios_vs_dense": {k: round(v / results["dense_bf16"], 3)
                            for k, v in results.items()},
    }, indent=1))


if __name__ == "__main__":
    main()
