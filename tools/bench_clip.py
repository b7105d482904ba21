"""On-chip CLIP retrieval-eval throughput: ViT-L/14@336 (the reference's
CLIP config, 395.7 GFLOPs total — its FLOPs-heaviest model,
``compress_retrieval_clip_dtp.py:281``).

Times both towers end-to-end (image features + text features = the ITC
retrieval eval compute) pruned at ~p=0.5 vs dense, matched bf16 dtypes, and
reports the fused-kernel contribution (the mask-mode vision tower became
kernel-eligible when its buffer was lane-aligned).

Run: python tools/bench_clip.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=16, reps=3, pipeline=6):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    import madtp_tpu.ops.attention as A
    from madtp_tpu.core.config import CLIPConfig
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models.clip import (clip_encode_image, clip_encode_text,
                                       init_clip_params)
    from madtp_tpu.prune.flops import clip_gflops

    cfg = CLIPConfig(embed_dim=768, image_resolution=336, vision_layers=24,
                     vision_width=1024, vision_patch_size=14,
                     transformer_width=768, transformer_heads=12,
                     transformer_layers=12, sd_dim=768)
    rng = np.random.RandomState(0)
    params = jax.tree.map(jnp.asarray, init_clip_params(cfg, rng))
    sd = jnp.asarray(rng.randn(100, cfg.sd_dim).astype(np.float32))
    text = np.zeros((batch, cfg.context_length), np.int64)
    lens = rng.randint(8, 20, size=batch)
    for b, L in enumerate(lens):
        text[b, :L] = rng.randint(1, 40000, size=L)
        text[b, L - 1] = 49407  # EOT = highest id
    text = jnp.asarray(text)

    def towers(params, sd, images, text, t, active):
        img, _, vk = clip_encode_image(params, images, cfg, space_dict=sd,
                                       temperature=t, prune_active=active)
        txt, _, tk = clip_encode_text(params, text, cfg, space_dict=sd,
                                      temperature=t, prune_active=active)
        return img, txt, vk, tk

    # prune_active is a static python bool -> two separate jits
    run_p = jax.jit(lambda p, s, im, tx, t: towers(p, s, im, tx, t, True))
    run_d = jax.jit(lambda p, s, im, tx, t: towers(p, s, im, tx, t, False))

    shape = (batch, 3, cfg.image_resolution, cfg.image_resolution)
    ims = [jnp.asarray(rng.randn(*shape).astype(np.float32)
                       ).astype(jnp.bfloat16) for _ in range(pipeline)]
    params16 = cast_tree(params, jnp.bfloat16)
    sd16 = sd.astype(jnp.bfloat16)

    def timed(f, *args):
        out = f(ims[0], *args)
        float(jnp.sum(out[0]))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [f(im, *args) for im in ims]
            float(jnp.sum(outs[-1][0]))
            best = min(best, (time.perf_counter() - t0) / len(ims))
        return best * 1000

    # temperature: geometric bisection to ~50% of the dense GFLOPs
    ori = clip_gflops(cfg, [cfg.vision_num_patches] * cfg.vision_layers,
                      [cfg.context_length - 1] * cfg.transformer_layers)
    target = 0.5 * ori
    lo, hi = 0.05, 60.0
    for _ in range(14):
        t = (lo * hi) ** 0.5
        _, _, vk, tk = run_p(params, sd, ims[0].astype(jnp.float32), text,
                             jnp.float32(t))
        g = clip_gflops(cfg, np.asarray(vk), np.asarray(tk))
        lo, hi = (t, hi) if g > target else (lo, t)
    t_star = jnp.float32(t)

    res = {"batch": batch, "gflops_dense": round(ori, 1),
           "gflops_pruned": round(g, 1), "temperature": round(float(t), 3)}
    res["pruned_mask_ms"] = round(timed(
        lambda im, *a: run_p(*a[:2], im, *a[2:]), params16, sd16, text,
        t_star), 1)
    res["dense_ms"] = round(timed(
        lambda im, *a: run_d(*a[:2], im, *a[2:]), params16, sd16, text,
        t_star), 1)

    # gather fast path (--fast_eval): nearest-128 vision capacities
    from madtp_tpu.prune.calibrate import calibrate_capacities

    caps_v = calibrate_capacities(np.asarray(vk)[None, :], margin=16,
                                  multiple=128, mode="nearest")
    res["capacities_vision"] = list(caps_v)

    def towers_g(params, sd, images, text, t):
        img, _, vkk = clip_encode_image(params, images, cfg, space_dict=sd,
                                        temperature=t, prune_active=True,
                                        capacities=caps_v)
        txt, _, tkk = clip_encode_text(params, text, cfg, space_dict=sd,
                                       temperature=t, prune_active=True)
        return img, txt, vkk, tkk

    run_g = jax.jit(towers_g)
    res["pruned_gather_ms"] = round(timed(
        lambda im, *a: run_g(*a[:2], im, *a[2:]), params16, sd16, text,
        t_star), 1)

    A.FUSED_MIN_N = 10_000  # kernel off -> XLA scoring attention
    run_p2 = jax.jit(lambda p, s, im, tx, t: towers(p, s, im, tx, t, True))
    res["pruned_mask_ms_no_kernel"] = round(timed(
        lambda im, *a: run_p2(*a[:2], im, *a[2:]), params16, sd16, text,
        t_star), 1)
    A.FUSED_MIN_N = 192

    res["samples_per_sec_pruned"] = round(
        batch / res["pruned_gather_ms"] * 1000, 1)
    res["samples_per_sec_dense"] = round(batch / res["dense_ms"] * 1000, 1)
    res["vs_dense"] = round(res["dense_ms"] / res["pruned_gather_ms"], 3)
    res["kernel_speedup_mask"] = round(
        res["pruned_mask_ms_no_kernel"] / res["pruned_mask_ms"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
