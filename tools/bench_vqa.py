"""On-chip VQA eval throughput: ViT-B/480 + question encoder + answer
ranking over a k=128 candidate list (the reference eval configuration:
480px inputs, ``configs/vqa.yaml``, rank_answer ``models/blip_vqa.py:
149-203``, Ori 186.1 GFLOPs).

Times image-encode + question-encode + two-pass answer ranking, pruned at
the 50%-GFLOPs temperature (gather --fast_eval schedule) vs dense, matched
bf16.

Run: python tools/bench_vqa.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=16, n_answers=256, k=128, reps=3, pipeline=4):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    import dataclasses

    from madtp_tpu.cli.common import build_blip_cfg, init_blip_params
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models.blip import blip_vqa_encode
    from madtp_tpu.prune.calibrate import calibrate_capacities
    from madtp_tpu.tasks.vqa import rank_answers

    from madtp_tpu.prune.flops import vqa_gflops

    cfg = build_blip_cfg({"vit": "base"}, 480)
    cfg = cfg._replace(med=dataclasses.replace(cfg.med, twin_cross=False))
    params = init_blip_params(cfg, 0, with_decoder=True, heads=())
    params16 = cast_tree(params, jnp.bfloat16)

    rng = np.random.RandomState(7)
    q_ids = jnp.asarray(rng.randint(1, cfg.med.vocab_size, (batch, 12)))
    q_mask = jnp.ones((batch, 12), jnp.int32)
    a_ids = np.zeros((n_answers, 6), np.int32)
    a_ids[:, 0] = 30522  # bos
    a_ids[:, 1:4] = rng.randint(1, 30000, (n_answers, 3))
    a_mask = np.zeros((n_answers, 6), np.int32)
    a_mask[:, :4] = 1
    a_ids, a_mask = jnp.asarray(a_ids), jnp.asarray(a_mask)

    def make_step(prune, cv, ct):
        def step(params, images, q_ids, q_mask, t):
            out, _, _ = blip_vqa_encode(
                params, images, q_ids, q_mask, cfg,
                temperature=t, prune_active=prune,
                capacities_v=cv, capacities_t=ct)
            best, _ = rank_answers(
                params["text_decoder"], out.state, a_ids, a_mask, cfg,
                k=k, pad_token_id=0)
            return best, out.kept_counts

        return jax.jit(step)

    shape = (batch, 3, 480, 480)
    ims = [jnp.asarray(rng.randn(*shape).astype(np.float32)
                       ).astype(jnp.bfloat16) for _ in range(pipeline)]

    def timed(step):
        out = step(params16, ims[0], q_ids, q_mask, t_star)
        float(jnp.sum(out[0]))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [step(params16, im, q_ids, q_mask, t_star) for im in ims]
            float(jnp.sum(outs[-1][0]))
            best = min(best, (time.perf_counter() - t0) / len(ims))
        return best * 1000

    # bisect the temperature to 50% of the VQA analytic GFLOPs (the same
    # target the driver's controller chases), then calibrate capacities

    @jax.jit
    def kept_probe(params, images, q_ids, q_mask, t):
        out, _, vk = blip_vqa_encode(
            params, images, q_ids, q_mask, cfg,
            temperature=t, prune_active=True)
        return vk, out.kept_counts

    n_q0 = int(q_ids.shape[1])
    ori = vqa_gflops(cfg.vit, cfg.med,
                     [cfg.vit.num_patches] * cfg.vit.depth,
                     [n_q0 - 1] * cfg.med.num_hidden_layers, n_q0,
                     n_answers=k)
    lo, hi = 0.05, 60.0
    for _ in range(14):
        tt = (lo * hi) ** 0.5
        vk, tk = kept_probe(params16, ims[0], q_ids, q_mask, jnp.float32(tt))
        g = vqa_gflops(cfg.vit, cfg.med, np.asarray(vk), np.asarray(tk),
                       n_q0, n_answers=k)
        lo, hi = (tt, hi) if g > 0.5 * ori else (lo, tt)
    t_star = jnp.float32(tt)
    caps_v = calibrate_capacities(np.asarray(vk)[None, :], margin=8,
                                  multiple=128, mode="nearest")
    caps_t = calibrate_capacities(np.asarray(tk)[None, :], margin=4,
                                  multiple=8)

    res = {"batch": batch, "image_size": 480, "n_answers": n_answers,
           "k": k, "temperature": round(float(tt), 3),
           "gflops_dense": round(ori, 1), "gflops_pruned": round(g, 1),
           "capacities_v": list(caps_v), "capacities_t": list(caps_t)}
    res["pruned_ms"] = round(timed(make_step(True, caps_v, caps_t)), 1)
    res["dense_ms"] = round(timed(make_step(False, None, None)), 1)
    res["samples_per_sec_pruned"] = round(batch / res["pruned_ms"] * 1000, 1)
    res["samples_per_sec_dense"] = round(batch / res["dense_ms"] * 1000, 1)
    res["vs_dense"] = round(res["dense_ms"] / res["pruned_ms"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
