"""On-chip COCO-caption eval throughput: ViT-B/384 image tower + 12-layer
BLIP decoder beam search (num_beams=3, max_length=20, the reference eval
settings, ``compress_caption_dtp.py:61-105`` / ``models/blip.py:175-196``).

Times image-encode + beam decode end-to-end, pruned at the 50%-GFLOPs
temperature (gather --fast_eval schedule) vs dense, matched bf16.  Beam
decode cross-attends the image tokens each step, so the pruned token buffer
(584 -> 256 slots) cuts the per-step cross-attention and the KV memory it
re-reads every one of the ~20 decode steps.

Run: python tools/bench_caption.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=16, reps=3, pipeline=4):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from madtp_tpu.cli.common import build_blip_cfg, init_blip_params
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models.blip import blip_caption_encode_image
    from madtp_tpu.prune.calibrate import calibrate_capacities
    from madtp_tpu.tasks.caption import beam_generate

    cfg = build_blip_cfg({"vit": "base"}, 384)
    params = jax.tree.map(jnp.asarray, init_blip_params(
        cfg, 0, heads=(), with_decoder=True, with_encoder=False))
    BOS, EOS, PAD = 30522, 102, 0
    t_star = jnp.float32(3.4785)  # the p=0.5 bench temperature

    def make_step(prune, caps):
        def step(params, images, t):
            vstate, _, kept = blip_caption_encode_image(
                params, images, cfg, temperature=t, prune_active=prune,
                capacities=caps)
            B = images.shape[0]
            prompt = jnp.full((B, 1), BOS, jnp.int32)
            seqs = beam_generate(
                params["text_decoder"], vstate, prompt, cfg,
                num_beams=3, max_length=20, min_length=5,
                eos_token_id=EOS, pad_token_id=PAD)
            return seqs, kept

        return jax.jit(step)

    rng = np.random.RandomState(7)
    shape = (batch, 3, 384, 384)
    ims = [jnp.asarray(rng.randn(*shape).astype(np.float32)
                       ).astype(jnp.bfloat16) for _ in range(pipeline)]
    params16 = cast_tree(params, jnp.bfloat16)

    def timed(step):
        out = step(params16, ims[0], t_star)
        jax.block_until_ready(out)
        float(jnp.sum(out[0]))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [step(params16, im, t_star) for im in ims]
            float(jnp.sum(outs[-1][0]))
            best = min(best, (time.perf_counter() - t0) / len(ims))
        return best * 1000

    # calibrate the gather schedule from one mask-mode probe
    probe = make_step(True, None)
    _, vk = probe(params16, ims[0], t_star)
    caps = calibrate_capacities(np.asarray(vk)[None, :], margin=8,
                                multiple=128, mode="nearest")

    res = {"batch": batch, "num_beams": 3, "max_length": 20,
           "capacities": list(caps)}
    res["pruned_ms"] = round(timed(make_step(True, caps)), 1)
    res["dense_ms"] = round(timed(make_step(False, None)), 1)
    res["samples_per_sec_pruned"] = round(batch / res["pruned_ms"] * 1000, 1)
    res["samples_per_sec_dense"] = round(batch / res["dense_ms"] * 1000, 1)
    res["vs_dense"] = round(res["dense_ms"] / res["pruned_ms"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
