"""On-chip BLIP retrieval eval throughput — the reference's §3.4 throughput
benchmark path (``compress_retrieval_dtp.py:95-205``): ITC corpus encode
(both towers) then ITM rerank of each row's top-k candidates.

Measures, pruned at the 50%-GFLOPs temperature (gather --fast_eval
schedule) vs dense, matched bf16:

  - corpus encode: ms / image (ViT tower + text tower amortized)
  - ITM rerank: ms / query row (k_test cross-attn scorings per row)

Corpus is synthetic but full-size (ViT-B/384, 35-token texts, k_test=32
at a 64-image corpus — rerank cost scales linearly in k_test, reference
coco k_test=256).

Run: python tools/bench_retrieval.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_images=64, texts_per_image=2, k_test=32, batch=16,
         rows_per_call=8):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from madtp_tpu.cli.common import build_blip_cfg, init_blip_params
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models import med as M
    from madtp_tpu.models.vit import vit_forward
    from madtp_tpu.prune.calibrate import calibrate_capacities
    from madtp_tpu.tasks.retrieval import encode_corpus, rerank_scores

    import dataclasses

    cfg = build_blip_cfg({"vit": "base"}, 384)
    cfg = cfg._replace(med=dataclasses.replace(cfg.med, twin_cross=False))
    params = init_blip_params(cfg, 0, heads=("retrieval",))
    params16 = cast_tree(params, jnp.bfloat16)
    t_star = 3.4785  # the p=0.5 bench temperature

    rng = np.random.RandomState(7)
    n_texts = n_images * texts_per_image
    import jax.numpy as _jnp

    images = [_jnp.asarray(rng.randn(batch, 3, 384, 384).astype(np.float32)
                           ).astype(_jnp.bfloat16)
              for _ in range(n_images // batch)]
    text_ids = rng.randint(1, cfg.med.vocab_size, (n_texts, 35)).astype(np.int32)
    text_mask = np.ones((n_texts, 35), np.int32)

    # calibrate gather capacities from one mask-mode probe batch
    _, _, vk = vit_forward(
        params["visual_encoder"], jnp.asarray(images[0]), cfg=cfg.vit,
        space_dict=params["space_dict"], temperature=jnp.float32(t_star),
        prune_active=True)
    out = M.med_encoder(
        params["text_encoder"], jnp.asarray(text_ids[:batch]),
        jnp.asarray(text_mask[:batch]), cfg.med, mode="text",
        space_dict=params["space_dict"], temperature=jnp.float32(t_star),
        prune_active=True)
    caps_v = calibrate_capacities(np.asarray(vk)[None, :], margin=8,
                                  multiple=128, mode="nearest")
    caps_t = calibrate_capacities(np.asarray(out.kept_counts)[None, :],
                                  margin=4, multiple=8)

    def run(tag, prune, cv, ct, t):
        t0 = time.perf_counter()
        feats = encode_corpus(
            params16, cfg, iter(images), text_ids, text_mask,
            temperature=t, prune_active=prune,
            capacities_v=cv, capacities_t=ct)
        jax.block_until_ready(feats[0])
        dt_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        s_i2t, s_t2i = rerank_scores(
            params16, cfg, *feats, text_ids, text_mask, k_test=k_test,
            temperature=t, prune_active=prune, rows_per_call=rows_per_call,
            capacities_t=ct)
        dt_rr = time.perf_counter() - t0
        return dt_enc, dt_rr

    # warm both pipelines (compile), then measure
    res = {"n_images": n_images, "n_texts": n_texts, "k_test": k_test,
           "rows_per_call": rows_per_call,
           "capacities_v": list(caps_v), "capacities_t": list(caps_t)}
    run("warm_p", True, caps_v, caps_t, t_star)
    reps_p = [run("p", True, caps_v, caps_t, t_star) for _ in range(2)]
    enc_p, rr_p = (min(r[i] for r in reps_p) for i in (0, 1))
    run("warm_d", False, None, None, 0.0)
    reps_d = [run("d", False, None, None, 0.0) for _ in range(2)]
    enc_d, rr_d = (min(r[i] for r in reps_d) for i in (0, 1))

    res["encode_ms_per_image_pruned"] = round(enc_p / n_images * 1000, 2)
    res["encode_ms_per_image_dense"] = round(enc_d / n_images * 1000, 2)
    res["rerank_ms_per_row_pruned"] = round(
        rr_p / (n_images + n_texts) * 1000, 2)
    res["rerank_ms_per_row_dense"] = round(
        rr_d / (n_images + n_texts) * 1000, 2)
    res["eval_s_pruned"] = round(enc_p + rr_p, 2)
    res["eval_s_dense"] = round(enc_d + rr_d, 2)
    res["vs_dense"] = round((enc_d + rr_d) / (enc_p + rr_p), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
