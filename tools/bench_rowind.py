"""On-chip validation + A/B for --row_independent serving exports.

Two questions only the real backend can answer (CPU tests bypass the
fused Pallas kernel, and vmap-of-pallas_call takes a different lowering
path than the plain batched kernel):

1. does each row of the NATIVE row-independent step (prune/dtp.py
   row_independent=True — per-row keep counts instead of the batch max)
   match the same step run on that sample alone — DTP keep DECISIONS
   exactly, logits to bf16 numerics (different batch sizes lower
   differently)?
2. what does per-row DTP semantics COST vs the batch-coupled step?  The
   native flag keeps the fused Pallas scoring kernel engaged (the
   coupling lives in the DTP glue, not the kernel) — unlike the earlier
   vmap implementation, which Mosaic refused to lower (squeezed-batch
   BlockSpecs) and which therefore paid the pure-XLA path (measured
   1.9x at these shapes; kept for history in COVERAGE.md r4).

Run: python tools/bench_rowind.py [batch] [image_size]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=8, image_size=384, text_len=26):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _nlvr_setup
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models.blip import blip_nlvr_forward

    cfg, params, images, ids, mask, _ = _nlvr_setup(
        image_size=image_size, B=batch, text_len=text_len)
    params = cast_tree(params, jnp.bfloat16)
    images = images.astype(jnp.bfloat16)
    t = jnp.float32(1.0)

    def fn(params, images, ids, mask, t):
        logits, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True)
        return logits, vk, tk

    def fn_ri(params, images, ids, mask, t):
        logits, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True,
            row_independent=True)
        return logits, vk, tk

    rowind = jax.jit(fn_ri)
    out_r = jax.block_until_ready(rowind(params, images, ids, mask, t))

    batched = jax.jit(fn)  # batch-coupled reference semantics
    out_b = jax.block_until_ready(batched(params, images, ids, mask, t))

    # semantics contract vs the SAME row-independent step at batch 1:
    # DTP DECISIONS exact; logits to bf16 numerics (different batch sizes
    # lower differently)
    one = jax.jit(fn_ri)
    decisions_equal = True
    logit_maxd = 0.0
    for j in range(min(batch, 3)):
        solo_imgs = jnp.stack([images[j], images[batch + j]])
        lw, vkw, tkw = one(params, solo_imgs, ids[j:j + 1],
                           mask[j:j + 1], t)
        decisions_equal &= bool(
            np.array_equal(
                np.stack([np.asarray(out_r[1])[:, j],
                          np.asarray(out_r[1])[:, batch + j]], axis=1),
                np.asarray(vkw))
            and np.array_equal(np.asarray(out_r[2])[:, j],
                               np.asarray(tkw)[:, 0]))
        logit_maxd = max(logit_maxd, float(np.abs(
            np.asarray(out_r[0], np.float32)[j]
            - np.asarray(lw, np.float32)[0]).max()))

    def timeit(f, n=8):
        xs = [jnp.asarray(np.random.RandomState(i).randn(*images.shape)
                          .astype(np.float32)).astype(jnp.bfloat16)
              for i in range(n)]
        float(jnp.sum(f(params, xs[0], ids, mask, t)[0].astype(jnp.float32)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [f(params, x, ids, mask, t) for x in xs]
            float(jnp.sum(outs[-1][0].astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1000

    ms_r = timeit(rowind)
    ms_b = timeit(batched)          # fused kernel path
    os.environ["MADTP_NO_FUSED_ATTN"] = "1"
    ms_bx = timeit(jax.jit(lambda *a: fn(*a)))  # XLA batched (same scoring
    del os.environ["MADTP_NO_FUSED_ATTN"]       # math as the rowind trace)
    print(json.dumps({
        "metric": "rowind_serving_step_ms",
        "batch": batch, "image_size": image_size,
        "rowind_ms": round(ms_r, 2),
        "batched_fused_ms": round(ms_b, 2),
        "batched_xla_ms": round(ms_bx, 2),
        "rowind_over_batched_fused": round(ms_r / ms_b, 3),
        "rowind_over_batched_xla": round(ms_r / ms_bx, 3),
        "decisions_equal_to_batch1": decisions_equal,
        "logits_maxd_vs_batch1": round(logit_maxd, 6),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    main(batch=b, image_size=s)
