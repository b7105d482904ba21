"""Same-process on-chip A/B for two candidate DTP-glue reformulations (r5).

Both candidates are semantics-preserving rewrites of seams in prune/dtp.py
and both were REJECTED by this tool's measurements (see the helper
docstrings in prune/dtp.py and COVERAGE.md r5):
  * candidate ``_invert_permutation``: the stable ``argsort(order)`` second
    sort pass as a single O(P) int32 scatter — measured 3.2% SLOWER
    end-to-end (TPU sort is vector-friendly; scatter serializes);
  * candidate ``_merge_dropped``: the merge einsum reading the bf16 token
    buffer directly (fp32 MXU accumulation) instead of up-casting first —
    measured NEUTRAL (1.0004x; XLA fuses the cast into the contraction).

The tool times the full NLVR gather eval step (bench.py configuration)
with the SHIPPED formulations vs the candidates monkeypatched in, in ONE
process (same chip/tunnel conditions, CLAUDE.md noise discipline),
alternating A/B timing rounds and reporting per-variant medians.
``MADTP_GLUE_AB`` picks which candidate(s) the "new" variant enables:
both (default) | invert | merge.

Run: python tools/bench_glue.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=32, image_size=384, text_len=26, iters=8, reps=3):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _nlvr_setup
    import madtp_tpu.prune.dtp as DT
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.tasks.nlvr import make_eval_step

    cfg, params, images, ids0, mask0, _ = _nlvr_setup(
        image_size=image_size, B=batch, text_len=text_len)
    params16 = cast_tree(params, jnp.bfloat16)
    caps_v = (384, 384) + (256,) * 10  # the bench p=0.5 schedule (BENCH_r03)
    caps_t = (32,) * 12
    tj = jnp.float32(3.4785)

    rng = np.random.RandomState(7)
    ims = [jnp.asarray(rng.randn(2 * batch, 3, image_size, image_size)
                       .astype(np.float32)).astype(jnp.bfloat16)
           for _ in range(iters)]
    ids = jnp.asarray(ids0)
    mask = jnp.asarray(mask0)

    # --- shipped formulations (prune/dtp.py helpers) ---
    old_invert, old_merge = DT._invert_permutation, DT._merge_dropped

    # --- the rejected candidates, defined here so the measurement that
    # rejected them stays reproducible ---
    def new_invert(order):
        B, Pn = order.shape
        iota = jnp.broadcast_to(jnp.arange(Pn, dtype=order.dtype)[None, :],
                                order.shape)
        return jnp.zeros_like(order).at[
            jnp.arange(B)[:, None], order].set(iota, unique_indices=True)

    def new_merge(w, patches):
        if patches.dtype == jnp.bfloat16:
            return jnp.einsum(
                "bp,bpd->bd", w.astype(jnp.bfloat16), patches,
                preferred_element_type=jnp.float32,
            ).astype(patches.dtype)
        return jnp.einsum(
            "bp,bpd->bd", w, patches.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(patches.dtype)

    from madtp_tpu.tasks.nlvr import _build_eval_step

    def make_step():
        # bypass the LRU step cache AND trace/compile NOW, while this
        # variant's monkeypatch is active (jit traces at first call)
        step = _build_eval_step(cfg, True, caps_v, caps_t)
        float(jnp.sum(jax.tree.leaves(
            step(params16, ims[0], ids, mask, tj))[0]))
        return step

    def timed(step):
        float(jnp.sum(jax.tree.leaves(
            step(params16, ims[0], ids, mask, tj))[0]))  # warm
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [step(params16, im, ids, mask, tj) for im in ims]
            float(jnp.sum(jax.tree.leaves(outs[-1])[0]))
            best = min(best, (time.perf_counter() - t0) / len(ims))
        return best

    # which of the two trims the "new" variant enables (MADTP_GLUE_AB:
    # both | invert | merge) — separates the scatter-based rank inversion
    # from the bf16 merge read when attributing the A/B delta
    which = os.environ.get("MADTP_GLUE_AB", "both")
    var_invert = new_invert if which in ("both", "invert") else old_invert
    var_merge = new_merge if which in ("both", "merge") else old_merge

    # build + compile both executables first, then alternate timing rounds
    DT._invert_permutation, DT._merge_dropped = old_invert, old_merge
    step_old = make_step()
    DT._invert_permutation, DT._merge_dropped = var_invert, var_merge
    step_new = make_step()

    # logits parity between the variants (decisions must be identical; bf16
    # values may differ only through the merged token's weight rounding)
    lo = np.asarray(step_old(params16, ims[0], ids, mask, tj)[0],
                    np.float32)
    ln = np.asarray(step_new(params16, ims[0], ids, mask, tj)[0],
                    np.float32)
    max_delta = float(np.max(np.abs(lo - ln)))

    t_old, t_new = [], []
    for _ in range(3):
        t_old.append(timed(step_old))
        t_new.append(timed(step_new))
    ms_old = float(np.median(t_old) * 1e3)
    ms_new = float(np.median(t_new) * 1e3)

    print(json.dumps({
        "metric": f"nlvr2_eval_glue_ab_ms[{which}]",
        "value": round(ms_new, 2),
        "unit": "ms/batch",
        "vs_baseline": round(ms_old / ms_new, 4),
        "detail": {
            "ms_old": round(ms_old, 2),
            "ms_new": round(ms_new, 2),
            "samples_per_sec_old": round(batch / (ms_old / 1e3), 2),
            "samples_per_sec_new": round(batch / (ms_new / 1e3), 2),
            "logits_max_delta": max_delta,
            "batch": batch,
            "capacities_vision": list(caps_v),
        },
    }))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=32, type=int)
    args = ap.parse_args()
    main(batch=args.batch)
