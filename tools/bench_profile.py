"""On-chip component timing for the NLVR bench fast path (VERDICT r1 item 9):
where does the pruned step's time go, and would a cross-attention /
text-side Pallas kernel pay?

Times (same process, pipelined batches):
  - full pruned gather step (the bench configuration)
  - ViT tower alone (fused self-attention kernel path)
  - ViT tower alone with the kernel disabled (pure XLA) -> kernel speedup
  - MED twin-cross encoder alone (text self-attn + 2x cross-attn, XLA)

Run: python tools/bench_profile.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=32, image_size=384, text_len=26, reps=3):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _nlvr_setup
    import madtp_tpu.ops.attention as A
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models import med as M
    from madtp_tpu.models.blip import _split_state
    from madtp_tpu.models.vit import vit_forward
    from madtp_tpu.ops.layers import linear
    from madtp_tpu.prune.dtp import TokenState

    cfg, params, images, ids, mask, _ = _nlvr_setup(
        image_size=image_size, B=batch, text_len=text_len)
    params16 = cast_tree(params, jnp.bfloat16)
    caps_v = (384, 384) + (256,) * 10  # the bench nearest-128 schedule
    caps_t = (32,) * 12
    t_star = jnp.float32(3.4785)

    rng = np.random.RandomState(7)
    im16 = [jnp.asarray(rng.randn(*images.shape).astype(np.float32)
                        ).astype(jnp.bfloat16) for _ in range(8)]
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    def timed(f, *args):
        float(jnp.sum(jax.tree.leaves(f(im16[0], *args))[0]))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [f(im, *args) for im in im16]
            float(jnp.sum(jax.tree.leaves(outs[-1])[0]))
            best = min(best, (time.perf_counter() - t0) / len(im16))
        return best * 1000  # ms / batch

    def make_vit():
        def f(images, params, t):
            vstate, _, _ = vit_forward(
                params["visual_encoder"], images, cfg=cfg.vit,
                space_dict=params["space_dict"], temperature=t,
                prune_active=True, capacities=caps_v)
            return vstate.x
        return jax.jit(f)

    @jax.jit
    def full(images, params, ids, mask, t):
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
        h = jax.nn.relu(linear(params["cls_head"]["fc1"], out.state.x[:, 0, :]))
        return linear(params["cls_head"]["fc2"], h)

    # MED alone on fixed synthetic vision states (the bench post-ViT shape)
    sx = jnp.asarray(rng.randn(2 * batch, 256, 768).astype(np.float32)
                     ).astype(jnp.bfloat16)
    sa = jnp.ones((2 * batch, 256), bool)

    @jax.jit
    def med_only(_im, params, ids, mask, sx, sa, t):
        B = ids.shape[0]
        st0 = TokenState(sx[:B], sa[:B], None)
        st1 = TokenState(sx[B:], sa[B:], None)
        out = M.med_encoder(
            params["text_encoder"], ids, mask, cfg.med,
            mode="multimodal", encoder_state=st0, encoder_state1=st1,
            space_dict=params["space_dict"], temperature=t,
            prune_active=True, capacities=caps_t)
        return out.state.x

    res = {}
    res["full_step_ms"] = timed(full, params16, ids_j, mask_j, t_star)

    A.FUSED_MIN_N = 192
    res["vit_fused_ms"] = timed(make_vit(), params16, t_star)
    A.FUSED_MIN_N = 10_000  # kernel off -> pure XLA scoring attention
    res["vit_xla_ms"] = timed(make_vit(), params16, t_star)
    A.FUSED_MIN_N = 192

    res["med_only_ms"] = timed(med_only, params16, ids_j, mask_j, sx, sa,
                               t_star)

    res["kernel_speedup_vit"] = round(res["vit_xla_ms"] / res["vit_fused_ms"], 3)
    res["med_fraction_of_full"] = round(res["med_only_ms"] / res["full_step_ms"], 3)
    res = {k: round(v, 2) if isinstance(v, float) else v for k, v in res.items()}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
