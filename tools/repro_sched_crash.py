"""Deterministic axon-backend worker crash at one specific NLVR capacity
schedule — measured bisection (2026-08-17, round 3).

Running the full NLVR gather eval step (ViT + MED twin-cross) with the
vision capacity schedule ``(256 x 11, 128)`` (or ``256 x 7, 128 x 5``)
crashes the remote TPU worker ("TPU worker process crashed or restarted",
reproducible 4/4).  The bisection matrix:

| schedule                      | result |
|-------------------------------|--------|
| (384, 384, 256 x 10)  [bench] | ok     |
| (256,) x 12                   | ok     |
| (384, 384, 256 x 9, 128)      | ok     |
| (384, 384, 256 x 5, 128 x 5)  | ok     |
| (384, 256, 128 x 10)  [p=0.7] | ok     |
| (256 x 11, 128)               | CRASH  |
| (256 x 7, 128 x 5)            | CRASH  |
| (256 x 11, 128) ViT only      | ok     |
| (256 x 11, 128) no Pallas attn| ok     |

i.e. the fault needs first-layer-cap 256 AND a 128-cap layer AND the MED
stage attached, and only with the fused scoring-attention kernel enabled —
yet the kernel's invocation shapes in the crashing program are a strict
subset of the green all-256 run's, and `jax.lax.optimization_barrier`
around the kernel outputs does not help.  Conclusion: a whole-program
compile/codegen fault in the backend, not a semantics bug in this repo
(CPU and interpret-mode agree everywhere; every schedule the calibrators
actually produce for p in {0.3, 0.5, 0.7} is green, same session).

Escape hatch if a user schedule ever hits this: ``MADTP_NO_FUSED_ATTN=1``
(pure-XLA scoring attention, correct, ~25% slower at bench shapes).

Run: python tools/repro_sched_crash.py [bench|min|weird|...]
"""
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from madtp_tpu.cli.common import enable_compile_cache

enable_compile_cache()

from __graft_entry__ import _nlvr_setup
from madtp_tpu.core.tree import cast_tree
from madtp_tpu.models import med as M
from madtp_tpu.models.blip import _split_state
from madtp_tpu.models.vit import vit_forward
from madtp_tpu.ops.layers import linear

CAPS = {
    "bench": (384, 384, 256, 256, 256, 256, 256, 256, 256, 256, 256, 256),
    "weird": (256, 256, 256, 256, 256, 256, 256, 128, 128, 128, 128, 128),
    "one128": (384, 384, 256, 256, 256, 256, 256, 256, 256, 256, 256, 128),
    "all256": (256,) * 12,
    "min": (256, 256, 256, 256, 256, 256, 256, 256, 256, 256, 256, 128),
    "tail128": (384, 384, 256, 256, 256, 256, 256, 128, 128, 128, 128, 128),
    "p07": (384, 256, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
}


def main(which: str = "min"):
    caps_v = CAPS[which]
    caps_t = (32,) * 12
    cfg, params, images, ids, mask, _ = _nlvr_setup(image_size=384, B=32,
                                                    text_len=26)
    params16 = cast_tree(params, jnp.bfloat16)
    rng = np.random.RandomState(7)
    im16 = jnp.asarray(
        rng.randn(*images.shape).astype(np.float32)).astype(jnp.bfloat16)
    tj = jnp.float32(3.4785)

    @jax.jit
    def fwd_gather(params, images, ids, mask, t):
        B = ids.shape[0]
        vstate, _, _ = vit_forward(
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
        h = jax.nn.relu(linear(params["cls_head"]["fc1"],
                               out.state.x[:, 0, :]))
        return linear(params["cls_head"]["fc2"], h)

    print("caps", which, caps_v, flush=True)
    t0 = time.perf_counter()
    out = fwd_gather(params16, im16, ids, mask, tj)
    print("ok", float(jnp.sum(out.astype(jnp.float32))),
          f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "min")
