"""Same-process on-chip A/B: fused FFN Pallas kernel (MADTP_FUSED_FFN=1)
vs the XLA fc1->gelu->fc2 path.

Two measurements:
1. raw FFN op at the bench tower's shapes (M=B*N tokens, ViT-B widths) —
   isolates the [M, 4D] HBM round trip the kernel removes;
2. the full headline NLVR gather eval step (bench.py's fwd_gather) with the
   dispatch flag on vs off.

Run: python tools/bench_ffn.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from madtp_tpu.cli.common import enable_compile_cache

enable_compile_cache()

from madtp_tpu.ops import layers
from madtp_tpu.ops.pallas.fused_ffn import fused_mlp_2d


def timeit(f, args_list):
    float(jnp.sum(f(*args_list[0])))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*a) for a in args_list]
        float(jnp.sum(outs[-1]))
        best = min(best, (time.perf_counter() - t0) / len(args_list))
    return best * 1000


def micro():
    rng = np.random.RandomState(0)
    M, D, F = 32 * 384, 768, 3072  # bench tower: batch 32 pairs x 384 tokens
    p = {
        "fc1": {"kernel": jnp.asarray(rng.randn(D, F).astype(np.float32) * .02).astype(jnp.bfloat16),
                "bias": jnp.zeros((F,), jnp.bfloat16)},
        "fc2": {"kernel": jnp.asarray(rng.randn(F, D).astype(np.float32) * .02).astype(jnp.bfloat16),
                "bias": jnp.zeros((D,), jnp.bfloat16)},
    }
    xs = [jnp.asarray(rng.randn(M, D).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(8)]

    @jax.jit
    def f_xla(x):
        return layers._mlp_xla(p, x, layers.gelu)

    @jax.jit
    def f_kernel(x):
        return fused_mlp_2d(x, p["fc1"]["kernel"], p["fc1"]["bias"],
                            p["fc2"]["kernel"], p["fc2"]["bias"], act="gelu")

    args = [(x,) for x in xs]
    ms_x = timeit(f_xla, args)
    ms_k = timeit(f_kernel, args)
    a = np.asarray(f_kernel(xs[0]), np.float32)
    b = np.asarray(f_xla(xs[0]), np.float32)
    print(f"raw_ffn M={M} D={D} F={F}  kernel={ms_k:.2f}ms  xla={ms_x:.2f}ms  "
          f"speedup={ms_x / ms_k:.2f}x  max|d|={np.abs(a - b).max():.2e}")
    return ms_k, ms_x


def tower():
    """Full headline eval step A/B (bench.py fwd_gather equivalent)."""
    from __graft_entry__ import _nlvr_setup
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models import med as M
    from madtp_tpu.models.blip import _split_state
    from madtp_tpu.models.vit import vit_forward
    from madtp_tpu.ops.layers import linear

    cfg, params, images, ids, mask, _ = _nlvr_setup(image_size=384, B=32,
                                                    text_len=26)
    params16 = cast_tree(params, jnp.bfloat16)
    rng = np.random.RandomState(7)
    images_list = [
        jnp.asarray(rng.randn(*images.shape).astype(np.float32)).astype(jnp.bfloat16)
        for _ in range(8)
    ]
    # bench.py's measured p=0.5 schedule (BENCH_r03 detail): nearest-128
    # vision caps, text at the 32-slot buffer
    caps_v = (384, 384, 256, 256, 256, 256, 256, 256, 256, 256, 256, 256)
    caps_t = (32,) * 12
    tj = jnp.float32(3.4785)

    def make_step():
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
        return fwd_gather

    f_xla = make_step()
    ms_x = timeit(lambda im: f_xla(params16, im, ids, mask, tj),
                  [(im,) for im in images_list])
    os.environ["MADTP_FUSED_FFN"] = "1"
    f_kernel = make_step()
    ms_k = timeit(lambda im: f_kernel(params16, im, ids, mask, tj),
                  [(im,) for im in images_list])
    del os.environ["MADTP_FUSED_FFN"]
    a = np.asarray(f_kernel(params16, images_list[0], ids, mask, tj), np.float32)
    b = np.asarray(f_xla(params16, images_list[0], ids, mask, tj), np.float32)
    print(f"nlvr_eval_step kernel={ms_k:.2f}ms  xla={ms_x:.2f}ms  "
          f"speedup={ms_x / ms_k:.2f}x  max|d|={np.abs(a - b).max():.2e}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "micro"):
        micro()
    if which in ("both", "tower"):
        tower()
