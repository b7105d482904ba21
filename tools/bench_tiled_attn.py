"""On-chip A/B for the query-tiled large-N scoring kernel (VERDICT r2 #6).

Above N=1536 (padded) the full fused kernel's [N,N] fp32 VMEM scratch no
longer fits the budget; before round 3 those shapes silently fell back to
pure XLA.  This tool measures the tiled kernel
(ops/pallas/fused_attention.fused_attention_scores_tiled) against that XLA
fallback at a large-image shape — the default 1601 tokens is a 640px
ViT-B/16 image, padded here to the 512-lane tile (N=2048) exactly as the
production wrapper (ops/attention._fused_forward) pads, with the padding
slots dead-masked — and cross-checks all three outputs (out, col, cls).

Run: python tools/bench_tiled_attn.py [tokens] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(tokens=1601, B=8, H=12, Dh=64, reps=5):
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from madtp_tpu.ops.attention import _xla_attention_scores
    from madtp_tpu.ops.pallas.fused_attention import (
        fused_attention_scores_tiled)

    N = ((tokens + 511) // 512) * 512  # production tile padding
    rng = np.random.RandomState(0)
    scale = Dh ** -0.5
    q, k, v = (jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32),
                           dtype=jnp.bfloat16) for _ in range(3))
    alive = np.ones((B, N), bool)
    alive[:, tokens:] = False  # padding slots are dead
    alive = jnp.asarray(alive)
    bias = jnp.zeros((B, N), jnp.float32)

    qt, kt, vt = (x.transpose(0, 1, 3, 2) for x in (q, k, v))

    @jax.jit
    def run_tiled(q_, k_, v_, alive_, bias_):
        return fused_attention_scores_tiled(
            q_, k_, v_, alive_, bias_, num_heads=H, scale=scale, tile_q=512)

    @jax.jit
    def run_xla(q_, k_, v_, alive_, bias_):
        return _xla_attention_scores(q_, k_, v_, alive_, bias_, scale)

    # correctness first: kernel vs XLA on the same operands
    # (kernel returns (out, col, cls); _xla_attention_scores returns
    # (out, cls, col) — mind the order)
    o_t, c_t, l_t = run_tiled(qt, kt, vt, alive, bias)
    o_x, l_x, c_x = run_xla(q, k, v, alive, bias)
    o_t = np.asarray(o_t, np.float32).transpose(0, 3, 1, 2).reshape(
        B, N, H * Dh)
    d_out = float(np.max(np.abs(o_t - np.asarray(o_x, np.float32))))
    d_col = float(np.max(np.abs(np.asarray(c_t)[:, 1:]
                                - np.asarray(c_x, np.float32))))
    d_cls = float(np.max(np.abs(np.asarray(l_t)[:, 1:]
                                - np.asarray(l_x, np.float32))))
    print(f"max|d| out={d_out:.2e} col={d_col:.2e} cls={d_cls:.2e}")
    assert d_out < 5e-2 and d_col < 5e-3 and d_cls < 5e-3, (
        "tiled kernel disagrees with XLA")

    def timeit(fn, *args):
        fn(*args)  # warm
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for i in range(10):
                r = fn(*args)
            _ = float(jnp.sum(r[1]))  # host readback to force completion
            best.append((time.perf_counter() - t0) / 10)
        return min(best) * 1e3

    ms_tiled = timeit(run_tiled, qt, kt, vt, alive, bias)
    ms_xla = timeit(run_xla, q, k, v, alive, bias)
    print(f"tokens={tokens} N={N} B={B} H={H} Dh={Dh} bf16:"
          f"  tiled={ms_tiled:.2f}ms  xla={ms_xla:.2f}ms"
          f"  speedup={ms_xla / ms_tiled:.2f}x")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
