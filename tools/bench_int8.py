"""On-chip probe: does the int8 MXU path pay on this backend?

TPU v5e-class chips advertise ~2x int8 TOPS over bf16 FLOPs (394 vs 197
peak).  Whether a quantized serving tier is worth building depends on what
XLA actually delivers for ``lax.dot_general`` on s8 x s8 -> s32 at this
framework's shapes, INCLUDING the requant/dequant VPU work a real
quantized linear must pay.  This probe measures three rungs:

1. ``raw``   — big square matmul chains (dispatch-amortized): bf16 vs int8
               with a cheap shift requant between links.  Upper bound.
2. ``ffn``   — a realistic W8A8 dynamically-quantized FFN at the bench
               tower's shapes (per-row activation scales computed on the
               fly, per-column int8 weights, s32 -> bf16 dequant, gelu in
               bf16) vs the bf16 fc1->gelu->fc2 it would replace.
3. ``wonly`` — weight-only int8 (bf16 activations, weights dequantized
               in-graph): no MXU speedup expected; measures whether the
               halved weight HBM traffic shows up at eval batch sizes.

Run: python tools/bench_int8.py [raw|ffn|wonly|all]
Prints one human line per measurement + a final JSON summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from madtp_tpu.cli.common import enable_compile_cache

enable_compile_cache()


def timeit(f, args_list, reps=3):
    float(jnp.sum(f(*args_list[0]).astype(jnp.float32)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [f(*a) for a in args_list]
        float(jnp.sum(outs[-1].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / len(args_list))
    return best * 1000


def raw(n=4096, links=8, loops=4):
    """Chained square matmuls; requant between links is a shift (int8) or a
    clip (bf16) so the chain stays in-dtype.  Effective rate ~= MXU rate.
    Weights are ARGUMENTS (never close over arrays in jit on this backend —
    constants upload to the remote compile service, CLAUDE.md)."""
    rng = np.random.RandomState(0)
    w8 = [jnp.asarray(rng.randint(-8, 8, (n, n), dtype=np.int8))
          for _ in range(links)]
    w16 = [jnp.asarray((rng.randn(n, n) * 0.02).astype(np.float32)
                       ).astype(jnp.bfloat16) for _ in range(links)]

    @jax.jit
    def chain8(x, ws):
        for _ in range(loops):
            for w in ws:
                y = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                x = jax.lax.shift_right_arithmetic(y, 10).astype(jnp.int8)
        return x

    @jax.jit
    def chain16(x, ws):
        for _ in range(loops):
            for w in ws:
                x = jnp.clip(x @ w, -3, 3)
        return x

    xs8 = [jnp.asarray(rng.randint(-8, 8, (n, n), dtype=np.int8))
           for _ in range(4)]
    xs16 = [jnp.asarray((rng.randn(n, n) * 0.1).astype(np.float32)
                        ).astype(jnp.bfloat16) for _ in range(4)]
    links = links * loops  # effective links per call
    ms8 = timeit(chain8, [(x, w8) for x in xs8])
    ms16 = timeit(chain16, [(x, w16) for x in xs16])
    ops = 2.0 * n * n * n * links
    t8, t16 = ops / (ms8 / 1e3) / 1e12, ops / (ms16 / 1e3) / 1e12
    print(f"raw n={n} links={links}: int8 {ms8:.2f}ms ({t8:.1f} TOPS)  "
          f"bf16 {ms16:.2f}ms ({t16:.1f} TFLOP/s)  ratio={ms16 / ms8:.2f}x")
    return {"raw_int8_tops": round(t8, 1), "raw_bf16_tflops": round(t16, 1),
            "raw_ratio": round(ms16 / ms8, 2)}


def _quant_rows(x):
    """Dynamic per-row symmetric quant: bf16 [M,K] -> int8 + fp32 scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quant_cols_np(w, rng_unused=None):
    """Static per-output-column weight quant (numpy, load-time)."""
    w = np.asarray(w, np.float32)
    amax = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-6)
    scale = amax / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def ffn(M=32 * 384, D=768, F=3072):
    """W8A8 dynamic-quant FFN vs bf16 FFN at the bench tower's shapes."""
    rng = np.random.RandomState(0)
    w1 = (rng.randn(D, F) * 0.02).astype(np.float32)
    w2 = (rng.randn(F, D) * 0.02).astype(np.float32)
    b1 = np.zeros((F,), np.float32)
    b2 = np.zeros((D,), np.float32)
    q1, s1 = _quant_cols_np(w1)
    q2, s2 = _quant_cols_np(w2)
    w1j, w2j = jnp.asarray(w1).astype(jnp.bfloat16), jnp.asarray(w2).astype(jnp.bfloat16)
    b1j, b2j = jnp.asarray(b1).astype(jnp.bfloat16), jnp.asarray(b2).astype(jnp.bfloat16)
    q1j, s1j, q2j, s2j = map(jnp.asarray, (q1, s1, q2, s2))

    b1j2, b2j2 = jnp.asarray(b1), jnp.asarray(b2)

    @jax.jit
    def f16(x, w1j, b1j, w2j, b2j):
        h = jax.nn.gelu(x @ w1j + b1j)
        return h @ w2j + b2j

    @jax.jit
    def f8(x, q1j, s1j, q2j, s2j, b1, b2):
        xq, sx = _quant_rows(x)
        y = jax.lax.dot_general(xq, q1j, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        h = jax.nn.gelu((y.astype(jnp.float32) * (sx * s1j) + b1)
                        .astype(jnp.bfloat16))
        hq, sh = _quant_rows(h)
        y2 = jax.lax.dot_general(hq, q2j, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        return (y2.astype(jnp.float32) * (sh * s2j) + b2).astype(jnp.bfloat16)

    xs = [jnp.asarray((rng.randn(M, D) * 0.5).astype(np.float32)
                      ).astype(jnp.bfloat16) for _ in range(8)]
    a16 = (w1j, b1j, w2j, b2j)
    a8 = (q1j, s1j, q2j, s2j, b1j2, b2j2)
    ms16 = timeit(f16, [(x,) + a16 for x in xs])
    ms8 = timeit(f8, [(x,) + a8 for x in xs])
    a = np.asarray(f8(xs[0], *a8), np.float32)
    b = np.asarray(f16(xs[0], *a16), np.float32)
    rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
    print(f"ffn M={M} D={D} F={F}: w8a8 {ms8:.2f}ms  bf16 {ms16:.2f}ms  "
          f"speedup={ms16 / ms8:.2f}x  rel|d|max={rel:.3f}")
    return {"ffn_w8a8_ms": round(ms8, 2), "ffn_bf16_ms": round(ms16, 2),
            "ffn_speedup": round(ms16 / ms8, 2), "ffn_rel_err": round(float(rel), 4)}


def wonly(M=32 * 384, D=768, F=3072):
    """Weight-only int8: dequant w in-graph, matmul in bf16."""
    rng = np.random.RandomState(0)
    w1 = (rng.randn(D, F) * 0.02).astype(np.float32)
    q1, s1 = _quant_cols_np(w1)
    w1j = jnp.asarray(w1).astype(jnp.bfloat16)
    q1j, s1j = jnp.asarray(q1), jnp.asarray(s1)

    @jax.jit
    def f16(x, w1j):
        return x @ w1j

    @jax.jit
    def f8(x, q1j, s1j):
        w = (q1j.astype(jnp.bfloat16) * s1j.astype(jnp.bfloat16))
        return x @ w

    xs = [jnp.asarray((rng.randn(M, D) * 0.5).astype(np.float32)
                      ).astype(jnp.bfloat16) for _ in range(8)]
    ms16 = timeit(f16, [(x, w1j) for x in xs])
    ms8 = timeit(f8, [(x, q1j, s1j) for x in xs])
    print(f"wonly M={M} D={D} F={F}: int8-w {ms8:.2f}ms  bf16 {ms16:.2f}ms  "
          f"ratio={ms16 / ms8:.2f}x")
    return {"wonly_ms": round(ms8, 2), "wonly_bf16_ms": round(ms16, 2)}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {"backend": jax.default_backend()}
    if which in ("all", "raw"):
        out.update(raw())
    if which in ("all", "ffn"):
        out.update(ffn())
    if which in ("all", "wonly"):
        out.update(wonly())
    print(json.dumps(out))
