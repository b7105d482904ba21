"""Same-process on-chip A/B: one ITM rerank step with vs without the fused
cross-attention kernel (ops/pallas/cross_attention.py).

Round-3 measured finding (recorded in the kernel's dispatch gate,
ops/attention.py:_cross_fused_eligible): at the rerank shapes
(k=32 x H=12, Nq=40, S=384, bf16) XLA wins — 9.4 ms vs the kernel's
11.7 ms — because 40-row matmuls underutilize the MXU per-(b,h) program
while XLA batches them.  The kernel therefore ships OPT-IN
(MADTP_FUSED_CROSS=1) for long-memory regimes.  Re-run this after any
change to the dispatch heuristics.

Run: python tools/bench_cross_attn.py
"""
import os, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from madtp_tpu.cli.common import enable_compile_cache
enable_compile_cache()
from madtp_tpu.cli.common import build_blip_cfg, init_blip_params
from madtp_tpu.core.tree import cast_tree
from madtp_tpu.models.blip import blip_itm_score
from madtp_tpu.prune.dtp import TokenState

cfg = build_blip_cfg({"vit": "base"}, 384)
import dataclasses
cfg = cfg._replace(med=dataclasses.replace(cfg.med, twin_cross=False))
params = cast_tree(init_blip_params(cfg, 0, heads=("retrieval",)), jnp.bfloat16)
rng = np.random.RandomState(3)
k, S, Lt = 32, 384, 35
ids = jnp.asarray(rng.randint(1, 30000, (k, Lt)))
mask = jnp.ones((k, Lt), jnp.int32)
sx = jnp.asarray(rng.randn(k, S, 768).astype(np.float32)).astype(jnp.bfloat16)
alive = np.ones((k, S), bool); alive[:, 300:] = False
st = TokenState(sx, jnp.asarray(alive), None)

def make(tag):
    @jax.jit
    def f(params, ids, mask, sx, alive):
        return blip_itm_score(params, ids, mask, TokenState(sx, alive, None),
                              cfg, temperature=jnp.float32(0.0),
                              prune_active=False)
    return f

def timeit(f):
    float(jnp.sum(f(params, ids, mask, sx, st.alive)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(params, ids, mask, sx, st.alive) for _ in range(8)]
        float(jnp.sum(outs[-1]))
        best = min(best, (time.perf_counter() - t0) / 8)
    return best * 1000

os.environ["MADTP_FUSED_CROSS"] = "1"
f_kernel = make("a")
ms_kernel = timeit(f_kernel)
del os.environ["MADTP_FUSED_CROSS"]
f_xla = make("b")
ms_xla = timeit(f_xla)
# agreement check
a = np.asarray(f_kernel(params, ids, mask, sx, st.alive), np.float32)
b = np.asarray(f_xla(params, ids, mask, sx, st.alive), np.float32)
print(f"itm_step kernel={ms_kernel:.2f}ms  xla={ms_xla:.2f}ms  "
      f"speedup={ms_xla/ms_kernel:.2f}x  max|d|={np.abs(a-b).max():.2e}")
