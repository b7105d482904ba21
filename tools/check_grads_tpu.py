"""On-chip gradient agreement: the fused Pallas BACKWARD
(ops/pallas/fused_attention.fused_attention_scores_bwd) vs the XLA-VJP
path, through a full NLVR compression loss at a size that engages the
kernel (224px -> 197 tokens >= FUSED_MIN_N).

Round-3 measurement: max|d| = 1.8e-5.  Run after any change to the
scoring-attention kernels.

Run: python tools/check_grads_tpu.py
"""
import os, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from madtp_tpu.cli.common import enable_compile_cache
enable_compile_cache()
from __graft_entry__ import _nlvr_setup
from madtp_tpu.models.blip import blip_nlvr_forward

cfg, params, images, ids, mask, targets = _nlvr_setup(
    image_size=224, B=2, text_len=12)  # 197 tokens -> kernel engages

def loss_fn(params, images, ids, mask, targets, t):
    lo, lf, _ = blip_nlvr_forward(params, images, ids, mask, cfg,
                                  temperature=t, prune_active=True,
                                  train=True, targets=targets)
    return lo + 0.1 * lf

def grads(tag):
    @jax.jit
    def g(params, images, ids, mask, targets, t):
        return jax.grad(loss_fn)(params, images, ids, mask, targets, t)
    out = g(params, images, ids, mask, targets, jnp.float32(1.0))
    return [np.asarray(l, np.float32) for l in jax.tree_util.tree_leaves(out)]

gf = grads("fused")
os.environ["MADTP_NO_FUSED_BWD"] = "1"
gx = grads("xla")
maxd = max(float(np.abs(a - b).max()) for a, b in zip(gf, gx))
rel = max(float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))
          for a, b in zip(gf, gx))
print(f"ON-CHIP grad agreement fused vs XLA: max|d|={maxd:.3e} max_rel={rel:.3e}")
assert maxd < 2e-3 and rel < 5e-3, (maxd, rel)
print("PASS")
