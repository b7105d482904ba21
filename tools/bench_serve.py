"""On-chip serving A/B: jax.export artifact vs live-jitted eval step.

Proves the serving stack on real hardware (VERDICT r3 weak item 2): the
NLVR artifact is exported ON the TPU backend (Mosaic custom calls embedded),
loaded in a FRESH process that imports no model code, and timed against the
live jitted step from the research stack.  Phases run in sequential
subprocesses — only one process touches the TPU at a time (CLAUDE.md).

    python tools/bench_serve.py [--batch 32] [--iters 30] [--fast_eval]

Prints one JSON line:
    {"metric": "nlvr2_serve_artifact_ms", "value": ..., "detail": {...}}

Timing uses the repo's chip-noise discipline: pipeline ``iters`` distinct
batches, one readback at the end (block_until_ready is unreliable on this
backend), repeated 3x, median per side.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPORT_AND_LIVE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
from madtp_tpu.cli.common import enable_compile_cache
enable_compile_cache()
from __graft_entry__ import _nlvr_setup
from madtp_tpu.core.tree import cast_tree
from madtp_tpu.tasks.nlvr import make_eval_step
from madtp_tpu.serve import save_artifact

B, iters, reps = {batch}, {iters}, 3
caps_v = {caps_v}
caps_t = {caps_t}
cfg, params, images, ids, mask, _ = _nlvr_setup(image_size=384, B=B,
                                                text_len=26)
params = cast_tree(params, jnp.bfloat16)
images = images.astype(jnp.bfloat16)  # matched-bf16 like bench.py
rng = np.random.RandomState(7)
t = jnp.float32(3.4785)
step = make_eval_step(cfg, True, caps_v, caps_t)

# export ON the TPU backend: the artifact embeds the Mosaic custom calls
art = {art_dir!r}
save_artifact(art, step, params, (images, ids, mask, t),
              meta={{"task": "nlvr", "mode": "gather" if caps_v else "mask"}})
print("EXPORT_BACKEND", jax.default_backend(), flush=True)

# live-jit timing: pipeline iters distinct batches, one readback
batches = [jnp.asarray(rng.randn(*images.shape).astype(np.float32)
                       ).astype(jnp.bfloat16) for _ in range(iters)]
_ = float(jnp.sum(step(params, batches[0], ids, mask, t)[0].astype(
    jnp.float32)))  # compile + warm
times = []
for _ in range(reps):
    t0 = time.perf_counter()
    outs = [step(params, b, ids, mask, t)[0] for b in batches]
    acc = float(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
    times.append((time.perf_counter() - t0) / iters * 1000)
times.sort()
print("LIVE_MS", times[len(times)//2], flush=True)
np.savez({inputs_npz!r},
         images=np.asarray(images, np.float32),  # re-cast to bf16 at load
         ids=np.asarray(ids), mask=np.asarray(mask))
# cross-check: artifact output == live output on the same batch (ints +
# bf16 logits match bit-for-bit when the graphs agree)
from madtp_tpu.serve import load_artifact
m = load_artifact(art)
a_out = m(batches[0], ids, mask, t)
l_out = step(params, batches[0], ids, mask, t)
for a, l in zip(a_out, l_out):
    assert np.array_equal(np.asarray(a), np.asarray(l)), "artifact != live"
print("PARITY ok", flush=True)
"""

SERVE_FRESH = r"""
import sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
# a serving process needs ONLY the artifact loader — no model code, no
# config/tokenizer stack (madtp_tpu.serve imports just jax + the npz reader)
from madtp_tpu.serve import load_artifact

iters, reps = {iters}, 3
model = load_artifact({art_dir!r})
z = np.load({inputs_npz!r})
images = jnp.asarray(z["images"]).astype(jnp.bfloat16)
ids, mask = jnp.asarray(z["ids"]), jnp.asarray(z["mask"])
t = jnp.float32(3.4785)
rng = np.random.RandomState(7)
batches = [jnp.asarray(rng.randn(*images.shape).astype(np.float32)
                       ).astype(jnp.bfloat16) for _ in range(iters)]
_ = float(jnp.sum(model(batches[0], ids, mask, t)[0].astype(jnp.float32)))
times = []
for _ in range(reps):
    t0 = time.perf_counter()
    outs = [model(b, ids, mask, t)[0] for b in batches]
    acc = float(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
    times.append((time.perf_counter() - t0) / iters * 1000)
times.sort()
print("SERVE_BACKEND", jax.default_backend(), flush=True)
print("ARTIFACT_MS", times[len(times)//2], flush=True)
"""


def _run(code: str, timeout: int) -> str:
    r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                       capture_output=True, cwd=REPO)
    out = r.stdout.decode() + r.stderr.decode()
    if r.returncode != 0:
        raise RuntimeError(f"phase failed (rc={r.returncode}):\n{out[-3000:]}")
    return out


def _grab(out: str, key: str) -> str:
    return [l for l in out.splitlines() if l.startswith(key)][-1].split()[1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=32, type=int)
    p.add_argument("--iters", default=30, type=int)
    p.add_argument("--fast_eval", action="store_true",
                   help="gather mode at the chip-calibrated p=0.5 schedule "
                        "(default: exact mask mode)")
    p.add_argument("--timeout", default=1800, type=int)
    args = p.parse_args()

    caps_v = ((384, 384) + (256,) * 10) if args.fast_eval else None
    caps_t = ((32,) * 12) if args.fast_eval else None

    tmp = tempfile.mkdtemp(prefix="madtp_serve_")
    art_dir = os.path.join(tmp, "nlvr_artifact")
    inputs_npz = os.path.join(tmp, "inputs.npz")

    out1 = _run(EXPORT_AND_LIVE.format(
        repo=REPO, batch=args.batch, iters=args.iters, caps_v=caps_v,
        caps_t=caps_t, art_dir=art_dir, inputs_npz=inputs_npz), args.timeout)
    live_ms = float(_grab(out1, "LIVE_MS"))
    export_backend = _grab(out1, "EXPORT_BACKEND")

    out2 = _run(SERVE_FRESH.format(
        repo=REPO, iters=args.iters, art_dir=art_dir,
        inputs_npz=inputs_npz), args.timeout)
    art_ms = float(_grab(out2, "ARTIFACT_MS"))
    serve_backend = _grab(out2, "SERVE_BACKEND")

    print(json.dumps({
        "metric": "nlvr2_serve_artifact_ms",
        "value": round(art_ms, 2),
        "unit": "ms/batch",
        "vs_baseline": round(live_ms / art_ms, 3),
        "detail": {
            "live_jit_ms": round(live_ms, 2),
            "batch": args.batch,
            "mode": "gather" if args.fast_eval else "mask",
            "export_backend": export_backend,
            "serve_backend": serve_backend,
            "artifact": art_dir,
            "samples_per_sec_artifact": round(args.batch / art_ms * 1000, 1),
        },
    }))


if __name__ == "__main__":
    main()
