"""Export every task family's serving artifact ON the TPU backend and smoke
each one from a fresh process.

Completes the on-chip serving proof beyond the NLVR A/B
(tools/bench_serve.py): caption (jitted beam search), vqa (rank), retrieval
(ITC towers + ITM rerank) and clip (dual towers) artifacts are exported at
base scale on the real backend — Mosaic custom calls embedded — then loaded
by a process that imports no model code and called once on zero inputs
built from each artifact's recorded meta['inputs'] spec.  Phases run
sequentially in bounded subprocesses (one TPU process at a time).

    python tools/export_all_onchip.py [--root /tmp/madtp_artifacts]

Prints one JSON line: per-task export/serve wall seconds and output specs.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (task, extra CLI args, artifact subdirs to smoke -- "" = the dir itself)
TASKS = [
    ("caption", ["--config", "configs/caption_coco.yaml", "--batch", "16"],
     [""]),
    ("vqa", ["--config", "configs/vqa.yaml", "--batch", "16"], [""]),
    ("retrieval", ["--config", "configs/retrieval_flickr.yaml",
                   "--batch", "16"],
     ["image_encoder", "text_encoder", "itm_rerank"]),
    ("clip", ["--config", "configs/retrieval_flickr_clip.yaml",
              "--batch", "16"],
     ["image_encoder", "text_encoder"]),
]

SMOKE = r"""
import sys; sys.path.insert(0, {repo!r})
import numpy as np, jax
from madtp_tpu.serve import load_artifact
from madtp_tpu.serve.server import _flat_input_specs, _np_dtype

m = load_artifact({art!r})
ins = [np.zeros(s, _np_dtype(d))
       for s, d in _flat_input_specs(m.meta["inputs"])]
out = m(*ins)
leaves = jax.tree.leaves(out)
print("SMOKE_OK", jax.default_backend(),
      [(tuple(np.shape(o)), str(np.asarray(o).dtype)) for o in leaves],
      flush=True)
"""


def _run(argv_or_code, timeout, *, code=False):
    cmd = [sys.executable, "-c", argv_or_code] if code else argv_or_code
    r = subprocess.run(cmd, timeout=timeout, capture_output=True, cwd=REPO)
    out = r.stdout.decode() + r.stderr.decode()
    if r.returncode != 0:
        raise RuntimeError(f"rc={r.returncode}:\n{out[-3000:]}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/madtp_artifacts")
    ap.add_argument("--timeout", default=3000, type=int)
    ap.add_argument("--tasks", default="",
                    help="comma list; default: caption,vqa,retrieval,clip")
    args = ap.parse_args()
    only = set(s for s in args.tasks.split(",") if s)

    results = {}
    for task, extra, subdirs in TASKS:
        if only and task not in only:
            continue
        out_dir = os.path.join(args.root, task)
        t0 = time.time()
        try:
            _run([sys.executable, "-m", "madtp_tpu.cli.export_serving",
                  "--task", task, "--output_dir", out_dir] + extra,
                 args.timeout)
            entry = {"export_s": round(time.time() - t0, 1), "serves": {}}
            for sub in subdirs:
                art = os.path.join(out_dir, sub) if sub else out_dir
                t1 = time.time()
                out = _run(SMOKE.format(repo=REPO, art=art),
                           args.timeout, code=True)
                line = [l for l in out.splitlines()
                        if l.startswith("SMOKE_OK")][-1]
                entry["serves"][sub or "."] = {
                    "wall_s": round(time.time() - t1, 1),
                    "detail": line[len("SMOKE_OK "):],
                }
        except (RuntimeError, subprocess.TimeoutExpired) as e:
            entry = {"error": str(e)[-1500:],
                     "wall_s": round(time.time() - t0, 1)}
        results[task] = entry
        print(f"[{task}] {json.dumps(entry)[:400]}", file=sys.stderr,
              flush=True)

    ok = all("error" not in v for v in results.values())
    print(json.dumps({"metric": "serving_exports_onchip",
                      "value": sum("error" not in v for v in results.values()),
                      "unit": "tasks",
                      "ok": ok, "detail": results}))


if __name__ == "__main__":
    main()
