"""One-command on-chip bench refresh.

Runs the headline bench plus every per-task tool bench SEQUENTIALLY (the
tunneled chip serves one process at a time — CLAUDE.md), each in its own
subprocess with a hard timeout, and writes one combined JSON to stdout
and ``--out`` (default /tmp/all_benches.json).  A bench that fails or
times out is recorded with its rc and stderr tail instead of aborting the
sweep — the chip/tunnel is noisy and a single flaky run must not cost the
whole refresh.

Usage:  python tools/run_all_benches.py [--quick] [--out PATH]
  --quick runs only bench.py + the three cheapest task benches.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # for `from bench import _backend_reachable`

# (name, argv, timeout_s) — ordered cheapest-first so a mid-sweep outage
# still yields the headline number
BENCHES = [
    ("nlvr_headline", [sys.executable, "bench.py"], 1800),
    # train: batch-16 default (r5) times 8 variants + probe — needs more
    # headroom than the others when the compile cache is cold
    ("train", [sys.executable, "tools/bench_train.py"], 2700),
    ("serve", [sys.executable, "tools/bench_serve.py"], 2400),
    ("vqa", [sys.executable, "tools/bench_vqa.py"], 1800),
    ("caption", [sys.executable, "tools/bench_caption.py"], 1800),
    ("retrieval", [sys.executable, "tools/bench_retrieval.py"], 2400),
    ("clip", [sys.executable, "tools/bench_clip.py"], 2400),
    ("p_sweep", [sys.executable, "tools/bench_p_sweep.py"], 3600),
    ("batch_sweep", [sys.executable, "tools/bench_batch_sweep.py"], 3600),
]
QUICK = {"nlvr_headline", "train", "vqa", "caption"}


def last_json_line(text: str):
    """Last JSON object printed to stdout.  Handles both single-line
    (bench.py) and pretty-printed multi-line (bench_train.py prints with
    indent=1) output: from every line that starts a '{', try to decode a
    complete object running through the following lines."""
    lines = text.strip().splitlines()
    dec = json.JSONDecoder()
    found = None
    i = 0
    while i < len(lines):
        line = lines[i]
        if not line.lstrip().startswith("{"):
            i += 1
            continue
        chunk = "\n".join(lines[i:])
        start = chunk.index("{")
        try:
            obj, end = dec.raw_decode(chunk[start:])
        except json.JSONDecodeError:
            i += 1
            continue
        if isinstance(obj, dict):
            found = obj
        # skip every line the decode consumed — inner '{'-starting lines
        # (arrays of dicts in pretty-printed output) are not candidates
        i += chunk[: start + end].count("\n") + 1
    return found


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="/tmp/all_benches.json")
    args = ap.parse_args()

    results = {}
    for name, argv, timeout_s in BENCHES:
        if args.quick and name not in QUICK:
            continue
        t0 = time.time()
        try:
            r = subprocess.run(argv, cwd=REPO, timeout=timeout_s,
                               capture_output=True, text=True)
            entry = {
                "rc": r.returncode,
                "wall_s": round(time.time() - t0, 1),
                "result": last_json_line(r.stdout),
            }
            if r.returncode != 0 or entry["result"] is None:
                entry["stderr_tail"] = r.stderr[-800:]
        except subprocess.TimeoutExpired:
            entry = {"rc": None, "wall_s": round(time.time() - t0, 1),
                     "result": None, "stderr_tail": "TIMEOUT"}
        results[name] = entry
        is_last = name == [n for n, _, _ in BENCHES
                           if not args.quick or n in QUICK][-1]
        if entry["rc"] != 0 and not is_last:
            # A killed/crashed TPU process can hold the chip claim for ~a
            # minute (CLAUDE.md); probe before launching the next bench so
            # one timeout doesn't cascade into spurious failures down the
            # sweep.  (Skipped after the final bench — nothing to protect.)
            from bench import _backend_reachable

            t0 = time.time()
            ok = _backend_reachable(attempts=3, probe_timeout=240)
            entry["cooldown_s"] = round(time.time() - t0, 1)
            if not ok:
                print("[sweep] backend unreachable after cooldown probes; "
                      "continuing (remaining benches will fail fast)",
                      file=sys.stderr, flush=True)
        print(f"[{name}] rc={entry['rc']} {entry['wall_s']}s "
              f"{json.dumps(entry['result'])[:160] if entry['result'] else entry.get('stderr_tail', '')[:160]}",
              file=sys.stderr, flush=True)

    # headline summary: eval throughput + the train-side number (half of
    # round 3's wins were training; the sweep surfaces both at a glance)
    hl = (results.get("nlvr_headline", {}).get("result") or {})
    tr = (results.get("train", {}).get("result") or {})
    summary = {
        "eval_samples_per_sec": hl.get("value"),
        "eval_vs_dense": hl.get("vs_baseline"),
        "train_samples_per_sec_gather": tr.get("train_samples_per_sec_gather"),
        "train_mfu_gather": tr.get("train_mfu_gather"),
        "train_gather_vs_dense": tr.get("gather_speedup_vs_dense"),
        "train_samples_per_sec_gather_amp":
            tr.get("train_samples_per_sec_gather_amp"),
        "train_mfu_gather_amp": tr.get("train_mfu_gather_amp"),
        "train_gather_amp_vs_dense_amp":
            tr.get("gather_amp_speedup_vs_dense_amp"),
    }
    print(f"[sweep summary] {json.dumps(summary)}", file=sys.stderr,
          flush=True)
    results["_summary"] = summary
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
