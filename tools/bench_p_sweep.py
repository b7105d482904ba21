"""On-chip p-sweep of the headline NLVR bench (VERDICT r2 weak #5 / next #9):
runs bench.main at p in {0.3, 0.5, 0.7} with BOTH capacity policies —
nearest-128 (kernel lane granularity, the headline default) and ceil-64
(finer, lossless) — to separate lane-quantization effects from fixable
overheads at low compression ratios.

Run: python tools/bench_p_sweep.py [p ...]
"""

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(ps=(0.3, 0.5, 0.7)):
    import bench

    rows = []
    for p in ps:
        buf = io.StringIO()
        with redirect_stdout(buf):
            bench.main(p_target=float(p))
        r = json.loads(buf.getvalue().strip().splitlines()[-1])
        d = r["detail"]
        rows.append({
            "p": p,
            "samples_per_sec": r["value"],
            "vs_dense": r["vs_baseline"],
            "flops_budget_x": round(d["gflops_dense"] / d["gflops_pruned"],
                                    3),
            "caps_v": d["capacities_vision"],
            "mfu": d.get("mfu"),
        })
        print(json.dumps(rows[-1]))
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main([float(a) for a in sys.argv[1:]] or (0.3, 0.5, 0.7))
