"""bench.py end-to-end smoke on CPU at tiny dims.

The driver runs ``python bench.py`` on the real chip exactly once, at
round end — this test makes breakage in its pipeline (setup, temperature
bisection, capacity calibration, gather forward, host-transfer probes,
JSON emission) visible in the normal CPU loop instead of only at that
single high-stakes invocation.  Throughput VALUES here are meaningless
(CPU, tiny shapes); only the structure and invariants are asserted.
"""

import json
import sys


def test_bench_main_cpu_smoke(capfd):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import bench

    bench.main(batch=2, iters=2, image_size=64, text_len=8)
    line = [l for l in capfd.readouterr().out.strip().splitlines()
            if l.startswith("{")][-1]
    d = json.loads(line)

    assert d["unit"] == "samples/s"
    assert d["value"] > 0 and d["vs_baseline"] > 0
    det = d["detail"]
    # the bisection must land the analytic GFLOPs near the p=0.5 target
    assert det["gflops_target"] < det["gflops_dense"]
    assert abs(det["gflops_pruned"] - det["gflops_target"]) \
        < 0.25 * det["gflops_target"]
    # one capacity per layer, text caps bounded by the buffer
    assert len(det["capacities_vision"]) == 12
    assert len(det["capacities_text"]) == 12
    assert all(c <= 8 for c in det["capacities_text"])
    assert det["backend"] == "cpu"


def test_run_all_benches_json_parsing():
    """The sweep's stdout parser must handle both single-line JSON
    (bench.py) and the pretty-printed indent=1 JSON of bench_train.py —
    the latter was silently recorded as result=None before r3."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from run_all_benches import last_json_line

    assert last_json_line('log noise\n{"a": 1}\n')["a"] == 1
    multi = "hdr\n" + json.dumps({"x": {"y": 2}, "z": [1, 2]}, indent=1)
    assert last_json_line(multi) == {"x": {"y": 2}, "z": [1, 2]}
    two = json.dumps({"first": 1}) + "\n" + json.dumps({"second": 2},
                                                       indent=1)
    assert last_json_line(two) == {"second": 2}
    assert last_json_line("no json here") is None
