"""On-chip serving-throughput A/B: dynamic batching (row-independent
artifact) vs per-request padded calls (standard batch-coupled artifact).

Many-client serving sends 1-sample requests.  A standard DTP artifact
cannot merge distinct requests (batch-coupled keep counts — see
serve/server.py), so each request pays a full exported-batch device call;
a --row_independent artifact merges whatever is queued into one call.
This measures what that is worth at the device level: concurrent 1-sample
requests through the SAME _ModelRuntime dispatch path used by the HTTP
server (bypassing the wire codec so the 1-core build VM's HTTP overhead
doesn't pollute the device numbers).

Run: python tools/bench_serve_load.py [batch] [n_requests] [image_size]
Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=16, n_requests=32, image_size=384, text_len=26,
         concurrency=16):
    import concurrent.futures

    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _nlvr_setup
    from madtp_tpu.cli.export_serving import _mark_row_independent
    from madtp_tpu.core.tree import cast_tree
    from madtp_tpu.models.blip import blip_nlvr_forward
    from madtp_tpu.serve import save_artifact
    from madtp_tpu.serve.server import ArtifactServer

    cfg, params, images, ids, mask, _ = _nlvr_setup(
        image_size=image_size, B=batch, text_len=text_len)
    params = cast_tree(params, jnp.bfloat16)
    images = images.astype(jnp.bfloat16)
    t = jnp.float32(1.0)

    def fn(params, images, ids, mask, t):
        logits, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True)
        return logits, vk, tk

    def ri_fn(params, images, ids, mask, t):
        logits, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True,
            row_independent=True)
        return logits, vk.T, tk.T

    base_meta = {"task": "nlvr",
                 "batching": {"batch": batch, "inputs": [2, 1, 1, 0],
                              "outputs": [1, 0, 0]}}
    ri_meta = _mark_row_independent(dict(base_meta), [1, 2, 1])

    tmp = tempfile.mkdtemp(prefix="serve_load_")
    std_dir = os.path.join(tmp, "std")
    ri_dir = os.path.join(tmp, "ri")
    print("exporting standard artifact...", file=sys.stderr)
    save_artifact(std_dir, fn, params, (images, ids, mask, t),
                  meta=base_meta)
    print("exporting row-independent artifact...", file=sys.stderr)
    save_artifact(ri_dir, ri_fn, params, (images, ids, mask, t),
                  meta=ri_meta)

    im = np.asarray(images, np.float32)
    idn, mkn = np.asarray(ids), np.asarray(mask)
    tn = np.asarray(t)
    def one_request(rt, j):
        k = j % batch
        imgs = np.stack([im[k], im[batch + k]])
        return rt.predict([imgs.astype(np.float32), idn[k:k + 1],
                           mkn[k:k + 1], tn])

    results = {}
    for name, d in (("standard", std_dir), ("row_independent", ri_dir)):
        srv = ArtifactServer(d, warmup=True)
        rt = srv.default
        # single-request latency (sequential)
        t0 = time.perf_counter()
        one_request(rt, 0)
        lat = time.perf_counter() - t0
        # concurrent load
        with concurrent.futures.ThreadPoolExecutor(concurrency) as ex:
            t0 = time.perf_counter()
            outs = list(ex.map(lambda j: one_request(rt, j),
                               range(n_requests)))
            wall = time.perf_counter() - t0
        assert all(o[0].shape == (1, 2) for o in outs)
        results[name] = {
            "requests_per_s": round(n_requests / wall, 2),
            "wall_s": round(wall, 3),
            "latency_ms_single": round(lat * 1000, 1),
            "device_calls": rt.stats["calls"],
            "merged": rt.stats["merged"],
            "aggregating": rt._aggregate,
        }
        srv.shutdown()
        del srv

    out = {
        "metric": "serving_load_1sample_requests",
        "batch": batch, "n_requests": n_requests,
        "concurrency": concurrency, "image_size": image_size,
        "backend": jax.default_backend(),
        **{f"{k}_{kk}": vv for k, v in results.items()
           for kk, vv in v.items()},
    }
    out["dynamic_batching_speedup"] = round(
        results["row_independent"]["requests_per_s"]
        / results["standard"]["requests_per_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 384
    main(batch=b, n_requests=n, image_size=s)
