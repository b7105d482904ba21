"""Profiling / model-report utilities (reference ``utils.py:283-391``
``print_params_and_flops`` + MetricLogger's cuda max-mem probe).

* :func:`print_params_and_flops` — param counts per subtree + analytic
  GFLOPs for the task's canned input sizes, replacing the fvcore trace;
* :func:`trace` — context manager around ``jax.profiler`` (XPlane dumps for
  TensorBoard / xprof), the structured-tracing capability the reference
  lacks entirely (SURVEY.md §5);
* :func:`device_memory_stats` — per-device HBM stats (the
  ``torch.cuda.max_memory_allocated`` analogue).
"""

from __future__ import annotations

import contextlib
from typing import Dict

import numpy as np


def tree_param_counts(params) -> Dict[str, int]:
    import jax

    out = {}
    for key, sub in params.items():
        out[key] = sum(int(np.prod(x.shape))
                       for x in jax.tree_util.tree_leaves(sub))
    out["TOTAL"] = sum(out.values())
    return out


def print_params_and_flops(task: str, cfg, *, text_len: int = 26,
                           print_fn=print) -> float:
    """Startup report: per-module params + unpruned GFLOPs for the task's
    canned shapes (reference utils.py:283-391 used fvcore traces)."""
    from madtp_tpu.prune import flops as F

    if task == "nlvr":
        g = F.nlvr_gflops(cfg.vit, cfg.med,
                          [cfg.vit.num_patches] * cfg.vit.depth,
                          [text_len - 1] * cfg.med.num_hidden_layers, text_len)
    elif task == "caption":
        g = F.caption_gflops(cfg.vit, cfg.med,
                             [cfg.vit.num_patches] * cfg.vit.depth, 14)
    elif task == "vqa":
        g = F.vqa_gflops(cfg.vit, cfg.med,
                         [cfg.vit.num_patches] * cfg.vit.depth,
                         [text_len - 1] * cfg.med.num_hidden_layers, text_len)
    elif task == "retrieval":
        g = F.retrieval_gflops(cfg.vit, cfg.med,
                               [cfg.vit.num_patches] * cfg.vit.depth,
                               [34] * cfg.med.num_hidden_layers, 35)
    elif task == "retrieval_clip":
        g = F.clip_gflops(cfg, [cfg.vision_num_patches] * cfg.vision_layers,
                          [cfg.context_length - 1] * cfg.transformer_layers)
    else:
        raise ValueError(task)
    print_fn(f"[{task}] unpruned compute: {g:.2f} GFLOPs (analytic, "
             f"fvcore-MAC convention)")
    return g


@contextlib.contextmanager
def trace(logdir: str = "/tmp/madtp_trace"):
    """``with trace('/tmp/t'):`` around any device work -> TensorBoard-
    compatible profile."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    import jax

    dev = jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    return {
        "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 2**20,
        "peak_bytes_in_use_mb": stats.get("peak_bytes_in_use", 0) / 2**20,
    }
