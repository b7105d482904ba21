"""Capacity-schedule calibration for gather-mode DTP.

The reference's physical sequence length per layer is data-dependent (batch-max
keep count).  On TPU the gather path needs *static* per-layer capacities; this
module derives them from mask-mode statistics: run a few batches in mask mode,
record per-layer kept counts, take the max, add a safety margin, round up to a
hardware-friendly multiple.  Overflow beyond the calibrated capacity folds
into the merged token and is reported by ``dtp_prune_gather`` (never silent).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def calibrate_capacities(
    kept_counts: np.ndarray,  # [n_batches, L] kept patches (incl. merged)
    *,
    margin: int = 8,
    multiple: int = 32,
    max_tokens: int = 10_000,
    mode: str = "ceil",
) -> Tuple[int, ...]:
    """Returns a per-layer buffer capacity tuple (CLS + patches + merge).

    ``mode``:
    * ``"ceil"`` (default) — round the needed buffer UP to ``multiple``:
      lossless (every mask-mode keep fits, modulo batch variance > margin).
    * ``"nearest"`` — round to the NEAREST ``multiple`` (never below one
      ``multiple``): with ``multiple=128`` this matches the fused attention
      kernel's lane granularity, so layers just past a boundary are clamped
      down instead of paying a whole extra 128-lane tile; clamped tokens fold
      into the merge token (counted, never silent).  Accuracy drift is
      measured in tests/test_calibration_drift.py and COVERAGE.md.
    """
    kept = np.asarray(kept_counts).reshape(-1, np.asarray(kept_counts).shape[-1])
    per_layer = kept.max(axis=0)
    caps = []
    for k in per_layer:
        # total buffer (CLS + >=topk patches + merge) rounded so the buffer
        # size itself is lane-aligned (the fused attention kernel requires
        # N % 128 == 0 to engage)
        need = int(k) - 1 + margin + 2
        if mode == "nearest":
            cap = max(multiple, int(round(need / multiple)) * multiple)
        else:
            cap = round_up(need, multiple)
        caps.append(min(cap, max_tokens))
    # enforce non-increasing (token counts never grow in DTP)
    for i in range(1, len(caps)):
        caps[i] = min(caps[i], caps[i - 1])
    return tuple(caps)
