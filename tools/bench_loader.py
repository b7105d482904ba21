"""Host input-pipeline throughput: threaded vs process-worker loader
(VERDICT r2 #6; reference data/__init__.py:93-104 uses torch DataLoader
with multiprocess workers + prefetch_factor=4).

Generates a JPEG corpus on disk, then measures decode+transform batches/s
through `data/loader.batched_loader` (ThreadPoolExecutor) and
`data/mp_loader.mp_batched_loader` (fork workers + shared-memory slots) at
a train-shaped transform (RandomResizedCrop-style resize to --image_size +
RandAugment + normalize), and reports whether each pipeline can feed a
train step of --step_ms without starving.

CAVEAT for this build VM: `nproc` == 1, so thread-vs-process numbers here
are meaningless (every configuration is serialized onto one core —
measured and documented in COVERAGE.md).  Run on a multi-core host to size
`MADTP_MP_LOADER=1` num_workers for real training.

    python tools/bench_loader.py [--n 256] [--batch 32] [--image_size 384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


class JpegDataset:
    """Decode + transform, shaped like the real datasets.  ``train``
    includes RandomResizedCrop+flip+RandAugment+normalize (augment cost
    dominates); ``eval`` is decode+resize+normalize, where the fused
    native path saves the most."""

    def __init__(self, paths, image_size, transform="train"):
        self.paths = paths
        self.image_size = image_size
        self.transform = transform

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        import random

        from madtp_tpu.data.transforms import eval_transform, train_transform

        # pass the LAZY image: convert("RGB") would decode here and strip
        # .format/.filename, bypassing the fused native decode path
        with Image.open(self.paths[i]) as im:
            if self.transform == "eval":
                return (eval_transform(im, self.image_size), i)
            return (train_transform(im, self.image_size,
                                    random.Random(i)), i)


def make_corpus(root, n, size=500):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"{i}.jpg")
        if not os.path.exists(p):
            arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def run(loader_iter, n_batches):
    next(loader_iter, None)  # warmup: pool/worker spin-up stays untimed
    t0 = time.perf_counter()
    n = 0
    for _ in loader_iter:
        n += 1
        if n >= n_batches:
            break
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image_size", type=int, default=384)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--step_ms", type=float, default=70.0,
                    help="train-step time to feed (round-3 --fast_train "
                    "NLVR step is ~70 ms on the v5e chip)")
    ap.add_argument("--transform", default="train", choices=["train", "eval"])
    ap.add_argument("--root", default="/tmp/madtp_loader_bench")
    args = ap.parse_args()

    # batched_loader delegates to the process loader when MADTP_MP_LOADER is
    # set; the A/B must measure each loader as itself.
    os.environ.pop("MADTP_MP_LOADER", None)
    from madtp_tpu.data.loader import batched_loader
    from madtp_tpu.data.mp_loader import mp_batched_loader

    ds = JpegDataset(make_corpus(args.root, args.n), args.image_size,
                     args.transform)
    n_batches = max(1, len(ds) // args.batch - 1)  # one batch spare for warmup

    from madtp_tpu import native

    res = {}
    rows = [
        ("threaded", "", lambda: batched_loader(
            ds, args.batch, shuffle=True, num_workers=args.workers)),
        ("process", "", lambda: mp_batched_loader(
            ds, args.batch, shuffle=True, num_workers=args.workers)),
    ]
    if native.available():
        # fused C++ decode->crop->resize (GIL-free): =1 bit-exact vs PIL,
        # =2 adds DCT-scaled decode (approximate)
        for mode in ("1", "2"):
            rows.append((f"threaded_native{mode}", mode,
                         lambda: batched_loader(
                             ds, args.batch, shuffle=True,
                             num_workers=args.workers)))
    for name, njpeg, fn in rows:
        if njpeg:
            os.environ["MADTP_NATIVE_JPEG"] = njpeg
        else:
            os.environ.pop("MADTP_NATIVE_JPEG", None)
        bps = run(fn(), n_batches)
        res[name] = {
            "batches_per_s": round(bps, 3),
            "images_per_s": round(bps * args.batch, 1),
            "feeds_step": bps >= 1000.0 / args.step_ms,
        }
    os.environ.pop("MADTP_NATIVE_JPEG", None)

    need = round(1000.0 / args.step_ms, 2)
    print(json.dumps({
        "metric": "loader_batches_per_s", "unit": "batches/s",
        "needed_for_step": need, "cores": os.cpu_count(),
        "batch": args.batch, "image_size": args.image_size,
        "transform": args.transform,
        **res,
    }))


if __name__ == "__main__":
    main()
