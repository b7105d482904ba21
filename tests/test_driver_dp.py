"""Driver-level data-parallel equality (VERDICT r1 item 2): each CLI driver's
--synthetic run on the 8-fake-device mesh must produce the same metrics as a
single-device run (--dp off).  Matches the reference's default 8-way DDP
drivers (compress_nlvr_dtp.py:148, data/__init__.py:75-80)."""

import json
import os
import sys

import pytest


def _run(module, tmp_path, tag, extra):
    out = os.path.join(str(tmp_path), tag)
    argv = sys.argv
    sys.argv = ["x", "--synthetic", "--output_dir", out] + extra
    try:
        module.main()
    finally:
        sys.argv = argv
    with open(os.path.join(out, "evaluate.txt")) as f:
        return json.loads(f.readline())


def _compare(a, b):
    assert a.keys() == b.keys()
    for k in a:
        if isinstance(a[k], (int, float)):
            assert abs(a[k] - b[k]) < 2e-3, (k, a[k], b[k])
        else:
            assert a[k] == b[k], k


# (module name, extra args).  Batch sizes are pinned where the driver would
# otherwise auto-bump them to the device count under the mesh.
CASES = [
    ("compress_nlvr", ["--evaluate", "--batch_size_test", "8"]),
    ("compress_caption", []),
    ("compress_vqa", []),
    ("compress_retrieval", []),
    ("compress_retrieval_clip", []),
]


@pytest.mark.parametrize("name,extra", CASES, ids=[c[0] for c in CASES])
def test_driver_dp_matches_single_device(name, extra, tmp_path):
    import importlib

    module = importlib.import_module(f"madtp_tpu.cli.{name}")
    single = _run(module, tmp_path, "single", extra + ["--dp", "off"])
    sharded = _run(module, tmp_path, "sharded", extra)  # 8 fake devices
    _compare(single, sharded)


def test_nlvr_driver_dp_training_matches(tmp_path):
    """One full synthetic compression epoch (train + eval) sharded vs single
    device: the training losses and eval accuracy in log.txt must agree."""
    from madtp_tpu.cli import compress_nlvr as module

    def run(tag, dp):
        out = os.path.join(str(tmp_path), tag)
        argv = sys.argv
        sys.argv = ["x", "--synthetic", "--epoch", "1", "--output_dir", out,
                    "--batch_size_test", "8", "--dp", dp]
        try:
            module.main()
        finally:
            sys.argv = argv
        with open(os.path.join(out, "log.txt")) as f:
            return json.loads(f.readline())

    _compare(run("single", "off"), run("sharded", "auto"))


def test_nlvr_driver_fast_train_runs(tmp_path):
    """--fast_train: gather-mode training with per-epoch calibrated
    capacities runs the full synthetic pipeline (calibration probe ->
    compiled gather step -> eval) and produces finite losses."""
    from madtp_tpu.cli import compress_nlvr as module

    out = os.path.join(str(tmp_path), "fast_train")
    argv = sys.argv
    sys.argv = ["x", "--synthetic", "--epoch", "2", "--fast_train",
                "--dp", "off", "--output_dir", out]
    try:
        module.main()
    finally:
        sys.argv = argv
    with open(os.path.join(out, "log.txt")) as f:
        logs = [json.loads(l) for l in f]
    assert len(logs) == 2
    import math

    for log in logs:
        assert math.isfinite(float(log["train_loss"]))
        assert 0.0 <= float(log["val_acc"]) <= 1.0


def test_clip_driver_fast_eval_matches_mask_mode(tmp_path):
    """--fast_eval (gather vision tower, ceil/lossless capacities) must
    reproduce the mask-mode synthetic eval metrics exactly."""
    from madtp_tpu.cli import compress_retrieval_clip as module

    mask = _run(module, tmp_path, "mask", ["--dp", "off"])
    fast = _run(module, tmp_path, "fast", ["--dp", "off", "--fast_eval"])
    _compare(mask, fast)
