"""Caption driver best-checkpoint gate on a real fixture.

The reference gates its best checkpoint on the CIDEr+SPICE SUM
(compress_caption_dtp.py:303); ours sums CIDEr + SPICE_offline (the
clean-room scene-graph scorer, eval/spice.py, standing in for the Java
pipeline; deviation quantified in tools/measure_gate_deviation.py).
This pins the two-metric gate end-to-end: one fixture compression epoch
must score the val captions with both metrics, log the gate identity,
and export the reference-interchange ``checkpoint_best.pth``.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_caption_driver_two_metric_gate(tmp_path, monkeypatch):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from tests.test_preempt import _make_fixture, _write_yaml

    cfg = _make_fixture(tmp_path / "fix")
    cfg["coco_gt_root"] = cfg["ann_root"]  # fixture caption_gt.json
    ypath = str(tmp_path / "caption.yaml")
    _write_yaml(ypath, cfg)
    out = str(tmp_path / "out")

    monkeypatch.setattr(sys, "argv", [
        "x", "--config", ypath, "--output_dir", out, "--pretrained", "",
        "--epoch", "1", "--p", "0.5", "--dp", "off"])
    from madtp_tpu.cli.compress_caption import main

    main()

    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))][-1]
    assert log["ckpt_gate"] == "CIDEr+SPICE_offline (reference: CIDEr+SPICE)"
    assert "CIDEr" in log and "SPICE_offline" in log
    # gate passes on epoch 0 (best starts at -1; fixture GFLOPs are far
    # below the budget) -> the reference-interchange artifact exists
    assert os.path.exists(os.path.join(out, "checkpoint_best.pth"))
