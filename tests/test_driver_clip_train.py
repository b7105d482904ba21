"""CLIP driver END-TO-END compression training on a real fixture.

Covers the one driver path no other test exercised: the CLIP training
loop's best-checkpoint export.  The reference saves ``checkpoint_best.pth``
(compress_retrieval_clip_dtp.py:351-358) and its evaluate scripts load it;
this test runs 1 fixture epoch, asserts the ``.pth`` exists, and
re-evaluates FROM it — metrics must reproduce the train-time eval exactly
(same params, same stored temperature)."""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_clip_driver_fixture_train_exports_reference_pth(tmp_path, monkeypatch):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_fixture

    root = str(tmp_path / "fix")
    make_fixture.make(root)

    from madtp_tpu.ckpt.export import export_clip, save_torch_checkpoint
    from madtp_tpu.core.config import CLIPConfig
    from madtp_tpu.models.clip import init_clip_params

    # NOTE: head counts must be what --evaluate's shape inference derives
    # (heads = width // 64, the reference's clip/model.py:684,697 rule) —
    # an override trains one architecture but re-evaluates another, and
    # the metrics then only match when no rank boundary falls inside the
    # tiny cross-architecture feature delta (this test was flaky so).
    cfg = CLIPConfig(
        embed_dim=16, image_resolution=64, vision_layers=2, vision_width=64,
        vision_patch_size=16, context_length=32,
        vocab_size=49408,  # the real CLIP BPE tokenizer's id space
        transformer_width=64, transformer_heads=1, transformer_layers=2,
        sd_dim=64,
    )
    rng = np.random.RandomState(3)
    sd = export_clip(init_clip_params(cfg, rng))
    sd["space_dict"] = rng.randn(10, 64).astype(np.float32)
    pre = os.path.join(root, "pretrained.pth")
    save_torch_checkpoint(pre, sd, temperature=0.0)

    ypath = os.path.join(root, "clip.yaml")
    open(ypath, "w").write(f"""
image_root: {root}/images
ann_root: {root}/annotation
dataset: flickr
sd_dim: 64
batch_size_train: 4
batch_size_test: 4
queue_size: 8
init_lr: 1e-4
min_lr: 0
weight_decay: 0.2
alpha: 0.4
""")

    from madtp_tpu.cli.compress_retrieval_clip import main

    out = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "x", "--config", ypath, "--output_dir", out, "--pretrained", pre,
        "--epoch", "1", "--p", "0.5", "--dp", "off"])
    main()
    ckpt = os.path.join(out, "checkpoint_best.pth")
    assert os.path.exists(ckpt)  # the reference-interchange artifact
    train_log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))][-1]

    out2 = str(tmp_path / "out_eval")
    monkeypatch.setattr(sys, "argv", [
        "x", "--config", ypath, "--output_dir", out2, "--pretrained", ckpt,
        "--evaluate", "--dp", "off"])
    main()
    ev = json.load(open(os.path.join(out2, "evaluate.txt")))
    # exported params + stored temperature reproduce the train-time eval
    for k in ("r_mean", "txt_r_mean", "img_r_mean"):
        assert abs(ev[k] - train_log[k]) < 1e-6, (k, ev[k], train_log[k])
