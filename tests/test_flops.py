"""Analytic FLOPs model pinned against the reference's fvcore baselines
(reference compress_*_dtp.py hardcoded Ori_Gflops)."""

from madtp_tpu.core.config import CLIPConfig, MedConfig, ViTConfig
from madtp_tpu.prune.flops import (
    caption_gflops,
    clip_gflops,
    nlvr_gflops,
    retrieval_gflops,
)

VIT = ViTConfig()  # base/16 @ 384
MED = MedConfig()


def test_nlvr_unpruned_matches_reference():
    # reference compress_nlvr_dtp.py:162 -> 132.54 (canned 26-token sentence)
    g = nlvr_gflops(VIT, MED, [576] * 12, [25] * 12, 26)
    assert abs(g - 132.54) / 132.54 < 0.02


def test_caption_unpruned_matches_reference():
    # reference compress_caption_dtp.py:216 -> 65.7 (canned 14-token caption)
    g = caption_gflops(VIT, MED, [576] * 12, 14)
    assert abs(g - 65.7) / 65.7 < 0.02


def test_retrieval_unpruned_matches_reference():
    # reference compress_retrieval_dtp.py:383 -> 153.2 (35-token max_length)
    g = retrieval_gflops(VIT, MED, [576] * 12, [34] * 12, 35)
    assert abs(g - 153.2) / 153.2 < 0.03


def test_clip_unpruned_matches_reference():
    # reference compress_retrieval_clip_dtp.py:281 -> 395.7 (ViT-L/14@336)
    cfg = CLIPConfig(
        embed_dim=768, image_resolution=336, vision_layers=24,
        vision_width=1024, vision_patch_size=14, context_length=77,
        vocab_size=49408, transformer_width=768, transformer_heads=12,
        transformer_layers=12,
    )
    g = clip_gflops(cfg, [576] * 24, [76] * 12)
    assert abs(g - 395.7) / 395.7 < 0.05


def test_pruning_reduces_flops_monotonically():
    g_full = nlvr_gflops(VIT, MED, [576] * 12, [25] * 12, 26)
    g_half = nlvr_gflops(VIT, MED, [300] * 12, [15] * 12, 26)
    g_quarter = nlvr_gflops(VIT, MED, [150] * 12, [8] * 12, 26)
    assert g_full > g_half > g_quarter
