"""Closed-form compute model (MAC-counting, fvcore-compatible).

The reference re-traces the whole model with fvcore on EVERY eval batch just
to measure GFLOPs for the temperature controller
(reference ``compress_nlvr_dtp.py:93-98``, ``utils.py:283-391``) — a host-side
stall.  Per-layer kept-token counts determine the compute exactly for
transformer stacks, so the TPU rebuild computes it in closed form from the
``kept_counts`` the forward already returns.

Conventions match fvcore: 1 multiply-add = 1 FLOP, so numbers are comparable
to the reference's hardcoded baselines (``Ori_Gflops = 132.54`` etc.,
``compress_nlvr_dtp.py:162``).
"""

from __future__ import annotations

from typing import Sequence


from madtp_tpu.core.config import CLIPConfig, MedConfig, ViTConfig


def _layer_macs(n_in: float, n_out: float, D: int, I: int, n_kv: float = None):
    """One transformer layer: qkv (3 n D^2) + scores/values (2 n n_kv D) +
    proj (n D^2) + FFN (2 n_out D I)."""
    n_kv = n_in if n_kv is None else n_kv
    attn = 3 * n_in * D * D + 2 * n_in * n_kv * D + n_in * D * D
    ffn = 2 * n_out * D * I
    return attn + ffn


def vit_flops(cfg: ViTConfig, kept_counts: Sequence[int]) -> float:
    """MACs for one image through the pruned ViT.  ``kept_counts[l]`` = alive
    patches (incl. merged) after layer ``l``."""
    D = cfg.embed_dim
    I = int(D * cfg.mlp_ratio)
    patch_macs = cfg.num_patches * (3 * cfg.patch_size ** 2) * D
    total = patch_macs
    n_prev = cfg.num_patches + 1
    for k in kept_counts:
        n_out = float(k) + 1
        total += _layer_macs(n_prev, n_out, D, I)
        n_prev = n_out
    # MAG query model: tokens x codebook (100) + pooled features, per layer
    total += sum((float(k) + 1) * 100 * D * 2 for k in kept_counts)
    return float(total)


def med_flops(
    cfg: MedConfig,
    kept_counts: Sequence[int],
    n_text0: int,
    *,
    cross_kv: float = 0.0,
    twin: bool = False,
) -> float:
    """MACs for the text/multimodal encoder.  ``cross_kv`` = image token count
    seen by cross-attention (0 for text mode)."""
    D = cfg.hidden_size
    I = cfg.intermediate_size
    total = 0.0
    n_prev = float(n_text0)
    streams = 2 if twin else 1
    merge_start = getattr(cfg, "merge_start_layer", 6)
    for i, k in enumerate(kept_counts):
        n_out = float(k) + 1
        total += _layer_macs(n_prev, n_out, D, I)
        if cross_kv > 0:
            per_stream = (
                n_out * D * D  # query proj
                + 2 * cross_kv * D * D  # k/v proj
                + 2 * n_out * cross_kv * D  # scores + values
                + n_out * D * D  # out proj
            )
            total += streams * per_stream
            if twin and i >= merge_start:
                # the reference twin encoder only instantiates/executes the
                # merge matmul at layers >= 6 (nlvr_encoder.py:282); earlier
                # layers average the two streams (no MACs)
                total += n_out * (2 * D) * D  # merge layer
        total += n_out * 100 * D * 2  # MAG
        n_prev = n_out
    return float(total)


def nlvr_gflops(vit_cfg: ViTConfig, med_cfg: MedConfig,
                v_kept: Sequence[int], t_kept: Sequence[int],
                n_text0: int) -> float:
    """Per-sample GFLOPs for BLIP-NLVR (2 images + twin-cross text;
    reference Ori ~= 132.54 at 384^2 unpruned)."""
    v = 2 * vit_flops(vit_cfg, v_kept)
    cross_kv = float(v_kept[-1]) + 1
    t = med_flops(med_cfg, t_kept, n_text0, cross_kv=cross_kv, twin=True)
    return (v + t) / 1e9


def caption_gflops(vit_cfg: ViTConfig, med_cfg: MedConfig,
                   v_kept: Sequence[int], n_text0: int) -> float:
    """BLIP captioning: image tower + unpruned decoder (reference Ori 65.7)."""
    v = vit_flops(vit_cfg, v_kept)
    cross_kv = float(v_kept[-1]) + 1
    t = med_flops(med_cfg, [n_text0 - 1] * med_cfg.num_hidden_layers, n_text0,
                  cross_kv=cross_kv)
    return (v + t) / 1e9


def retrieval_gflops(vit_cfg: ViTConfig, med_cfg: MedConfig,
                     v_kept: Sequence[int], t_kept: Sequence[int],
                     n_text0: int) -> float:
    """BLIP retrieval *training* forward, which is what the reference's
    controller traces (reference compress_retrieval_dtp.py eval loop): main +
    momentum towers (x2) plus ITM on the positive pair (B) and two negatives
    (2B) -> 3 ITM passes per sample.  Reference Ori ~= 153.2."""
    v = vit_flops(vit_cfg, v_kept)
    t = med_flops(med_cfg, t_kept, n_text0)
    cross_kv = float(v_kept[-1]) + 1
    itm = med_flops(med_cfg, t_kept, n_text0, cross_kv=cross_kv)
    return (2 * v + 2 * t + 3 * itm) / 1e9


def vqa_gflops(vit_cfg: ViTConfig, med_cfg: MedConfig,
               v_kept: Sequence[int], q_kept: Sequence[int], n_q0: int,
               *, n_answers: float = 1.0, n_ans_tokens: float = 8.0) -> float:
    """BLIP VQA: image tower + question encoder (cross-attn on image) +
    answer decoder over question states (reference Ori ~= 186.1 with the
    canned 47-answer trace)."""
    v = vit_flops(vit_cfg, v_kept)
    cross_kv = float(v_kept[-1]) + 1
    q = med_flops(med_cfg, q_kept, n_q0, cross_kv=cross_kv)
    q_len = float(q_kept[-1]) + 1
    dec = n_answers * med_flops(
        med_cfg, [n_ans_tokens - 1] * med_cfg.num_hidden_layers,
        int(n_ans_tokens), cross_kv=q_len,
    )
    return (v + q + dec) / 1e9


def clip_gflops(cfg: CLIPConfig, v_kept: Sequence[int], t_kept: Sequence[int]) -> float:
    """CLIP dual towers (reference Ori 395.7 for ViT-L/14@336)."""
    Dt, It = cfg.transformer_width, cfg.transformer_width * 4
    if getattr(cfg, "resnet_layers", ()):
        from madtp_tpu.models.clip_resnet import resnet_gflops

        total = resnet_gflops(cfg.resnet_layers, cfg.vision_width,
                              cfg.image_resolution, cfg.embed_dim) * 1e9
    else:
        Dv, Iv = cfg.vision_width, cfg.vision_width * 4
        total = cfg.vision_num_patches * (3 * cfg.vision_patch_size ** 2) * Dv
        n_prev = cfg.vision_num_patches + 1
        for k in v_kept:
            n_out = float(k) + 1
            total += _layer_macs(n_prev, n_out, Dv, Iv)
            total += n_out * 100 * Dv * 2
            n_prev = n_out
        total += (n_prev * Dv * cfg.embed_dim)
    n_prev = float(cfg.context_length)
    for k in t_kept:
        n_out = float(k) + 1
        total += _layer_macs(n_prev, n_out, Dt, It)
        total += n_out * 100 * Dt * 2
        n_prev = n_out
    # reference CLIP.forward also runs the momentum towers
    # (clip/model.py:549-550), and that is what its controller traces.
    return 2 * float(total) / 1e9
