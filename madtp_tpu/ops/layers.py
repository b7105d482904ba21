"""Elementary NN ops as pure functions on param dicts.

Conventions:
* Linear params: ``{"kernel": [in, out], "bias": [out]}`` — kernels stored
  pre-transposed from torch's ``[out, in]`` so the hot path is ``x @ W``
  (row-major MXU friendly), see :mod:`madtp_tpu.ckpt.remap`.
* LayerNorm params: ``{"scale": [d], "bias": [d]}``.
* All matmuls request fp32 accumulation via ``preferred_element_type`` so bf16
  activations still accumulate in fp32 on the MXU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def linear(p, x):
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y.astype(x.dtype)


def layer_norm(p, x, eps: float = 1e-6):
    # Normalize in fp32 for stability regardless of activation dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def gelu(x):
    """Exact (erf) GELU — matches torch ``nn.GELU()`` / HF ``gelu`` used by the
    reference ViT and BERT (reference models/vit.py:18, med config hidden_act)."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x) (reference clip/model.py:169-171)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _mlp_xla(p, x, act):
    return linear(p["fc2"], act(linear(p["fc1"], x)))


def _ffn_fused_eligible(p, x):
    """Fused FFN dispatch — OPT-IN (``MADTP_FUSED_FFN=1``) pending the
    on-chip A/B (tools/bench_ffn.py); see fused_ffn.py for the rationale.
    Requires lane-aligned widths, matching weight dtype (the XLA path would
    upcast the matmul if the kernel were wider than the activations), biases
    present, and enough token rows to fill at least two row tiles."""
    if os.environ.get("MADTP_FUSED_FFN", "") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    k1, k2 = p["fc1"]["kernel"], p["fc2"]["kernel"]
    if p["fc1"].get("bias") is None or p["fc2"].get("bias") is None:
        return False
    D, F = k1.shape
    if D % 128 or F % 128 or k2.shape != (F, D):
        return False
    if k1.dtype != x.dtype or k2.dtype != x.dtype:
        return False
    if int(np.prod(x.shape[:-1])) < 512:
        return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mlp_fused(p, x, act_name):
    from madtp_tpu.ops.pallas.fused_ffn import fused_mlp_2d

    x2 = x.reshape(-1, x.shape[-1])
    y = fused_mlp_2d(x2, p["fc1"]["kernel"], p["fc1"]["bias"],
                     p["fc2"]["kernel"], p["fc2"]["bias"], act=act_name)
    return y.reshape(x.shape)


def _mlp_fused_fwd(p, x, act_name):
    return _mlp_fused(p, x, act_name), (p, x)


def _mlp_fused_bwd(act_name, res, g):
    # XLA-recompute backward (same strategy as the fused attention kernels):
    # gradients are exactly the XLA path's.
    p, x = res
    act = gelu if act_name == "gelu" else quick_gelu
    _, vjp = jax.vjp(lambda p_, x_: _mlp_xla(p_, x_, act), p, x)
    return vjp(g)


_mlp_fused.defvjp(_mlp_fused_fwd, _mlp_fused_bwd)


def mlp(p, x, act=gelu):
    """Transformer FFN: fc1 -> act -> fc2 (reference models/vit.py:15-36)."""
    if act is gelu:
        act_name = "gelu"
    elif act is quick_gelu:
        act_name = "quick_gelu"
    else:
        act_name = None
    if act_name is not None and _ffn_fused_eligible(p, x):
        return _mlp_fused(p, x, act_name)
    return _mlp_xla(p, x, act)


def patch_embed(p, images):
    """Conv-stem patchifier as reshape + one big matmul (MXU-friendly).

    ``images``: [B, 3, H, W] (torch channel order, matching the data pipeline
    and reference timm PatchEmbed).  Params: ``{"kernel": [3*ph*pw, D],
    "bias": [D]}`` where the kernel rows are flattened in torch's (c, kh, kw)
    order so a converted conv weight reproduces the conv exactly.
    """
    B, C, H, W = images.shape
    D = p["kernel"].shape[1]
    ph = pw = int(round((p["kernel"].shape[0] // C) ** 0.5))
    gh, gw = H // ph, W // pw
    x = images.reshape(B, C, gh, ph, gw, pw)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, ph, pw]
    x = x.reshape(B, gh * gw, C * ph * pw)
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if p.get("bias") is not None:
        y = y + p["bias"]
    return y.astype(images.dtype)


def cosine_embedding_loss(a, b, eps: float = 1e-8):
    """torch ``nn.CosineEmbeddingLoss`` with target=+1: mean(1 - cos(a, b)).

    Used for the FDT alignment loss (reference models/blip_nlvr.py:86-96).
    torch clamps the denominator at eps."""
    an = jnp.sqrt(jnp.sum(a * a, axis=-1))
    bn = jnp.sqrt(jnp.sum(b * b, axis=-1))
    cos = jnp.sum(a * b, axis=-1) / jnp.maximum(an * bn, eps)
    return jnp.mean(1.0 - cos)


def dropout(rng, x, rate: float):
    """Inverted dropout; identity when rate==0 or rng is None."""
    if rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def drop_path(rng, x_residual, rate):
    """Stochastic depth on a residual branch (timm DropPath,
    reference models/vit.py:113-114): drop the whole branch per sample.
    ``rate`` may be a traced scalar (per-layer linspace inside a scan)."""
    if rng is None:
        return x_residual
    B = x_residual.shape[0]
    keep_p = 1.0 - jnp.asarray(rate, jnp.float32)
    keep = jax.random.bernoulli(rng, keep_p,
                                (B,) + (1,) * (x_residual.ndim - 1))
    return jnp.where(keep, x_residual / jnp.maximum(keep_p, 1e-6), 0.0)


# CLIP normalization stats (reference data/__init__.py:20)
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_images(u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """On-device normalize: uint8 [B,H,W,3] -> [B,3,H,W] float, CLIP stats.
    The device-side half of the uint8 input pipeline (the reference
    normalizes on the host inside torchvision transforms)."""
    x = u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(IMAGE_STD, jnp.float32)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2).astype(dtype)
