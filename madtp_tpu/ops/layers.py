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

import jax
import jax.numpy as jnp


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


def mlp(p, x, act=gelu):
    """Transformer FFN: fc1 -> act -> fc2 (reference models/vit.py:15-36)."""
    return linear(p["fc2"], act(linear(p["fc1"], x)))


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
