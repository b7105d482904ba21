"""CLIP ModifiedResNet vision tower (RN50/RN101-style), TPU-native.

Reference: ``clip/model.py:12-156`` (Bottleneck, AttentionPool2d,
ModifiedResNet) — 3-conv anti-aliased stem, avgpool-prepended strided
bottlenecks, and a single-query QKV attention pool instead of GAP.

Note on the reference's own integration: MADTP's ``CLIP.__init__`` passes
``sd_dim=`` to ``ModifiedResNet.__init__`` (``clip/model.py:352-359``) which
does not accept it, and ``encode_image`` forwards ``space_dict=``/
``temperature=`` into its plain ``forward(x)`` — i.e. the reference's ResNet
branch cannot be constructed or called as shipped.  This rebuild provides the
working capability: RN checkpoints load and evaluate; DTP does not apply
(there is no token stream to prune until the final attention pool, and the
reference defines no ResNet pruning semantics).

Inference-only tower: BatchNorm uses the checkpoint's running statistics
(MADTP never trains RN towers; no config/checkpoint in the reference uses
one).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


def _conv(kernel, x, stride=1, padding=0):
    """NCHW conv with torch OIHW kernels (kept in checkpoint layout)."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _bn(p, x):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (p["bias"].astype(jnp.float32)
             - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32)
             * inv).astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def _avg_pool(x, k):
    if k <= 1:
        return x
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID")
    return out / float(k * k)


def _bottleneck(p, x, stride: int):
    """reference clip/model.py:12-57: all convs stride 1; avgpool after
    conv2 when stride > 1; downsample = avgpool + 1x1 conv + bn."""
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], out, padding=1)))
    out = _avg_pool(out, stride)
    out = _bn(p["bn3"], _conv(p["conv3"], out))
    identity = x
    if "downsample" in p:
        identity = _bn(p["downsample"]["bn"],
                       _conv(p["downsample"]["conv"], _avg_pool(x, stride)))
    return jax.nn.relu(out + identity)


def attention_pool_2d(p, x, num_heads: int):
    """reference clip/model.py:60-94: mean-token query attention over the
    HW grid + mean, separate q/k/v projections, c_proj to output_dim."""
    from madtp_tpu.ops.layers import linear

    B, C, H, W = x.shape
    t = x.reshape(B, C, H * W).transpose(0, 2, 1)  # [B,HW,C]
    t = jnp.concatenate([jnp.mean(t, axis=1, keepdims=True), t], axis=1)
    t = t + p["positional_embedding"].astype(t.dtype)[None]

    q = linear(p["q_proj"], t[:, :1])  # single query: the mean token
    k = linear(p["k_proj"], t)
    v = linear(p["v_proj"], t)
    Dh = C // num_heads

    def heads(a):
        return a.reshape(B, -1, num_heads, Dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * (Dh ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                     preferred_element_type=jnp.float32).astype(vh.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return linear(p["c_proj"], out)


def modified_resnet_forward(params, images, *, layers: Sequence[int],
                            width: int) -> jnp.ndarray:
    """[B,3,R,R] -> [B, output_dim] (reference clip/model.py:139-156)."""
    x = images
    stem = params["stem"]
    x = jax.nn.relu(_bn(stem["bn1"], _conv(stem["conv1"], x, stride=2,
                                           padding=1)))
    x = jax.nn.relu(_bn(stem["bn2"], _conv(stem["conv2"], x, padding=1)))
    x = jax.nn.relu(_bn(stem["bn3"], _conv(stem["conv3"], x, padding=1)))
    x = _avg_pool(x, 2)
    for li in range(4):
        blocks = params[f"layer{li + 1}"]
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            x = _bottleneck(bp, x, stride if bi == 0 else 1)
    heads = width * 32 // 64  # reference clip/model.py:351
    return attention_pool_2d(params["attnpool"], x, heads)


def resnet_gflops(layers: Sequence[int], width: int,
                  input_resolution: int, output_dim: int) -> float:
    """Analytic per-image conv+attnpool MACs (the unpruned-compute
    counterpart of prune/flops.py for RN towers)."""
    total = 0.0
    r = input_resolution // 2
    total += r * r * (3 * 9 * (width // 2))            # conv1 s2
    total += r * r * (width // 2) * 9 * (width // 2)   # conv2
    total += r * r * (width // 2) * 9 * width          # conv3
    r //= 2  # stem avgpool
    inp = width
    for li in range(4):
        planes = width * (2 ** li)
        out_c = planes * 4
        stride = 1 if li == 0 else 2
        for bi in range(layers[li]):
            s = stride if bi == 0 else 1
            total += r * r * inp * planes              # conv1 1x1
            total += r * r * planes * 9 * planes       # conv2 3x3
            rr = r // s
            total += rr * rr * planes * out_c          # conv3 1x1
            if s > 1 or inp != out_c:
                total += rr * rr * inp * out_c         # downsample conv
            r, inp = rr, out_c
    C = width * 32
    n = r * r + 1
    total += n * C * C * 3 + n * C * 2 + C * output_dim  # attnpool
    return total / 1e9


def init_modified_resnet_params(layers: Sequence[int], width: int,
                                input_resolution: int, output_dim: int,
                                rng: np.random.RandomState,
                                dtype=np.float32):
    """Random init (tests; real weights come from checkpoints)."""

    def conv(o, i, k):
        return (rng.randn(o, i, k, k) * (1.0 / np.sqrt(i * k * k))
                ).astype(dtype)

    def bn(c):
        return {"scale": np.ones(c, dtype), "bias": np.zeros(c, dtype),
                "mean": (rng.randn(c) * 0.1).astype(dtype),
                "var": np.abs(rng.randn(c) * 0.1 + 1.0).astype(dtype)}

    def lin(i, o):
        return {"kernel": (rng.randn(i, o) * 0.05).astype(dtype),
                "bias": np.zeros(o, dtype)}

    p = {"stem": {
        "conv1": conv(width // 2, 3, 3), "bn1": bn(width // 2),
        "conv2": conv(width // 2, width // 2, 3), "bn2": bn(width // 2),
        "conv3": conv(width, width // 2, 3), "bn3": bn(width),
    }}
    inp = width
    for li in range(4):
        planes = width * (2 ** li)
        out_c = planes * 4
        stride = 1 if li == 0 else 2
        blocks = []
        for bi in range(layers[li]):
            s = stride if bi == 0 else 1
            bp = {"conv1": conv(planes, inp, 1), "bn1": bn(planes),
                  "conv2": conv(planes, planes, 3), "bn2": bn(planes),
                  "conv3": conv(out_c, planes, 1), "bn3": bn(out_c)}
            if s > 1 or inp != out_c:
                bp["downsample"] = {"conv": conv(out_c, inp, 1),
                                    "bn": bn(out_c)}
            blocks.append(bp)
            inp = out_c
        p[f"layer{li + 1}"] = blocks
    C = width * 32
    n = (input_resolution // 32) ** 2 + 1
    p["attnpool"] = {
        "positional_embedding": (rng.randn(n, C) / np.sqrt(C)).astype(dtype),
        "q_proj": lin(C, C), "k_proj": lin(C, C), "v_proj": lin(C, C),
        "c_proj": lin(C, output_dim),
    }
    return p
