"""Fused transformer FFN Pallas kernel: fc1 -> act -> fc2, VMEM-resident.

XLA cannot fuse two matmuls into one kernel, so the ``[tokens, 4D]``
hidden activation of every FFN round-trips HBM between fc1 and fc2 (at the
bench tower's shapes — ~12k tokens x 3072 bf16 — that's ~75 MB written and
re-read per layer, ~15% of the FFN's matmul time at this chip's rates).
Here one grid program per row-tile computes ``act(x @ W1 + b1) @ W2 + b2``
with the hidden tile held in VMEM; both weight matrices use constant block
index maps so Mosaic's pipeline emitter keeps them resident across the
whole grid instead of refetching per tile.

Semantics match :func:`madtp_tpu.ops.layers.mlp` (reference
``models/vit.py:15-36``): fp32 MXU accumulation, fc1 output rounded to the
activation dtype before the nonlinearity (as the XLA path does via
``linear``), exact erf GELU or CLIP QuickGELU (reference
``clip/model.py:169-171``).

Dispatch is decided in :func:`madtp_tpu.ops.layers.mlp`; differentiability
comes from a custom VJP that recomputes the XLA mlp in the backward (same
strategy as the fused cross-attention kernel), so gradients are exactly the
XLA path's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows of tokens per grid program.  256 keeps the fp32 hidden tile at
# 256 x 4096 x 4 = 4 MB for CLIP-L (3 MB for ViT-B) while giving the MXU
# [256, D] x [D, F] matmuls.
TILE_M = 256


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 erf, |err| <= 1.5e-7 in fp32.

    Mosaic has no erf/erfc lowering (NotImplementedError on this jaxlib), so
    the kernel's exact-GELU uses this polynomial; the error is ~4 decimal
    orders below the bf16 resolution the kernel output is rounded to."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _act_fn(name: str):
    if name == "gelu":  # exact erf GELU via the fp32 polynomial
        return lambda h: 0.5 * h * (1.0 + _erf_poly(h * (2.0 ** -0.5)))
    if name == "quick_gelu":
        return lambda h: h * jax.nn.sigmoid(1.702 * h)
    raise ValueError(name)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act: str):
    x = x_ref[...]  # [TM, D] activation dtype
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0, :][None, :]
    # round to the activation dtype like the XLA path's ``linear`` before the
    # nonlinearity, then apply it in fp32
    h = h.astype(x.dtype).astype(jnp.float32)
    g = _act_fn(act)(h).astype(x.dtype)
    y = jax.lax.dot_general(
        g, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0, :][None, :]
    o_ref[...] = y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def fused_mlp_2d(x, w1, b1, w2, b2, *, act: str = "gelu",
                 interpret: bool = False):
    """``act(x @ w1 + b1) @ w2 + b2`` for 2-D ``x`` [M, D]; M padded to the
    row tile internally.  D and the hidden width must be lane multiples."""
    M, D = x.shape
    F = w1.shape[1]
    Mp = ((M + TILE_M - 1) // TILE_M) * TILE_M
    xp = jnp.pad(x, ((0, Mp - M), (0, 0))) if Mp != M else x

    out = pl.pallas_call(
        functools.partial(_kernel, act=act),
        grid=(Mp // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, D), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_M, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(xp, w1.astype(x.dtype), b1.reshape(1, F).astype(jnp.float32),
      w2.astype(x.dtype), b2.reshape(1, D).astype(jnp.float32))
    return out[:M] if Mp != M else out
