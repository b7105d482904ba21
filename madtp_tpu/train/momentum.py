"""Momentum encoders + feature queues, functional.

Reference: ``models/blip_retrieval.py:285-322`` (param-list EMA + registered
buffers mutated in place).  Functional TPU version: the momentum tree is an
EMA ``tree_map``; the queue is a pytree updated with
``lax.dynamic_update_slice`` and donated across steps — no host-side pointer
arithmetic (the reference's ``int(self.ptr_queue)`` is a device->host sync
every step)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def momentum_update(params, params_m, momentum: float = 0.995):
    """EMA update (reference models/blip_retrieval.py:294-299)."""
    return jax.tree_util.tree_map(
        lambda p, m: m * momentum + p * (1.0 - momentum), params, params_m
    )


class FeatureQueue(NamedTuple):
    image: jnp.ndarray  # [E, Q]
    text: jnp.ndarray  # [E, Q]
    idx: jnp.ndarray  # [Q] int32, -100 init
    ptr: jnp.ndarray  # scalar int32


def init_queue(embed_dim: int, queue_size: int, rng=None) -> FeatureQueue:
    """Random L2-normalized init, ids -100 (reference :84-96)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    img = jax.random.normal(k1, (embed_dim, queue_size))
    txt = jax.random.normal(k2, (embed_dim, queue_size))
    img = img / jnp.linalg.norm(img, axis=0, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=0, keepdims=True)
    return FeatureQueue(
        image=img.astype(jnp.float32),
        text=txt.astype(jnp.float32),
        idx=jnp.full((queue_size,), -100, jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
    )


def enqueue(q: FeatureQueue, image_feat: jnp.ndarray, text_feat: jnp.ndarray,
            idx: jnp.ndarray) -> FeatureQueue:
    """Dequeue-and-enqueue a (gathered) batch at the pointer
    (reference :301-322; queue_size must be a multiple of the global batch)."""
    b = image_feat.shape[0]
    ptr = q.ptr
    img = jax.lax.dynamic_update_slice(q.image, image_feat.T, (0, ptr))
    txt = jax.lax.dynamic_update_slice(q.text, text_feat.T, (0, ptr))
    ids = jax.lax.dynamic_update_slice(q.idx, idx.astype(jnp.int32), (ptr,))
    new_ptr = (ptr + b) % q.idx.shape[0]
    return FeatureQueue(img, txt, ids, new_ptr)
