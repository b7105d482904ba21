"""Param-pytree helpers.

Parameters are nested dicts of jnp/np arrays.  Per-layer weights of a
transformer stack are stacked along a leading axis so the layer loop can be a
``lax.scan`` (one compile of the block instead of ``depth``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Nested dict -> flat { 'a.b.c': leaf }."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = v
    return out


def unflatten_tree(flat: Dict[str, Any]) -> Dict[str, Any]:
    """Flat { 'a.b.c': leaf } -> nested dict."""
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def cast_tree(tree, dtype):
    """Cast all float leaves to ``dtype`` (ints/bools untouched)."""
    dtype = jnp.dtype(dtype)

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def tree_size(tree) -> int:
    """Total number of parameters."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def stack_layers(layer_trees):
    """Stack a list of per-layer param trees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *layer_trees)


def layer_slice(stacked, i):
    """Take layer ``i`` out of a stacked tree (used by non-scan paths)."""
    return jax.tree_util.tree_map(lambda x: x[i], stacked)
