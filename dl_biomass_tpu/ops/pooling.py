"""Masked reductions.

``masked_max`` replaces both the torch_scatter scatter-max aggregation inside
``PointConv`` and ``global_max_pool(x, batch)`` (reference
``pointnet2_regressor.py:30``): with dense ``(B, N, C)`` batching the segment
structure disappears and a max over the point axis with -inf masking is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_max(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    """Max over ``axis`` ignoring mask=False entries.

    Slots with no valid entries yield 0 (matching scatter-max's empty-segment
    fill in PyG; in practice every centroid includes itself so this never fires
    on the main path).
    """
    neg = jnp.asarray(-jnp.inf, x.dtype)
    filled = jnp.where(jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask, x, neg)
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    if any_valid.ndim == out.ndim - 1:
        any_valid = jnp.expand_dims(any_valid, -1)
    return jnp.where(any_valid, out, 0.0)


def masked_mean(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    """Mean over ``axis`` ignoring mask=False entries (0 where empty)."""
    m = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    s = jnp.sum(jnp.where(m, x, 0.0), axis=axis)
    cnt = jnp.sum(m.astype(x.dtype), axis=axis)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)
