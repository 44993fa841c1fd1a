"""Neighborhood gather / grouping for set-abstraction layers.

Replaces the edge-list gather inside torch_geometric's ``PointConv`` message
passing (reference ``pointnet2_regressor.py:10,18``): for every centroid, gather
its K ball-query neighbors, translate them into the centroid frame, and stack
``[feat_j, pos_j - pos_i]`` — the per-edge MLP input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_points(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather along the point axis.

    x: (B, N, C); idx: (B, ...) int32 -> (B, ..., C)

    Implementation note: ``vmap(x[idx])`` lowers to a leading-axis gather that
    XLA:TPU vectorizes well (~31 ms at SA1 scale); the equivalent
    ``take_along_axis`` formulation lowers to a per-element gather (~422 ms).
    """
    return jax.vmap(lambda xx, ii: xx[ii])(x, idx)


def group_neighborhoods(
    pos: jax.Array,  # (B, N, 3)
    feat: jax.Array | None,  # (B, N, F) or None
    centers: jax.Array,  # (B, M, 3)
    idx: jax.Array,  # (B, M, K)
    nbr_mask: jax.Array,  # (B, M, K)
) -> jax.Array:
    """Build the per-edge MLP input block.

    Returns (B, M, K, F+3): ``[feat_j, pos_j - center_i]`` — feature order matches
    PyG PointConv's ``cat([x_j, pos_j - pos_i])`` message. Invalid neighbor slots
    are zeroed (downstream masked-max ignores them anyway).
    """
    grouped_pos = gather_points(pos, idx) - centers[:, :, None, :]
    if feat is not None:
        grouped_feat = gather_points(feat, idx)
        out = jnp.concatenate([grouped_feat, grouped_pos], axis=-1)
    else:
        out = grouped_pos
    return jnp.where(nbr_mask[..., None], out, 0.0)
