"""Dense, fixed-shape point-cloud batch schema.

The reference pipeline (torch_geometric) represents a batch of point clouds as one
ragged concatenation with a per-point ``batch`` index vector. That layout is hostile
to XLA (dynamic shapes, scatter-heavy ops), so the single biggest design translation
of this framework is: **a batch is a dense ``(B, N, ...)`` block plus a validity
mask**. Every op downstream (FPS, ball query, grouping, pooling, losses) is
mask-aware, so variable-size clouds (e.g. after augmentation, which produces
0.9*N..1.1*N points — reference ``augmentation.py:73-122``) keep a static shape.

Replaces: the PyG ``Data(x, y, pos, batch, PlotID)`` objects built in
``pointcloud_dataloader.py:124-127`` of the reference.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def round_up(x: int, multiple: int) -> int:
    """Round ``x`` up to the next multiple of ``multiple``."""
    return -(-x // multiple) * multiple


@struct.dataclass
class CloudBatch:
    """A dense batch of point clouds.

    Attributes:
      pos:  ``(B, N, 3)`` float32 — xyz coordinates (centered per cloud).
      feat: ``(B, N, F)`` float32 — per-point features (e.g. normalized intensity).
      mask: ``(B, N)`` bool — True for real points, False for padding.
      y:    ``(B, 4)`` float32 or None — biomass targets
            (bark, branch, foliage, wood; tons/ha).
    """

    pos: jax.Array
    feat: jax.Array
    mask: jax.Array
    y: Optional[jax.Array] = None

    @property
    def batch_size(self) -> int:
        return self.pos.shape[0]

    @property
    def num_points(self) -> int:
        return self.pos.shape[1]

    @property
    def num_features(self) -> int:
        return self.feat.shape[-1]

    def valid_counts(self) -> jax.Array:
        """Number of real (non-pad) points per cloud, shape ``(B,)``."""
        return jnp.sum(self.mask.astype(jnp.int32), axis=1)

    def slice_batch(self, start: int, size: int) -> "CloudBatch":
        y = None if self.y is None else jax.lax.dynamic_slice_in_dim(self.y, start, size, 0)
        return CloudBatch(
            pos=jax.lax.dynamic_slice_in_dim(self.pos, start, size, 0),
            feat=jax.lax.dynamic_slice_in_dim(self.feat, start, size, 0),
            mask=jax.lax.dynamic_slice_in_dim(self.mask, start, size, 0),
            y=y,
        )

    @classmethod
    def from_numpy(
        cls,
        pos_list: Sequence[np.ndarray],
        feat_list: Sequence[np.ndarray],
        y: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
        align: int = 128,
    ) -> "CloudBatch":
        """Pack variable-size numpy clouds into one dense padded batch.

        ``capacity`` defaults to the max cloud size rounded up to ``align`` (TPU
        lane width) so downstream kernels see hardware-friendly shapes.
        """
        assert len(pos_list) == len(feat_list) and len(pos_list) > 0
        sizes = [int(p.shape[0]) for p in pos_list]
        if capacity is None:
            capacity = round_up(max(sizes), align)
        b = len(pos_list)
        f = int(feat_list[0].shape[1]) if feat_list[0].ndim == 2 else 1
        pos = np.zeros((b, capacity, 3), np.float32)
        feat = np.zeros((b, capacity, f), np.float32)
        mask = np.zeros((b, capacity), bool)
        for i, (p, x) in enumerate(zip(pos_list, feat_list)):
            n = min(int(p.shape[0]), capacity)
            pos[i, :n] = p[:n]
            feat[i, :n] = x[:n].reshape(n, f)
            mask[i, :n] = True
        yy = None if y is None else jnp.asarray(np.asarray(y, np.float32))
        return cls(pos=jnp.asarray(pos), feat=jnp.asarray(feat), mask=jnp.asarray(mask), y=yy)


def pad_points_axis(x: jax.Array, capacity: int, axis: int = 1, fill: Any = 0) -> jax.Array:
    """Pad ``x`` along ``axis`` to ``capacity`` with ``fill``."""
    n = x.shape[axis]
    if n == capacity:
        return x
    if n > capacity:
        raise ValueError(f"axis {axis} size {n} exceeds capacity {capacity}")
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, capacity - n)
    return jnp.pad(x, widths, constant_values=fill)
