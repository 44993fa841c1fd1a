"""On-device voxelization: dense point clouds -> dense voxel feature grids.

The reference explored a sparse voxel CNN via MinkowskiEngine
(``Misc/Minkowski_Engine/Minkowski_Main_V1.py:4-35``) — a C++/CUDA sparse-tensor
engine whose whole design (coordinate hashing, kernel maps, gather/scatter
convolution) exists to skip empty space on GPUs. On TPU that design is
inverted: at plot scale (a 24³-32³ grid is ~14k-33k voxels) a **dense** grid
convolution lowers straight onto the MXU through XLA's conv emitter, while a
sparse gather/scatter conv would serialize into exactly the scatter patterns
the hardware is worst at. So the TPU-native equivalent of Minkowski's sparse
tensor build is this op: scatter points into a dense ``(B, G, G, G, C)`` grid
once, then run everything downstream as dense convs (``models/voxelnet.py``).

Differentiable w.r.t. features (scatter-add VJP = gather); voxel indices carry
no gradient — same as Minkowski's coordinate build.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("grid", "extent"))
def voxelize(
    pos: jax.Array,  # (B, N, 3) float32, centered per cloud
    feat: Optional[jax.Array],  # (B, N, F) float32 or None
    mask: jax.Array,  # (B, N) bool
    *,
    grid: int,
    extent: Optional[float] = None,  # half-width of the cube; None = per-cloud
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Scatter points into a dense voxel grid.

    The cube ``[-extent, extent]³`` is split into ``grid³`` voxels; points
    outside are clipped onto the boundary voxels. ``extent=None`` adapts per
    cloud to the max |coordinate| over valid points (clouds arrive centered —
    reference ``pointcloud_dataloader.py:108`` / ``downsampling_point_clouds.py:168``).

    Returns:
      counts:   (B, G, G, G)    float32 — points per voxel
      feat_sum: (B, G, G, G, F) float32 — per-voxel feature sums (F=0 kept)
      off_sum:  (B, G, G, G, 3) float32 — per-voxel sums of the offset of each
                point from its voxel center, in voxel units (sub-voxel
                geometry; mean offset = off_sum / counts)
    """
    b, n, _ = pos.shape
    g3 = grid * grid * grid
    maskf = mask.astype(jnp.float32)

    if extent is None:
        # per-cloud adaptive cube; tiny epsilon keeps the max point inside
        ext = jnp.max(jnp.abs(pos) * maskf[..., None], axis=(1, 2))  # (B,)
        ext = jnp.maximum(ext, 1e-6) * (1.0 + 1e-6)
        ext = ext[:, None, None]
    else:
        ext = jnp.full((b, 1, 1), float(extent), jnp.float32)

    # voxel coordinates per axis, clipped to the grid
    u = (pos + ext) * (grid / 2.0) / ext  # in [0, grid)
    iv = jnp.clip(u.astype(jnp.int32), 0, grid - 1)  # (B, N, 3)
    flat = (iv[..., 0] * grid + iv[..., 1]) * grid + iv[..., 2]  # (B, N)
    flat = jnp.where(mask, flat, 0)  # pads scatter zero weight into voxel 0

    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    counts = jnp.zeros((b, g3), jnp.float32).at[rows, flat].add(maskf)

    f = 0 if feat is None else feat.shape[-1]
    if f:
        fs = jnp.zeros((b, g3, f), jnp.float32).at[rows, flat].add(
            feat.astype(jnp.float32) * maskf[..., None]
        )
    else:
        fs = jnp.zeros((b, g3, 0), jnp.float32)

    # offset from the center of the point's voxel, in voxel units (in [-.5, .5])
    center_u = iv.astype(jnp.float32) + 0.5
    off = jnp.clip(u - center_u, -0.5, 0.5) * maskf[..., None]
    os_ = jnp.zeros((b, g3, 3), jnp.float32).at[rows, flat].add(off)

    shape = (b, grid, grid, grid)
    return counts.reshape(shape), fs.reshape(shape + (f,)), os_.reshape(shape + (3,))


def voxelize_reference(pos, feat, mask, *, grid, extent=None):
    """Pure-numpy oracle with identical semantics (for parity tests)."""
    import numpy as np

    pos = np.asarray(pos, np.float32)  # f32 index math matches the jnp path
    mask = np.asarray(mask, bool)
    b, n, _ = pos.shape
    f = 0 if feat is None else np.asarray(feat).shape[-1]
    counts = np.zeros((b, grid, grid, grid), np.float64)
    fs = np.zeros((b, grid, grid, grid, f), np.float64)
    os_ = np.zeros((b, grid, grid, grid, 3), np.float64)
    for i in range(b):
        if extent is None:
            valid = pos[i][mask[i]]
            ext = max(float(np.abs(valid).max()) if len(valid) else 0.0, 1e-6)
            ext *= 1.0 + 1e-6
        else:
            ext = float(extent)
        for j in range(n):
            if not mask[i, j]:
                continue
            u = (pos[i, j] + ext) * (grid / 2.0) / ext
            iv = np.clip(u.astype(np.int32), 0, grid - 1)
            counts[i, iv[0], iv[1], iv[2]] += 1.0
            if f:
                fs[i, iv[0], iv[1], iv[2]] += np.asarray(feat)[i, j]
            os_[i, iv[0], iv[1], iv[2]] += np.clip(u - (iv + 0.5), -0.5, 0.5)
    return counts, fs, os_


@partial(jax.jit, static_argnames=("voxel_size", "n_keep"))
def voxel_select_first(
    pos: jax.Array,  # (B, N, 3) float32
    mask: jax.Array,  # (B, N) bool
    *,
    voxel_size: float,
    n_keep: int,
) -> Tuple[jax.Array, jax.Array]:
    """On-device voxel-grid downsampling: first valid point per occupied
    voxel, identical selection semantics to ``io/resample.voxel_downsample``
    (reference workflow ``downsampling_point_clouds.py:128-183``): the kept
    set is the first-by-original-index representative of each voxel, and the
    kept order is ascending original index, so truncation to ``n_keep``
    matches the host path's ``kept[:n]`` exactly.

    Returns ``(idx, out_mask)`` with ``idx`` (B, n_keep) gather indices and
    ``out_mask`` False on slots past the representative count. Static-shape,
    fully jittable — built for the density pipeline (bench config 4), where
    the host voxel pass + per-batch transfer made the row tunnel-noise-bound.

    Envelope: int32 packed keys need ``(span_x*span_y*span_z) < 2^31`` —
    at 0.35 m voxels that is any extent under ~450 m per axis (plot clouds
    are ~30-50 m); degenerate larger extents belong to the host path.

    Precision note: quantization here is float32 (``floor(pos/voxel_size)``
    on-device) while the host path may quantize float64 — a coordinate
    whose quotient straddles a representability boundary can land in the
    adjacent voxel. Selection is identical whenever both paths agree on the
    quantization (always true for f32-valued inputs, which is what the
    pipeline feeds); the parity tests pin exactly that case.
    """
    b, n, _ = pos.shape

    def one(p, m):
        q = jnp.floor(p / voxel_size).astype(jnp.int32)
        qmin = jnp.min(jnp.where(m[:, None], q, jnp.int32(2**30)), axis=0)
        q = q - qmin
        span = jnp.max(jnp.where(m[:, None], q, -1), axis=0) + 1
        key = (q[:, 0] * span[1] + q[:, 1]) * span[2] + q[:, 2]
        # invalid points sort behind every real key and never match a voxel
        key = jnp.where(m, key, jnp.int32(2**31 - 1))
        order = jnp.argsort(key, stable=True)  # groups voxels; original
        # index ascends inside each group (stable)
        ks = key[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), ks[1:] != ks[:-1]]) & (ks < 2**31 - 1)
        rep = jnp.zeros((n,), bool).at[order].set(first)
        # compact to the first n_keep representatives in original order:
        # stable argsort of (not rep) lists reps first, index-ascending
        sel = jnp.argsort(~rep, stable=True)[:n_keep]
        return sel, rep[sel]

    return jax.vmap(one)(pos, mask)
