"""Batched, masked ball query (fixed-radius neighbor search).

TPU-native replacement for the torch_cluster CUDA kernel behind
``radius(pos, pos[idx], r, batch, batch[idx], max_num_neighbors=64)`` in the
reference model (``pointnet2_regressor.py:14-15``).

Instead of the reference's ragged edge list, this returns a dense padded neighbor
index matrix ``(B, M, K)`` plus a validity mask — the layout every downstream
grouping kernel wants on TPU.

Selection semantics: the reference CUDA kernel returns *up to* ``max_num_neighbors``
in-radius points in an implementation-defined order; we pin a deterministic rule —
the first K in-radius neighbors **by point index** (torch_cluster's CPU scan order).
Because upstream sampling randomizes point order, first-K-by-index is statistically
a uniform K-subset of the ball. The boundary test is inclusive (d <= r), matching
torch_cluster.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dl_biomass_tpu.core.cloud import round_up


def _ball_query_one(
    centers: jax.Array,  # (M, 3)
    center_mask: jax.Array,  # (M,)
    pos: jax.Array,  # (N, 3)
    mask: jax.Array,  # (N,)
    radius: float,
    k: int,
    chunk: int,
    approx: bool,
) -> Tuple[jax.Array, jax.Array]:
    m, n = centers.shape[0], pos.shape[0]
    k_eff = min(k, n)  # can't have more neighbors than points
    m_pad = round_up(m, chunk)
    centers_p = jnp.pad(centers, ((0, m_pad - m), (0, 0)))
    cmask_p = jnp.pad(center_mask, (0, m_pad - m))
    r2 = jnp.float32(radius) ** 2
    big = jnp.int32(n)  # sentinel: "no neighbor"
    order = lax.broadcasted_iota(jnp.int32, (chunk, n), 1)

    def one_chunk(args):
        c, cm = args  # (chunk, 3), (chunk,)
        # exact difference form: the matmul expansion (c.c - 2c.p + p.p) loses
        # ~1e-5 absolute to f32 cancellation, which flips points at the ball
        # boundary; XLA fuses this subtract-square-reduce so nothing of shape
        # (chunk, N, 3) is materialized.
        diff = c[:, None, :] - pos[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        ok = (d2 <= r2) & mask[None, :] & cm[:, None]
        keys = jnp.where(ok, order, big)
        # first K valid indices = K smallest keys
        if approx:
            # TPU PartialReduce top-k: ~6x faster than lax.top_k at N~10k.
            # Recall semantics: for balls with >k members a missed true first-K
            # entry is replaced by a later-index ball member (statistically
            # identical since point order is random); for balls with <=k
            # members a miss DROPS that neighbor (the sentinel wins the slot).
            # In practice the key pattern here (few small values in a sea of
            # sentinels) makes misses rare — and `method="exact"` / the parity
            # preset bypass this path entirely.
            vals, _ = lax.approx_min_k(keys.astype(jnp.float32), k_eff, recall_target=0.95)
            idx = vals.astype(jnp.int32)
        else:
            neg_topk, _ = lax.top_k(-keys, k_eff)
            idx = -neg_topk
        nbr_mask = idx < big
        idx = jnp.where(nbr_mask, idx, 0)
        if k_eff < k:
            idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
            nbr_mask = jnp.pad(nbr_mask, ((0, 0), (0, k - k_eff)))
        return idx, nbr_mask

    chunks_c = centers_p.reshape(m_pad // chunk, chunk, 3)
    chunks_m = cmask_p.reshape(m_pad // chunk, chunk)
    idx, nbr_mask = lax.map(one_chunk, (chunks_c, chunks_m))
    idx = idx.reshape(m_pad, k)[:m]
    nbr_mask = nbr_mask.reshape(m_pad, k)[:m]
    return idx, nbr_mask


@partial(jax.jit, static_argnames=("radius", "k", "chunk", "method"))
def ball_query(
    centers: jax.Array,
    center_mask: jax.Array,
    pos: jax.Array,
    mask: jax.Array,
    *,
    radius: float,
    k: int = 64,
    chunk: int = 256,
    method: str = "auto",  # auto | exact | approx
) -> Tuple[jax.Array, jax.Array]:
    """Batched fixed-radius neighbor search.

    Args:
      centers: (B, M, 3) query centroids.
      center_mask: (B, M) bool.
      pos: (B, N, 3) points searched.
      mask: (B, N) bool.
      radius: ball radius (inclusive).
      k: max neighbors per centroid (reference cap: 64).
      chunk: centroid tile size — bounds the (chunk, N) distance block so the
        full (M, N) distance matrix is never materialized.

    Returns:
      idx:      (B, M, K) int32 indices into the N axis (0 where invalid).
      nbr_mask: (B, M, K) bool validity.
    """
    if method == "auto":
        approx = jax.default_backend() == "tpu"
    else:
        approx = method == "approx"
    fn = lambda c, cm, p, pm: _ball_query_one(c, cm, p, pm, radius, k, chunk, approx)
    return jax.vmap(fn)(centers, center_mask, pos, mask)
