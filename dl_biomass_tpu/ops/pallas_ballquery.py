"""Fused Pallas TPU kernel for ball query (fixed-radius first-K neighbors).

TPU equivalent of the torch_cluster CUDA kernel behind ``radius(..., max_num_
neighbors=64)`` in the reference model (``pointnet2_regressor.py:14-15``).

The XLA path (ops/ballquery.py) materializes a (B, M, N) key tensor in HBM and
runs top-k / approx_min_k over the point axis — ~50-320 ms at SA1 scale
(B=16, M=2048, N=10240, K=64). This kernel keeps everything in VMEM:

  * point planes arrive pre-reshaped as (L, G) with G=128 residue buckets
    (global index of element (l, g) = l*G + g), so per-bucket reductions are
    clean lane operations;
  * per 8-centroid tile: squared distances -> validity -> keys
    (= global index where in-radius, else BIG);
  * R rounds of bucket extraction: take each bucket's current minimum
    (a (8, L, G) reduce), append the G minima to a candidate block, and remove
    them with ONE elementwise compare (keys == bucket_min) — index keys are
    unique, so removal-by-value is exact;
  * merge: K iterations of min-extraction over the (8, R*G) candidates.

Selection semantics: identical to the jnp path (first-K in-radius by point
index, ascending) whenever no residue class holds more than R members of the
true first-K. For K=64, G=128, R=8 and the randomly-ordered clouds this
pipeline feeds, the exception probability is ~1e-9 per query — and when it
fires, one in-ball neighbor is swapped for another in-ball neighbor (the
downstream max-pool is order- and, statistically, member-invariant).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dl_biomass_tpu.core.cloud import round_up

_G = 128  # residue buckets (lane width)
_CM = 32  # centroids per tile (wider tiles amortize the extraction loops)
_R = 8  # extraction rounds -> R*G candidates per centroid


def _bq_kernel(px_ref, py_ref, pz_ref, valid_ref, cx_ref, cy_ref, cz_ref,
               cvalid_ref, out_ref, *, radius2: float, k: int, n: int):
    l_dim, g_dim = px_ref.shape[1], px_ref.shape[2]
    m = cx_ref.shape[1]  # centers laid out (1, M, 1): M on the sublane dim,
    # because Mosaic only allows dynamic slicing at sublane granularity
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]  # (L, G)
    pvalid = valid_ref[0] > 0.5
    big = jnp.int32(n)
    # global index of element (l, g) = l*G + g
    gidx = (
        lax.broadcasted_iota(jnp.int32, (l_dim, g_dim), 0) * g_dim
        + lax.broadcasted_iota(jnp.int32, (l_dim, g_dim), 1)
    )
    base_keys = jnp.where(pvalid & (gidx < n), gidx, big)

    kcol = lax.broadcasted_iota(jnp.int32, (_CM, k), 1)
    rrow = lax.broadcasted_iota(jnp.int32, (_CM, _R, g_dim), 1)

    def tile(t, _):
        sl = pl.ds(pl.multiple_of(t * _CM, _CM), _CM)
        # keep every intermediate rank>=2 (Mosaic layout assertions fire on 1-D)
        cx = cx_ref[0, sl, :][:, :, None]  # (CM,1,1)
        cy = cy_ref[0, sl, :][:, :, None]
        cz = cz_ref[0, sl, :][:, :, None]
        cok = (cvalid_ref[0, sl, :] > 0.5)[:, :, None]
        dx = px[None] - cx
        dy = py[None] - cy
        dz = pz[None] - cz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= radius2) & cok
        keys = jnp.where(ok, base_keys[None], big)  # (CM, L, G)

        # R rounds of per-bucket minima
        def rnd(r, carry):
            keys, cands = carry
            bmin = jnp.min(keys, axis=1)  # (CM, G)
            cands = jnp.where(rrow == r, bmin[:, None, :], cands)
            keys = jnp.where(keys == bmin[:, None, :], big, keys)
            return keys, cands

        cands0 = jnp.full((_CM, _R, g_dim), big, jnp.int32)
        _, cands = lax.fori_loop(0, _R, rnd, (keys, cands0))

        # merge: K ascending extractions over the R*G candidates
        def ext(i, carry):
            cands, acc = carry
            cur = jnp.min(jnp.min(cands, axis=2, keepdims=True), axis=1, keepdims=True)
            acc = jnp.where(kcol == i, cur[:, :, 0], acc)  # (CM,1,1)->(CM,1)
            cands = jnp.where(cands == cur, big, cands)
            return cands, acc

        acc0 = jnp.full((_CM, k), big, jnp.int32)
        _, acc = lax.fori_loop(0, k, ext, (cands, acc0))
        out_ref[0, sl, :] = acc
        return 0

    lax.fori_loop(0, m // _CM, tile, 0, unroll=False)


@partial(jax.jit, static_argnames=("radius", "k", "interpret"))
def ball_query_pallas(
    centers: jax.Array,  # (B, M, 3)
    center_mask: jax.Array,  # (B, M)
    pos: jax.Array,  # (B, N, 3)
    mask: jax.Array,  # (B, N)
    *,
    radius: float,
    k: int = 64,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Same contract as ops.ballquery.ball_query."""
    b, m, _ = centers.shape
    n = pos.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if k > _R * _G:
        raise ValueError(f"k={k} exceeds kernel candidate budget {_R * _G}")

    n_pad = round_up(n, _G)
    l_dim = n_pad // _G
    m_pad = round_up(m, _CM)

    def plane(x, pad_val=0.0):
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)), constant_values=pad_val)
        return x.reshape(b, l_dim, _G)

    px = plane(pos[..., 0])
    py = plane(pos[..., 1])
    pz = plane(pos[..., 2])
    pv = plane(mask.astype(jnp.float32))
    cx = jnp.pad(centers[..., 0], ((0, 0), (0, m_pad - m)))[:, :, None]
    cy = jnp.pad(centers[..., 1], ((0, 0), (0, m_pad - m)))[:, :, None]
    cz = jnp.pad(centers[..., 2], ((0, 0), (0, m_pad - m)))[:, :, None]
    cv = jnp.pad(center_mask.astype(jnp.float32), ((0, 0), (0, m_pad - m)))[:, :, None]

    p_spec = pl.BlockSpec((1, l_dim, _G), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, m_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_bq_kernel, radius2=float(radius) ** 2, k=k, n=n),
        grid=(b,),
        in_specs=[p_spec, p_spec, p_spec, p_spec, c_spec, c_spec, c_spec, c_spec],
        out_specs=pl.BlockSpec((1, m_pad, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, k), jnp.int32),
        interpret=interpret,
    )(px, py, pz, pv, cx, cy, cz, cv)
    out = out[:, :m]
    nbr_mask = out < n
    return jnp.where(nbr_mask, out, 0), nbr_mask
