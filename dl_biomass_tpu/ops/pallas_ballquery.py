"""Fused Pallas TPU kernel for ball query (fixed-radius first-K neighbors).

TPU equivalent of the torch_cluster CUDA kernel behind ``radius(..., max_num_
neighbors=64)`` in the reference model (``pointnet2_regressor.py:14-15``).

The XLA path (ops/ballquery.py) materializes a (B, M, N) key tensor in HBM and
runs top-k / approx_min_k over the point axis — ~17-50 ms at SA1 scale
(B=16, M=2048, N=10240, K=64). This kernel keeps everything in VMEM.

Algorithm (round 3 — replaces the issue-bound 64-iteration ascending merge of
the round-1/2 kernel, measured 27.7 ms -> ~10 ms at SA1 scale):

  * layout: point planes ``(L, G)`` with G=128 residue buckets; global index
    of element (l, g) = l*G + g, so per-bucket reductions are lane operations;
  * the GLOBAL RANK of every in-radius point (its position in the ascending
    first-K order) is computed directly with two prefix-count matmuls on the
    MXU: a within-row exclusive prefix against a strictly-lower-triangular
    (G, G) ones matrix, plus an exclusive row-prefix against an (L, L) one
    (0/1 bf16 operands, f32 accumulation — exact integer counts);
  * rank (capped at K) and key are packed into ONE int32
    ``min(rank, K) << 24 | key``; R=8 extraction rounds take each bucket's
    packed minimum (= smallest remaining key, since rank is monotone in key
    within a bucket) — 3 vector passes per round, no per-round rank capture;
  * scatter: output slot j is the candidate whose rank == j. The candidate
    ranks are compared against a SUBLANE iota (K on sublanes, buckets staying
    on lanes — no lane<->sublane relayout of bulk data), the matching key is
    where-captured, and one final lane min-reduce compacts to (CM, K).
    Output is ascending by construction, identical to the jnp exact path.

Selection semantics: identical to the jnp exact path (first-K in-radius by
point index, ascending) whenever no residue class holds more than R members of
the true first-K. For K=64, G=128, R=8 and randomly-ordered clouds the
per-query exception probability is ~4e-7 (binomial tail: some bucket drawing
>=9 of the 64 winners); when it fires, the overflowed neighbors' slots come up
empty (masked off) rather than swapped. The jnp path remains the oracle in
tests; parity is asserted index-exact on random clouds.
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
_CM = 32  # centroids per tile
_R = 8  # extraction rounds -> up to R first-K members per bucket
_KEY_BITS = 24  # packed layout: rank << 24 | key  (needs n < 2^24)
_INT_BIG_PY = 0x7FFFFFFF  # int32 max: exceeds any packed (rank, key)


def _bq_kernel(px_ref, py_ref, pz_ref, valid_ref, cx_ref, cy_ref, cz_ref,
               cvalid_ref, out_ref, *, radius2: float, k: int, n: int,
               cm: int = _CM):
    l_dim, g_dim = px_ref.shape[1], px_ref.shape[2]
    m = cx_ref.shape[1]  # centers laid out (1, M, 1): M on the sublane dim
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]  # (L, G)
    pvalid = valid_ref[0] > 0.5
    big_key = jnp.int32(n)
    gidx = (
        lax.broadcasted_iota(jnp.int32, (l_dim, g_dim), 0) * g_dim
        + lax.broadcasted_iota(jnp.int32, (l_dim, g_dim), 1)
    )
    inb = pvalid & (gidx < n)  # valid, in-bounds points only: padded slots
    # must not count toward ranks or match any centroid

    # strictly-lower-triangular prefix-count matrices; 0/1 bf16 entries make
    # the MXU products exact, f32 accumulation keeps integer sums exact
    slt_g = (lax.broadcasted_iota(jnp.int32, (g_dim, g_dim), 0)
             < lax.broadcasted_iota(jnp.int32, (g_dim, g_dim), 1)).astype(jnp.bfloat16)
    slt_l = (lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 0)
             < lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 1)).astype(jnp.bfloat16)

    int_big = jnp.int32(_INT_BIG_PY)
    kio = lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)  # K on SUBLANES
    rrow = lax.broadcasted_iota(jnp.int32, (cm, _R, g_dim), 1)

    def tile(t, _):
        sl = pl.ds(pl.multiple_of(t * cm, cm), cm)
        cx = cx_ref[0, sl, :][:, :, None]  # (CM,1,1)
        cy = cy_ref[0, sl, :][:, :, None]
        cz = cz_ref[0, sl, :][:, :, None]
        cok = (cvalid_ref[0, sl, :] > 0.5)[:, :, None]
        dx = px[None] - cx
        dy = py[None] - cy
        dz = pz[None] - cz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= radius2) & cok & inb[None]  # (CM, L, G)

        # global rank = # in-radius points with a smaller index
        okb = ok.astype(jnp.bfloat16)
        pre_g = jax.lax.dot_general(  # within-row exclusive prefix (lanes)
            okb, slt_g, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CM, L, G)
        rowcnt = jnp.sum(okb.astype(jnp.float32), axis=2)  # (CM, L)
        pre_l = jax.lax.dot_general(  # exclusive row prefix
            rowcnt.astype(jnp.bfloat16), slt_l, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CM, L)
        rank = jnp.minimum(pre_l[:, :, None] + pre_g, jnp.float32(k))

        # pack (rank, key): min over packed = smallest remaining key per bucket
        packed = (rank.astype(jnp.int32) << _KEY_BITS) | gidx[None]
        val = jnp.where(ok, packed, int_big)

        def rnd(r, carry):
            val_cur, cand = carry
            bmin = jnp.min(val_cur, axis=1)  # (CM, G)
            cand = jnp.where(rrow == r, bmin[:, None, :], cand)
            val_cur = jnp.where(val_cur == bmin[:, None, :], int_big, val_cur)
            return val_cur, cand

        cand0 = jnp.full((cm, _R, g_dim), _INT_BIG_PY, jnp.int32)
        _, cand = lax.fori_loop(0, _R, rnd, (val, cand0))

        # rank-match scatter: slot j <- the candidate with rank == j.
        # K runs on sublanes so candidate lanes (buckets) never relayout;
        # at most one candidate matches a given (centroid, slot), so a
        # where-capture + one final lane min-reduce replaces any summation.
        acc = jnp.full((cm, k, g_dim), big_key, jnp.int32)
        for r in range(_R):
            cand_r = lax.index_in_dim(cand, r, axis=1, keepdims=False)  # (CM, G)
            cr = cand_r >> _KEY_BITS  # rank (>= k for exhausted/overflow)
            ckey = cand_r & ((1 << _KEY_BITS) - 1)
            eq = cr[:, None, :] == kio  # (CM, K, G)
            acc = jnp.where(eq, ckey[:, None, :], acc)
        out_ref[0, sl, :] = jnp.min(acc, axis=2)  # (CM, K) ascending
        return 0

    lax.fori_loop(0, m // cm, tile, 0, unroll=False)


@partial(jax.jit, static_argnames=("radius", "k", "interpret", "cm"))
def ball_query_pallas(
    centers: jax.Array,  # (B, M, 3)
    center_mask: jax.Array,  # (B, M)
    pos: jax.Array,  # (B, N, 3)
    mask: jax.Array,  # (B, N)
    *,
    radius: float,
    k: int = 64,
    interpret: bool | None = None,
    cm: int = _CM,  # centroids per inner tile (perf knob, semantics-free)
) -> Tuple[jax.Array, jax.Array]:
    """Same contract as ops.ballquery.ball_query (exact first-K semantics)."""
    b, m, _ = centers.shape
    n = pos.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n >= (1 << _KEY_BITS):
        raise ValueError(f"n={n} exceeds the packed-key budget 2^{_KEY_BITS}")
    if k >= 128:
        # the packed value min(rank, k) << 24 must stay below 2^31: k=128
        # makes over-rank entries negative, and they would win every
        # extraction round and displace all real candidates
        raise ValueError(f"k={k} >= 128 unsupported (rank<<24 packing)")

    n_pad = round_up(n, _G)
    l_dim = n_pad // _G
    m_pad = round_up(m, cm)

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
        partial(_bq_kernel, radius2=float(radius) ** 2, k=k, n=n, cm=cm),
        grid=(b,),
        in_specs=[p_spec, p_spec, p_spec, p_spec, c_spec, c_spec, c_spec, c_spec],
        out_specs=pl.BlockSpec((1, m_pad, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, k), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(px, py, pz, pv, cx, cy, cz, cv)
    out = out[:, :m]
    nbr_mask = out < n
    return jnp.where(nbr_mask, out, 0), nbr_mask
