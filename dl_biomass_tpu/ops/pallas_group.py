"""Fused ball-query + neighbor-gather Pallas kernel (stratified selection).

This is the fast path for set-abstraction grouping: ONE kernel replaces the
ball-query selection AND the neighborhood gather, never materializing per-edge
index/key tensors in HBM.

Selection rule (deterministic, documented): points are partitioned into 128
residue buckets (index mod 128); output slot j in [0, 64) holds the smallest
in-radius point index whose residue is j or j+64. Properties:

  * every returned neighbor is in-radius; slots with no in-radius point in
    their residue pair are masked out;
  * for balls with >= 64 points this is a *stratified* ~64-sample of the ball
    (point order is random upstream, so residues are uniform) — statistically
    equivalent to the reference's cap of "first 64 by index", which is itself a
    uniform 64-subset;
  * for balls with m < 64 points, expected capture is m*(1 - m/256)-ish —
    a few members can be shadowed by a same-residue-pair smaller index. The
    downstream masked max over ~m similar features is insensitive to this; the
    exact-selection jnp path (ops/ballquery.py) remains the default off-TPU and
    for parity testing.

Why R=1 with paired buckets instead of the exact multi-round kernel
(ops/pallas_ballquery.py): the exact kernel's 64-iteration merge loop is
issue-bound on the VPU (measured 85 ms vs approx_min_k's 44 ms at SA1 scale);
this kernel is pure wide vector passes — distance, one bucket-min reduce, one
value-match, and one masked reduce per captured plane (~6 ms at SA1 scale).

The kernel also CAPTURES up to 4 value planes (x, y, z, feature) at the
selected points via the value-match trick (keys are unique indices, so
``keys == selected`` is an exact one-hot), so downstream XLA never gathers.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dl_biomass_tpu.core.cloud import round_up

_G = 128  # residue buckets
_K = 64  # output slots (= reference max_num_neighbors)
_CM = 64  # centroids per inner tile (round-5 sweep: 6.56 ms vs 6.74 at 32,
# flat beyond 64 — tools-level sweep at B=36 SA1 scale)


def stratified_pair_select(keys: jax.Array, big) -> Tuple[jax.Array, jax.Array]:
    """THE stratified selection rule, shared by every kernel that claims it.

    ``keys`` (CM, L, G): point index where in-radius/valid, else ``big``.
    Returns ``pair`` (CM, K) — the smallest key per residue pair j/j+64
    (``big`` where the pair holds no in-radius point) — and ``hit``
    (CM, L, G) f32, the value-capture one-hot ``keys == selected``.

    Aliasing contract: for slots with ``pair == big`` the hit matrix matches
    EVERY exhausted ``key == big`` entry, so captured sums over ``hit`` hold
    unmasked garbage there — consumers must mask by ``pair < big`` (or an
    equivalent) before any reduction that feeds real outputs.

    Lives here (not in the kernels) so ball_group_pallas and the fused eval
    SA1 kernel (ops/pallas_sa_eval.py) cannot drift apart semantically.
    """
    bmin = jnp.min(keys, axis=1)  # (CM, G): first in-radius per residue
    # pair residue j with j+64 (contiguous halves -> plain lane slices)
    pair = jnp.minimum(bmin[:, :_K], bmin[:, _K:])  # (CM, K)
    sel128 = jnp.concatenate([pair, pair], axis=1)  # (CM, G)
    hit = (keys == sel128[:, None, :]).astype(jnp.float32)  # (CM, L, G)
    return pair, hit


def _kernel(*refs, radius2: float, n: int, n_feat: int, m: int, l_dim: int,
            need_idx: bool):
    px_ref, py_ref, pz_ref, valid_ref = refs[:4]
    feat_refs = refs[4 : 4 + n_feat]
    cx_ref, cy_ref, cz_ref, cvalid_ref = refs[4 + n_feat : 8 + n_feat]
    out_idx_ref = refs[8 + n_feat]
    out_plane_refs = refs[9 + n_feat :]  # x, y, z, then features
    plane_refs = (px_ref, py_ref, pz_ref) + tuple(feat_refs)

    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]  # (L, G)
    pvalid = valid_ref[0] > 0.5
    big = jnp.int32(n)
    gidx = (
        lax.broadcasted_iota(jnp.int32, (l_dim, _G), 0) * _G
        + lax.broadcasted_iota(jnp.int32, (l_dim, _G), 1)
    )
    base_keys = jnp.where(pvalid & (gidx < n), gidx, big)

    def tile(t, _):
        sl = pl.ds(pl.multiple_of(t * _CM, _CM), _CM)
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

        # selection + value-capture one-hot: the shared rule (see
        # stratified_pair_select for the aliasing contract). All planes are
        # captured in ONE stacked reduction — reduction issue latency, not
        # FLOPs, bounds this loop.
        pair, hit = stratified_pair_select(keys, big)
        if need_idx:
            out_idx_ref[0, sl, :] = pair
        else:
            # the model path derives only (pair < n) from idx; storing the
            # 0/1 validity in the plane dtype instead of int32 indices cuts
            # the kernel's DMA-capped output bytes (its bottleneck) by ~25%
            out_idx_ref[0, sl, :] = (pair < big).astype(out_idx_ref.dtype)
        planes = jnp.stack([pr[0] for pr in plane_refs])  # (P, L, G)
        cap = jnp.sum(hit[None] * planes[:, None], axis=2)  # (P, CM, G)
        cap = cap[:, :, :_K] + cap[:, :, _K:]  # (P, CM, K)
        # coord planes leave the kernel CENTERED (pos_j - pos_i): relative
        # values are small, so the store dtype (bf16 in production) loses no
        # precision vs the old store-absolute-then-subtract-outside path —
        # and the output DMA is the kernel's bottleneck (26 GB/s cap), so
        # halving it matters more than the 3 subtracts
        centers_t = (cx[:, :, 0], cy[:, :, 0], cz[:, :, 0])  # (CM, 1)
        for pi, outr in enumerate(out_plane_refs):
            v = cap[pi] - centers_t[pi] if pi < 3 else cap[pi]
            outr[0, sl, :] = v.astype(outr.dtype)
        return 0

    lax.fori_loop(0, m // _CM, tile, 0, unroll=False)


@partial(jax.jit, static_argnames=("radius", "interpret", "raw_planes",
                                   "compute_dtype", "need_idx"))
def ball_group_pallas(
    centers: jax.Array,  # (B, M, 3)
    center_mask: jax.Array,  # (B, M)
    pos: jax.Array,  # (B, N, 3)
    mask: jax.Array,  # (B, N)
    feat: Optional[jax.Array] = None,  # (B, N, F) with F <= 1 captured per plane
    *,
    radius: float,
    interpret: bool | None = None,
    raw_planes: bool = False,
    compute_dtype=jnp.float32,
    need_idx: bool = True,
) -> Tuple[jax.Array, ...]:
    """Fused stratified ball query + gather.

    Returns:
      idx:      (B, M, 64) int32 neighbor indices (0 where invalid)
      nbr_mask: (B, M, 64) bool
      rel:      (B, M, 64, 3) gathered positions relative to each centroid
      gfeat:    (B, M, 64, F) gathered features (F = feat planes captured)

    ``need_idx=False`` replaces the int32 index plane with an in-kernel 0/1
    validity plane in the store dtype and returns ``idx=None`` — every
    production consumer (models/pointnet2.py, models/inference.py) derives
    only ``idx < n`` from idx, and the kernel's output DMA is its bottleneck,
    so not storing 4-byte indices nobody reads cuts its bytes ~25%.

    ``compute_dtype`` sets the captured-plane store dtype: the kernel's output
    DMA is its bottleneck (26 GB/s Pallas cap), and the SA MLP casts its edge
    inputs to the compute dtype anyway, so bf16 stores halve the DMA while
    feeding the MLP bit-identical values (rel is centered in-kernel, so its
    small values round cleanly).

    ``raw_planes=True`` skips the channel stacking and returns
    ``(idx, nbr_mask, (rx, ry, rz), feat_planes)`` with each plane (B, M, 64)
    exactly as the kernel wrote it (coords already centroid-relative) — the
    layout the fused SA MLP kernels consume (ops/pallas_sa_train.py), avoiding
    the 3-wide minor-dim arrays that pad to 128 lanes in HBM.
    """
    b, m, _ = centers.shape
    n = pos.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dt = jnp.dtype(compute_dtype)

    n_pad = round_up(n, _G)
    l_dim = n_pad // _G
    m_pad = round_up(m, _CM)

    def plane(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n))).reshape(b, l_dim, _G)

    feat_planes = []
    f_dim = 0
    if feat is not None:
        f_dim = feat.shape[-1]
        feat_planes = [plane(feat[..., c]) for c in range(f_dim)]
    n_out_planes = 3 + f_dim  # captured: x, y, z, features

    def cplane(x):
        return jnp.pad(x, ((0, 0), (0, m_pad - m)))[:, :, None]

    p_spec = pl.BlockSpec((1, l_dim, _G), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, m_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, m_pad, _K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        partial(_kernel, radius2=float(radius) ** 2, n=n, n_feat=f_dim,
                m=m_pad, l_dim=l_dim, need_idx=need_idx),
        grid=(b,),
        in_specs=[p_spec] * (4 + f_dim) + [c_spec] * 4,
        out_specs=[o_spec] * (1 + n_out_planes),
        out_shape=[jax.ShapeDtypeStruct((b, m_pad, _K),
                                        jnp.int32 if need_idx else out_dt)]
        + [jax.ShapeDtypeStruct((b, m_pad, _K), out_dt)] * n_out_planes,
        interpret=interpret,
        # the MSG second-scale instance sits 160 KB over the 16 MB scoped
        # default (extra captured planes); v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
    )(
        plane(pos[..., 0]), plane(pos[..., 1]), plane(pos[..., 2]),
        plane(mask.astype(jnp.float32)),
        *feat_planes,
        cplane(centers[..., 0]), cplane(centers[..., 1]), cplane(centers[..., 2]),
        cplane(center_mask.astype(jnp.float32)),
    )
    if need_idx:
        idx_raw = outs[0][:, :m]
        nbr_mask = idx_raw < n
        idx = jnp.where(nbr_mask, idx_raw, 0)
    else:
        nbr_mask = outs[0][:, :m] > 0.5
        idx = None
    rx, ry, rz = (o[:, :m] for o in outs[1:4])  # centroid-relative coords
    z = jnp.zeros((), out_dt)
    if raw_planes:
        # invalid slots hold the kernel's unmasked accumulated sums (the hit
        # matrix matches every exhausted key==big entry); zero them so any
        # non-finite garbage can't leak into downstream batch statistics even
        # when the consumer skips its own masking
        rx, ry, rz = (jnp.where(nbr_mask, g, z) for g in (rx, ry, rz))
        return idx, nbr_mask, (rx, ry, rz), tuple(
            jnp.where(nbr_mask, o[:, :m], z) for o in outs[4:]
        )
    rel = jnp.stack([rx, ry, rz], axis=-1)
    rel = jnp.where(nbr_mask[..., None], rel, z)
    if f_dim:
        gfeat = jnp.stack([o[:, :m] for o in outs[4:]], axis=-1)
        gfeat = jnp.where(nbr_mask[..., None], gfeat, z)
    else:
        gfeat = jnp.zeros((b, m, _K, 0), out_dt)
    return idx, nbr_mask, rel, gfeat
