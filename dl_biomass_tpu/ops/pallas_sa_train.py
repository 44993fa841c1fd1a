"""Fused train-mode set-abstraction MLP (Pallas TPU).

Replaces the whole per-edge stack of a PointNet++ SA layer in training —
``MLP([C0, C1, C2, C3])`` with BatchNorm+act on the two hidden layers
(torch_geometric MLP semantics, reference ``pointnet2_regressor.py:46-50``)
followed by the masked max over the K neighbor axis (PointConv's max
aggregation, reference ``pointnet2_regressor.py:10,18``) — with kernels that
keep every per-edge activation in VMEM. The (B, M, K, C) edge tensors that
dominate the unfused train step's HBM traffic (>20 ms/step at flagship scale)
are never materialized.

Input layout — the edge features arrive in two HBM-friendly forms and are only
combined inside VMEM:

  * ``dense``  (B, M, K, CD): wide feature block, lane-dim CD is 128-ish
    (SA2's gathered 128-channel features) — stored densely;
  * ``planes`` CP x (B, M, K): narrow channels (SA1's [feat, dx, dy, dz];
    SA2's relative positions). They are packed — together with the
    edge-validity mask as one extra channel — into a TRANSPOSED block
    ``x_t (B, CP+1, M*K)`` whose minor dim is the 128-divisible edge-row
    axis, so HBM stores it densely. (A (B, M, K, 4) array would pad its
    4-wide minor dim to 128 lanes — 25x the bytes on every one of the ~6
    passes.) The kernel consumes x_t directly on the MXU: a transposed
    contraction against W1's plane rows (mask row zeroed), and the mask
    column itself falls out of a one-hot dot.

  Channel order in W1 is [dense channels..., plane channels...].

Grid discipline (the environment-defining constraint): ONE grid step per
batch item, with a lax.fori_loop over centroid tiles inside the kernel. On
this stack every Pallas grid step carries multi-microsecond fixed overhead
(measured: a (b, tiles) grid at flagship scale spent more time stepping than
computing and LOST to the unfused XLA path by 10 ms); per-item blocks with an
internal tile loop run the same math with 16 steps per pass instead of 256+.
The loop is a fori (not a static unroll): unrolling let the scheduler overlap
every tile's live set and blew VMEM 180 MB > 128 MB. Tiles are addressed with
aligned SUBLANE-dim pl.ds slices (pl.multiple_of hints) — the one dynamic-
indexing form Mosaic lowers to plain address arithmetic; dynamic indexing of
untiled leading dims measured ~115 us per loop iteration. Hence every per-item
operand is laid out 2-D with the tile axis on sublanes: x_t (B, NT*8, rows)
f32 (CT padded to the 8-row f32 sublane tile; cast to bf16 at the matmul),
dense (B, Mpad*K, CD), cotangent/argmax/out (B, Mpad, C3). All per-edge
intermediates live as (rows = MT*K, C) tiles (lane = channel, dense for C in
{64, 128, 256}).

Structure — BatchNorm needs global batch statistics, so the op runs as a
pipeline of Pallas passes with tiny XLA vector glue:

  forward:  F1: h1 = x W1 + b1;            accumulate sum/sumsq of h1
            F2: recompute h1 -> a1; h2 = a1 W2 + b2; accumulate sum/sumsq
            F3: recompute chain -> h3 = a2 W3 + b3; masked max + argmax over K

  backward (custom VJP; recompute-everything — only the (B, M, C3) cotangent
  and argmax indices are read back from HBM):
            B1: scatter g to argmax slots (gs); dW3, db3; da2 -> db2n;
                accumulate dbeta2 = sum(db2n), dgamma2 = sum(db2n * xhat2)
            B2: dh2 = gamma2 inv2 (db2n - t2a - xhat2 t2b); dW2, db2;
                da1 -> db1n; accumulate dbeta1, dgamma1
            B3: dh1; dW1 (dense block + plane rows), db1; d(dense) = dh1 W1d^T

Statistics use the one-pass sum/sumsq form — identical semantics to
``models/layers.MaskedBatchNorm`` (biased var to normalize; the caller derives
the unbiased running update).

Gradient contract: ``dense`` gets its full cotangent (SA2's features flow back
through the gather's scatter-add); ``planes`` are data-only (SA-layer relative
positions / raw point features — no parameters upstream) and receive zeros.

Masking: invalid edges contribute to no statistic, no gradient, and lose the
max (argmax = -1 for a centroid with no valid neighbor, which zeroes its
backward scatter — matching ``masked_max``'s zero fill). The caller must zero
invalid ``dense`` rows (the grouping paths already do).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dl_biomass_tpu.core.cloud import round_up

_K = 64  # neighbor slots (= reference max_num_neighbors)


class SADims(NamedTuple):
    cd: int  # dense input channels (0 = no dense block)
    cp: int  # plane input channels
    c1: int
    c2: int
    c3: int
    mt: int  # centroids per tile (static in-kernel loop granularity)
    nt: int  # number of tiles (M_pad // mt)
    act: str
    bf16: bool
    f64: bool = False  # x64 parity testing (CPU interpret only)
    train_bn: bool = True  # batch statistics (train) vs provided running stats
    # (eval); eval backward is the same pipeline with the BN mean/var
    # correction terms zeroed (running stats are constants w.r.t. the batch)
    interp: bool = False  # interpret mode (CPU): plain f32 dots, no bf16 split

    @property
    def acc(self):
        return jnp.float64 if self.f64 else jnp.float32

    @property
    def ct(self):
        return self.cp + 1  # plane channels + mask channel

    @property
    def ctp(self):
        return 8  # CT padded to the f32 sublane tile (zero rows; see _tile_xs)

    @property
    def rows(self):
        return self.mt * _K


def _act(z, name):
    if name is None or name == "None":
        return z
    if name == "ReLU":
        return jnp.maximum(z, 0.0)
    if name == "LeakyReLU":
        return jnp.where(z > 0, z, 0.01 * z)
    if name == "ELU":
        return jnp.where(z > 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)
    raise ValueError(f"fused SA kernel: unsupported activation {name!r}")


def _act_deriv(z, name):
    if name is None or name == "None":
        return jnp.ones_like(z)
    if name == "ReLU":
        return (z > 0).astype(z.dtype)
    if name == "LeakyReLU":
        return jnp.where(z > 0, 1.0, 0.01)
    if name == "ELU":
        return jnp.where(z > 0, 1.0, jnp.exp(jnp.minimum(z, 0.0)))
    raise ValueError(f"fused SA kernel: unsupported activation {name!r}")


def _dot2(a2, b2, dims: SADims, dn):
    """2-D contraction in the compute dtype with f32 (f64 under x64) accum.

    bf16 mode: one MXU pass (production path). f64 / interpret: plain dot.
    f32: an explicit bf16x3 split — hi/lo decomposition with three single-pass
    bf16 MXU matmuls and f32 accumulation (~1e-5 relative, f32-grade).
    Explicit because Mosaic's precision flags are shape-dependent on v5e
    (measured: HIGHEST is accurate for 128-wide outputs but falls back to
    single-pass bf16 for 64-wide ones, and vice versa for DEFAULT), so the
    split is the only lowering that is accurate for every SA-layer shape."""
    if dims.f64 or (dims.interp and not dims.bf16):
        return lax.dot_general(a2, b2, dimension_numbers=dn,
                               preferred_element_type=dims.acc,
                               precision=lax.Precision.HIGHEST)

    def bf16_dot(x, y):
        return lax.dot_general(
            x.astype(jnp.bfloat16), y.astype(jnp.bfloat16), dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )

    if dims.bf16:
        return bf16_dot(a2, b2)
    a2 = a2.astype(jnp.float32)
    b2 = b2.astype(jnp.float32)
    ah = a2.astype(jnp.bfloat16).astype(jnp.float32)
    bh = b2.astype(jnp.bfloat16).astype(jnp.float32)
    return bf16_dot(a2 - ah, b2) + (bf16_dot(a2, b2 - bh) + bf16_dot(a2, b2))


# 2-D contraction shapes used below:
_DN_STD = (((1,), (0,)), ((), ()))   # (R, A) x (A, B) -> (R, B)
_DN_WT = (((1,), (1,)), ((), ()))    # (R, A) x (B, A) -> (R, B)   [x W^T]
_DN_T = (((0,), (0,)), ((), ()))     # (A, R) x (A, B) -> (R, B)   [transposed lhs]
_DN_EDGE = (((0,), (0,)), ((), ()))  # (R, A) x (R, B) -> (A, B)   [over edges]


class _Tile(NamedTuple):
    """Per-tile VMEM views: everything the layer math needs."""

    dense: Optional[jax.Array]  # (rows, CD) or None
    xt: jax.Array  # (CT, rows)
    mask: jax.Array  # (rows, 1) in acc dtype


def _unpack(refs, dims: SADims):
    """Split the ref list into (dense_ref?, xt_ref, emask_ref, rest)."""
    i = 0
    dense_ref = None
    if dims.cd:
        dense_ref = refs[i]
        i += 1
    return dense_ref, refs[i], refs[i + 1], refs[i + 2 :]


def _tile_view(dense_ref, xt_ref, emask_ref, t, dims: SADims) -> _Tile:
    """Tile t of the per-item blocks via aligned sublane-dim slices (t may be
    a traced fori index).

    The mask column is extracted from x_t's last channel by a one-hot MXU dot
    — a lane->sublane transpose on the VPU is far slower."""
    ctp = dims.ctp
    xt = xt_ref[0, pl.ds(pl.multiple_of(t * ctp, ctp), ctp), :]  # (CTP, rows)
    dense = None
    if dims.cd:
        r = dims.rows
        dense = dense_ref[0, pl.ds(pl.multiple_of(t * r, r), r), :]  # (rows, CD)
    mask = _dot2(xt, emask_ref[:], dims, _DN_T)  # (rows, 1)
    return _Tile(dense, xt, mask)


def _h1(tile: _Tile, w1d_ref, w1p_ref, b1_ref, dims: SADims):
    """h1 = [dense, planes] @ W1 + b1, channel order dense-then-planes.
    w1p is W1's plane rows padded with a zero row for the mask channel, so the
    transposed x_t block multiplies through in one MXU contraction."""
    h1 = _dot2(tile.xt, w1p_ref[:], dims, _DN_T)  # (rows, C1)
    if dims.cd:
        h1 = h1 + _dot2(tile.dense, w1d_ref[:], dims, _DN_STD)
    return h1 + b1_ref[0].astype(dims.acc)


def _w1_refs(rest, dims: SADims):
    """Pop [w1d?] + w1p from the front of the remaining refs."""
    if dims.cd:
        return rest[0], rest[1], rest[2:]
    return None, rest[0], rest[1:]


def _is_first():
    return pl.program_id(0) == 0


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _f1_kernel(*refs, dims: SADims):
    dense_ref, xt_ref, emask_ref, rest = _unpack(refs, dims)
    w1d_ref, w1p_ref, rest = _w1_refs(rest, dims)
    b1_ref, s_ref, ss_ref = rest

    @pl.when(_is_first())
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        ss_ref[...] = jnp.zeros_like(ss_ref)

    def body(t, _):
        tile = _tile_view(dense_ref, xt_ref, emask_ref, t, dims)
        h1 = _h1(tile, w1d_ref, w1p_ref, b1_ref, dims)
        hm = h1 * tile.mask
        s_ref[0, :] += jnp.sum(hm, axis=0)
        ss_ref[0, :] += jnp.sum(hm * h1, axis=0)
        return 0

    lax.fori_loop(0, dims.nt, body, 0, unroll=False)


def _f2_kernel(*refs, dims: SADims):
    dense_ref, xt_ref, emask_ref, rest = _unpack(refs, dims)
    w1d_ref, w1p_ref, rest = _w1_refs(rest, dims)
    w2_ref, b1_ref, sc1_ref, sh1_ref, b2_ref, s_ref, ss_ref = rest

    @pl.when(_is_first())
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        ss_ref[...] = jnp.zeros_like(ss_ref)

    def body(t, _):
        tile = _tile_view(dense_ref, xt_ref, emask_ref, t, dims)
        h1 = _h1(tile, w1d_ref, w1p_ref, b1_ref, dims)
        a1 = _act(h1 * sc1_ref[0] + sh1_ref[0], dims.act)
        h2 = _dot2(a1, w2_ref[:], dims, _DN_STD) + b2_ref[0]
        hm = h2 * tile.mask
        s_ref[0, :] += jnp.sum(hm, axis=0)
        ss_ref[0, :] += jnp.sum(hm * h2, axis=0)
        return 0

    lax.fori_loop(0, dims.nt, body, 0, unroll=False)


def _f3_kernel(*refs, dims: SADims):
    dense_ref, xt_ref, emask_ref, rest = _unpack(refs, dims)
    w1d_ref, w1p_ref, rest = _w1_refs(rest, dims)
    (w2_ref, w3_ref, b1_ref, sc1_ref, sh1_ref, b2_ref, sc2_ref,
     sh2_ref, b3_ref, out_ref, amax_ref) = rest
    def body(t, _):
        tile = _tile_view(dense_ref, xt_ref, emask_ref, t, dims)
        h1 = _h1(tile, w1d_ref, w1p_ref, b1_ref, dims)
        a1 = _act(h1 * sc1_ref[0] + sh1_ref[0], dims.act)
        h2 = _dot2(a1, w2_ref[:], dims, _DN_STD) + b2_ref[0]
        a2 = _act(h2 * sc2_ref[0] + sh2_ref[0], dims.act)
        h3 = _dot2(a2, w3_ref[:], dims, _DN_STD) + b3_ref[0]
        neg = jnp.asarray(-jnp.inf, dims.acc)
        h3m = jnp.where(tile.mask > 0.5, h3, neg).reshape(dims.mt, _K, dims.c3)
        mx = jnp.max(h3m, axis=1)  # (MT, C3)
        # first-argmax via compare+min (middle-axis argmax is fragile in Mosaic)
        kidx = lax.broadcasted_iota(jnp.int32, (dims.mt, _K, dims.c3), 1)
        am = jnp.min(jnp.where(h3m == mx[:, None, :], kidx, _K), axis=1).astype(jnp.int32)
        valid = mx > neg  # all-invalid centroid -> -inf max
        msl = pl.ds(pl.multiple_of(t * dims.mt, dims.mt), dims.mt)
        out_ref[0, msl, :] = jnp.where(valid, mx, 0.0)
        amax_ref[0, msl, :] = jnp.where(valid, am, -1)
        return 0

    lax.fori_loop(0, dims.nt, body, 0, unroll=False)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _scatter_g(g_ref, amax_ref, t, dims: SADims):
    """Tile t of the cotangent scattered to argmax slots -> (rows, C3)."""
    msl = pl.ds(pl.multiple_of(t * dims.mt, dims.mt), dims.mt)
    g = g_ref[0, msl, :].astype(dims.acc)  # (MT, C3)
    am = amax_ref[0, msl, :]  # (MT, C3) int32, -1 when no valid neighbor
    kidx = lax.broadcasted_iota(jnp.int32, (dims.mt, _K, dims.c3), 1)
    gs = jnp.where(kidx == am[:, None, :], g[:, None, :], 0.0)
    return gs.reshape(dims.rows, dims.c3)


def _b1_kernel(*refs, dims: SADims):
    dense_ref, xt_ref, emask_ref, rest = _unpack(refs, dims)
    w1d_ref, w1p_ref, rest = _w1_refs(rest, dims)
    (w2_ref, w3_ref, b1_ref, sc1_ref, sh1_ref, b2_ref, sc2_ref,
     sh2_ref, mean2_ref, inv2_ref, g_ref, amax_ref,
     dw3_ref, db3_ref, sdb2_ref, sdb2x_ref) = rest

    @pl.when(_is_first())
    def _():
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)
        sdb2_ref[...] = jnp.zeros_like(sdb2_ref)
        sdb2x_ref[...] = jnp.zeros_like(sdb2x_ref)

    def body(t, _):
        tile = _tile_view(dense_ref, xt_ref, emask_ref, t, dims)
        h1 = _h1(tile, w1d_ref, w1p_ref, b1_ref, dims)
        a1 = _act(h1 * sc1_ref[0] + sh1_ref[0], dims.act)
        h2 = _dot2(a1, w2_ref[:], dims, _DN_STD) + b2_ref[0]
        z2 = h2 * sc2_ref[0] + sh2_ref[0]
        a2 = _act(z2, dims.act)
        gs = _scatter_g(g_ref, amax_ref, t, dims)
        dw3_ref[...] += _dot2(a2, gs, dims, _DN_EDGE)
        db3_ref[0, :] += jnp.sum(gs, axis=0)
        da2 = _dot2(gs, w3_ref[:], dims, _DN_WT)  # (rows, C2)
        db2n = da2 * _act_deriv(z2, dims.act) * tile.mask
        xhat2 = (h2 - mean2_ref[0]) * inv2_ref[0]
        sdb2_ref[0, :] += jnp.sum(db2n, axis=0)
        sdb2x_ref[0, :] += jnp.sum(db2n * xhat2, axis=0)
        return 0

    lax.fori_loop(0, dims.nt, body, 0, unroll=False)


def _b2_kernel(*refs, dims: SADims):
    dense_ref, xt_ref, emask_ref, rest = _unpack(refs, dims)
    w1d_ref, w1p_ref, rest = _w1_refs(rest, dims)
    (w2_ref, w3_ref, b1_ref, sc1_ref, sh1_ref, b2_ref, sc2_ref,
     sh2_ref, mean1_ref, inv1_ref, mean2_ref, inv2_ref, gi2_ref, t2a_ref,
     t2b_ref, g_ref, amax_ref,
     dw2_ref, db2_ref, sdb1_ref, sdb1x_ref) = rest

    @pl.when(_is_first())
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        sdb1_ref[...] = jnp.zeros_like(sdb1_ref)
        sdb1x_ref[...] = jnp.zeros_like(sdb1x_ref)

    def body(t, _):
        tile = _tile_view(dense_ref, xt_ref, emask_ref, t, dims)
        h1 = _h1(tile, w1d_ref, w1p_ref, b1_ref, dims)
        z1 = h1 * sc1_ref[0] + sh1_ref[0]
        a1 = _act(z1, dims.act)
        h2 = _dot2(a1, w2_ref[:], dims, _DN_STD) + b2_ref[0]
        z2 = h2 * sc2_ref[0] + sh2_ref[0]
        gs = _scatter_g(g_ref, amax_ref, t, dims)
        da2 = _dot2(gs, w3_ref[:], dims, _DN_WT)
        db2n = da2 * _act_deriv(z2, dims.act) * tile.mask
        xhat2 = (h2 - mean2_ref[0]) * inv2_ref[0]
        dh2 = gi2_ref[0] * (db2n - t2a_ref[0] - xhat2 * t2b_ref[0]) * tile.mask
        dw2_ref[...] += _dot2(a1, dh2, dims, _DN_EDGE)
        db2_ref[0, :] += jnp.sum(dh2, axis=0)
        da1 = _dot2(dh2, w2_ref[:], dims, _DN_WT)  # (rows, C1)
        db1n = da1 * _act_deriv(z1, dims.act) * tile.mask
        xhat1 = (h1 - mean1_ref[0]) * inv1_ref[0]
        sdb1_ref[0, :] += jnp.sum(db1n, axis=0)
        sdb1x_ref[0, :] += jnp.sum(db1n * xhat1, axis=0)
        return 0

    lax.fori_loop(0, dims.nt, body, 0, unroll=False)


def _b3_kernel(*refs, dims: SADims):
    dense_ref, xt_ref, emask_ref, rest = _unpack(refs, dims)
    w1d_ref, w1p_ref, rest = _w1_refs(rest, dims)
    (w2_ref, w3_ref, b1_ref, sc1_ref, sh1_ref, b2_ref, sc2_ref,
     sh2_ref, mean1_ref, inv1_ref, mean2_ref, inv2_ref, gi1_ref, gi2_ref,
     t2a_ref, t2b_ref, t1a_ref, t1b_ref, g_ref, amax_ref, *outs) = rest
    if dims.cd:
        dw1d_ref, dw1p_ref, db1_ref, dxd_ref = outs
    else:
        dw1p_ref, db1_ref = outs

    @pl.when(_is_first())
    def _():
        dw1p_ref[...] = jnp.zeros_like(dw1p_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        if dims.cd:
            dw1d_ref[...] = jnp.zeros_like(dw1d_ref)

    def body(t, _):
        tile = _tile_view(dense_ref, xt_ref, emask_ref, t, dims)
        h1 = _h1(tile, w1d_ref, w1p_ref, b1_ref, dims)
        z1 = h1 * sc1_ref[0] + sh1_ref[0]
        a1 = _act(z1, dims.act)
        h2 = _dot2(a1, w2_ref[:], dims, _DN_STD) + b2_ref[0]
        z2 = h2 * sc2_ref[0] + sh2_ref[0]
        gs = _scatter_g(g_ref, amax_ref, t, dims)
        da2 = _dot2(gs, w3_ref[:], dims, _DN_WT)
        db2n = da2 * _act_deriv(z2, dims.act) * tile.mask
        xhat2 = (h2 - mean2_ref[0]) * inv2_ref[0]
        dh2 = gi2_ref[0] * (db2n - t2a_ref[0] - xhat2 * t2b_ref[0]) * tile.mask
        da1 = _dot2(dh2, w2_ref[:], dims, _DN_WT)
        db1n = da1 * _act_deriv(z1, dims.act) * tile.mask
        xhat1 = (h1 - mean1_ref[0]) * inv1_ref[0]
        dh1 = gi1_ref[0] * (db1n - t1a_ref[0] - xhat1 * t1b_ref[0]) * tile.mask

        # full-W1 gradient: dense block via MXU; plane rows (incl. the
        # discarded mask row) in ONE transposed contraction against x_t
        if dims.cd:
            dw1d_ref[...] += _dot2(tile.dense, dh1, dims, _DN_EDGE)
            dxd = _dot2(dh1, w1d_ref[:], dims, _DN_WT)  # (rows, CD)
            r = dims.rows
            dxd_ref[0, pl.ds(pl.multiple_of(t * r, r), r), :] = dxd
        dw1p_ref[...] += _dot2(tile.xt, dh1, dims, _DN_STD)  # (CT, C1)
        db1_ref[0, :] += jnp.sum(dh1, axis=0)
        return 0

    lax.fori_loop(0, dims.nt, body, 0, unroll=False)


# --------------------------------------------------------------------------
# pallas_call plumbing
# --------------------------------------------------------------------------


def _vec(v):
    return v.reshape(1, -1).astype(
        jnp.float64 if v.dtype == jnp.float64 else jnp.float32
    )


def _call(kernel, dims: SADims, xs, weights, vecs, extras, out_shapes, out_specs, interpret):
    """Common pallas_call, grid = (B,) — one step per batch item, fori tile
    loop inside. xs = (dense (B, Mpad*K, CD) or None, x_t (B, NT*8, rows),
    emask (8, 1)); weights/vecs replicated; extras are (B, Mpad, C3)
    per-item blocks (cotangent / argmax)."""
    dense, xt, emask = xs
    b = xt.shape[0]
    m_pad = dims.nt * dims.mt
    inputs, in_specs = [], []
    if dense is not None:
        inputs.append(dense)
        in_specs.append(pl.BlockSpec(
            (1, m_pad * _K, dims.cd), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))
    inputs.append(xt)
    in_specs.append(pl.BlockSpec(
        (1, dims.nt * dims.ctp, dims.rows), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM))
    for w in [emask] + list(weights):
        inputs.append(w)
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM))
    for v in vecs:
        inputs.append(v)
        in_specs.append(pl.BlockSpec(v.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for e in extras:
        inputs.append(e)
        in_specs.append(pl.BlockSpec(
            (1, m_pad, dims.c3), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))
    return pl.pallas_call(
        partial(kernel, dims=dims),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        # per-item blocks + in-kernel tile intermediates exceed the 16 MB
        # scoped default; v5e has 128 MB of VMEM — use it
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(*inputs)


def _acc_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)


def _item_spec(dims, c):
    m_pad = dims.nt * dims.mt
    return pl.BlockSpec((1, m_pad, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _stats_from_sums(s, ss, cnt):
    mean = s[0] / cnt
    var = jnp.maximum(ss[0] / cnt - mean * mean, 0.0)
    return mean, var


def _fold(gamma, beta, mean, var, eps):
    inv = lax.rsqrt(var + eps)
    scale = gamma * inv
    return scale, beta - mean * scale, inv


def _split_w1(w1, dims: SADims):
    """W1 (CD+CP, C1) -> dense block (CD, C1) | None and plane rows padded
    with zero rows for x_t's mask + sublane-pad channels (CTP, C1)."""
    w1d = w1[: dims.cd] if dims.cd else None
    w1p = jnp.pad(w1[dims.cd :], ((0, dims.ctp - dims.cp), (0, 0)))
    return w1d, w1p


def _base_weights(w1, w2, w3, dims: SADims):
    w1d, w1p = _split_w1(w1, dims)
    return ([w1d] if dims.cd else []) + [w1p, w2, w3]


def _tile_xs(dense, planes, nbr_mask, dims: SADims):
    """Pad M to the tile multiple and pack planes + mask into the transposed
    sublane-sliceable x_t block (B, NT*CTP, rows).

    x_t stays f32 (the CTP=8 tile rows match the f32 sublane tile so an
    aligned pl.ds slice is legal; bf16 would need 16-row alignment) — the
    matmuls cast it per-tile. dense keeps the caller's dtype (bf16 on the
    production path), flattened to (B, Mpad*K, CD) for sublane slicing."""
    b, m, k = nbr_mask.shape
    assert k == _K
    assert dims.ct <= dims.ctp, f"too many plane channels: {dims.cp}"
    m_pad = dims.nt * dims.mt
    pad = m_pad - m
    ft = jnp.float64 if dims.f64 else jnp.float32

    def rows_of(p):
        p = jnp.pad(p.astype(ft), ((0, 0), (0, pad), (0, 0)))
        return p.reshape(b, dims.nt, dims.rows)

    dense_t = None
    if dense is not None:
        dense_t = jnp.pad(dense, ((0, 0), (0, pad), (0, 0), (0, 0))).reshape(
            b, m_pad * _K, dims.cd)
    chans = [rows_of(p) for p in planes] + [rows_of(nbr_mask)]
    chans += [jnp.zeros_like(chans[0])] * (dims.ctp - dims.ct)
    xt = jnp.stack(chans, axis=2).reshape(b, dims.nt * dims.ctp, dims.rows)
    emask = jnp.zeros((dims.ctp, 1), ft).at[dims.cp, 0].set(1.0)
    return dense_t, xt, emask, m_pad


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_sa(dims: SADims, interpret: bool, dense, xt, emask, cnt, running,
              w1, b1, g1, be1, w2, b2, g2, be2, w3, b3):
    out, _, stats = _fused_sa_fwd_impl(
        dims, interpret, dense, xt, emask, cnt, running,
        w1, b1, g1, be1, w2, b2, g2, be2, w3, b3)
    return out, stats


def _fused_sa_fwd_impl(dims, interpret, dense, xt, emask, cnt, running,
                       w1, b1, g1, be1, w2, b2, g2, be2, w3, b3):
    b = xt.shape[0]
    m_pad = dims.nt * dims.mt
    eps = 1e-5
    c1, c2, c3 = dims.c1, dims.c2, dims.c3
    xs = (dense, xt, emask)
    ft = dims.acc
    w1d, w1p = _split_w1(w1, dims)
    w1s = ([w1d] if dims.cd else []) + [w1p]

    if dims.train_bn:
        s1, ss1 = _call(
            _f1_kernel, dims, xs, w1s, [_vec(b1)], [],
            [jax.ShapeDtypeStruct((1, c1), ft)] * 2,
            [_acc_spec((1, c1))] * 2, interpret,
        )
        mean1, var1 = _stats_from_sums(s1, ss1, cnt)
    else:
        mean1, var1 = running[0], running[1]
    sc1, sh1, inv1 = _fold(g1, be1, mean1, var1, eps)

    if dims.train_bn:
        s2, ss2 = _call(
            _f2_kernel, dims, xs,
            w1s + [w2], [_vec(b1), _vec(sc1), _vec(sh1), _vec(b2)], [],
            [jax.ShapeDtypeStruct((1, c2), ft)] * 2,
            [_acc_spec((1, c2))] * 2, interpret,
        )
        mean2, var2 = _stats_from_sums(s2, ss2, cnt)
    else:
        mean2, var2 = running[2], running[3]
    sc2, sh2, inv2 = _fold(g2, be2, mean2, var2, eps)

    out, amax = _call(
        _f3_kernel, dims, xs,
        w1s + [w2, w3],
        [_vec(b1), _vec(sc1), _vec(sh1), _vec(b2), _vec(sc2), _vec(sh2), _vec(b3)],
        [],
        [
            jax.ShapeDtypeStruct((b, m_pad, c3), ft),
            jax.ShapeDtypeStruct((b, m_pad, c3), jnp.int32),
        ],
        [_item_spec(dims, c3), _item_spec(dims, c3)],
        interpret,
    )
    stats = (mean1, var1, mean2, var2)
    saved = (amax, mean1, inv1, sc1, sh1, mean2, inv2, sc2, sh2)
    return out, saved, stats


def _fused_sa_fwd(dims, interpret, dense, xt, emask, cnt, running,
                  w1, b1, g1, be1, w2, b2, g2, be2, w3, b3):
    out, saved, stats = _fused_sa_fwd_impl(
        dims, interpret, dense, xt, emask, cnt, running,
        w1, b1, g1, be1, w2, b2, g2, be2, w3, b3)
    res = (dense, xt, emask, cnt, running, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, saved)
    return (out, stats), res


def _fused_sa_bwd(dims, interpret, res, cts):
    g_out = cts[0]  # (B, Mpad, C3); stats cotangents unused (running averages)
    dense, xt, emask, cnt, running, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, saved = res
    amax, mean1, inv1, sc1, sh1, mean2, inv2, sc2, sh2 = saved
    b = xt.shape[0]
    m_pad = dims.nt * dims.mt
    cd, c1, c2, c3 = dims.cd, dims.c1, dims.c2, dims.c3
    ft = dims.acc
    g_out = g_out.astype(ft)
    gi1 = g1 * inv1
    gi2 = g2 * inv2
    xs = (dense, xt, emask)
    base_w = _base_weights(w1, w2, w3, dims)

    dw3, db3, sdb2, sdb2x = _call(
        _b1_kernel, dims, xs, base_w,
        [_vec(b1), _vec(sc1), _vec(sh1), _vec(b2), _vec(sc2), _vec(sh2),
         _vec(mean2), _vec(inv2)],
        [g_out, amax],
        [
            jax.ShapeDtypeStruct((c2, c3), ft),
            jax.ShapeDtypeStruct((1, c3), ft),
            jax.ShapeDtypeStruct((1, c2), ft),
            jax.ShapeDtypeStruct((1, c2), ft),
        ],
        [_acc_spec((c2, c3)), _acc_spec((1, c3)), _acc_spec((1, c2)), _acc_spec((1, c2))],
        interpret,
    )
    dgamma2, dbeta2 = sdb2x[0], sdb2[0]
    if dims.train_bn:
        t2a, t2b = sdb2[0] / cnt, sdb2x[0] / cnt
    else:  # running stats are constants: no mean/var backprop terms
        t2a = t2b = jnp.zeros_like(sdb2[0])

    dw2, db2, sdb1, sdb1x = _call(
        _b2_kernel, dims, xs, base_w,
        [_vec(b1), _vec(sc1), _vec(sh1), _vec(b2), _vec(sc2), _vec(sh2),
         _vec(mean1), _vec(inv1), _vec(mean2), _vec(inv2), _vec(gi2), _vec(t2a), _vec(t2b)],
        [g_out, amax],
        [
            jax.ShapeDtypeStruct((c1, c2), ft),
            jax.ShapeDtypeStruct((1, c2), ft),
            jax.ShapeDtypeStruct((1, c1), ft),
            jax.ShapeDtypeStruct((1, c1), ft),
        ],
        [_acc_spec((c1, c2)), _acc_spec((1, c2)), _acc_spec((1, c1)), _acc_spec((1, c1))],
        interpret,
    )
    dgamma1, dbeta1 = sdb1x[0], sdb1[0]
    if dims.train_bn:
        t1a, t1b = sdb1[0] / cnt, sdb1x[0] / cnt
    else:
        t1a = t1b = jnp.zeros_like(sdb1[0])

    out_shapes, out_specs = [], []
    if cd:
        out_shapes.append(jax.ShapeDtypeStruct((cd, c1), ft))
        out_specs.append(_acc_spec((cd, c1)))
    out_shapes += [
        jax.ShapeDtypeStruct((dims.ctp, c1), ft),
        jax.ShapeDtypeStruct((1, c1), ft),
    ]
    out_specs += [_acc_spec((dims.ctp, c1)), _acc_spec((1, c1))]
    if cd:
        out_shapes.append(jax.ShapeDtypeStruct((b, m_pad * _K, cd), ft))
        out_specs.append(pl.BlockSpec(
            (1, m_pad * _K, cd), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))
    outs = _call(
        _b3_kernel, dims, xs, base_w,
        [_vec(b1), _vec(sc1), _vec(sh1), _vec(b2), _vec(sc2), _vec(sh2),
         _vec(mean1), _vec(inv1), _vec(mean2), _vec(inv2),
         _vec(gi1), _vec(gi2), _vec(t2a), _vec(t2b), _vec(t1a), _vec(t1b)],
        [g_out, amax],
        out_shapes, out_specs, interpret,
    )
    if cd:
        dw1d, dw1p, db1, dxd = outs
        d_dense = dxd.astype(dense.dtype)
        dw1 = jnp.concatenate([dw1d, dw1p[: dims.cp]], axis=0)
    else:
        dw1p, db1 = outs
        d_dense = None
        dw1 = dw1p[: dims.cp]
    # x_t is data-only by contract (planes carry no upstream parameters)
    return (d_dense, jnp.zeros_like(xt), jnp.zeros_like(emask), jnp.zeros_like(cnt),
            jax.tree.map(jnp.zeros_like, running),
            dw1, db1[0], dgamma1, dbeta1, dw2, db2[0], dgamma2, dbeta2, dw3, db3[0])


_fused_sa.defvjp(_fused_sa_fwd, _fused_sa_bwd)


def default_tile(m: int, c3: int) -> Tuple[int, int]:
    """(mt, nt): centroid tile + count. Targets ~2 MB (MT*K, C3) f32
    accumulation tiles — big enough to saturate the MXU, small enough that
    the backward kernels' live set fits the (raised) VMEM budget AND that
    Mosaic's per-op vector unrolling stays tractable (rows = 16384 blocks
    pushed compiles past 9 minutes on the remote service; rows = 8192
    compiles in ~1-2 min)."""
    mt = max(8, min(128, (2 * 2**20) // (4 * _K * max(c3, 128))))
    mt = min(round_up(mt, 2), round_up(m, 2))
    return mt, round_up(m, mt) // mt


@partial(jax.jit, static_argnames=("act", "bf16", "mt", "train", "interpret",
                                   "return_argmax"))
def fused_sa_mlp(
    dense: Optional[jax.Array],  # (B, M, K=64, CD) or None; invalid rows zeroed
    planes: Sequence[jax.Array],  # CP x (B, M, K) narrow channels
    nbr_mask: jax.Array,  # (B, M, K) bool
    params: dict,  # {w1,b1,gamma1,beta1,w2,b2,gamma2,beta2,w3,b3} f32
    running: Optional[Tuple] = None,  # eval: (mean1, var1, mean2, var2)
    *,
    act: str = "ReLU",
    bf16: bool = False,
    mt: Optional[int] = None,
    train: bool = True,
    interpret: Optional[bool] = None,
    return_argmax: bool = False,
):
    """Fused SA-layer MLP + masked max over K.

    W1's input-channel order is [dense channels..., plane channels...].

    Train: returns (pooled (B, M, C3), (mean1, var1, mean2, var2)) with the
    batch statistics for the caller's running-average update; differentiable in
    ``dense`` and all params (custom VJP); ``planes`` are data-only.
    Eval (train=False): requires ``running``; returns pooled only.
    ``return_argmax=True`` (train only) additionally returns the (B, M, C3)
    winning-neighbor indices (-1 where no valid neighbor) — introspection for
    the on-TPU parity suite; this path carries no VJP.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    planes = list(planes)
    b, m, k = nbr_mask.shape
    cd = 0 if dense is None else dense.shape[-1]
    c1 = params["w1"].shape[1]
    c2 = params["w2"].shape[1]
    c3 = params["w3"].shape[1]
    if params["w1"].shape[0] != cd + len(planes):
        raise ValueError(
            f"w1 expects {params['w1'].shape[0]} input channels, got "
            f"dense {cd} + planes {len(planes)}"
        )
    f64 = any(jnp.dtype(x.dtype) == jnp.dtype(jnp.float64)
              for x in planes + ([dense] if dense is not None else []))
    if f64:
        params = {k_: v.astype(jnp.float64) for k_, v in params.items()}
    if mt is None:
        mt_v, nt = default_tile(m, c3)
    else:
        mt_v, nt = mt, round_up(m, mt) // mt
    dims = SADims(
        cd=cd, cp=len(planes), c1=c1, c2=c2, c3=c3,
        mt=mt_v, nt=nt, act=act, bf16=bf16, f64=f64,
        train_bn=train, interp=bool(interpret),
    )
    dense_t, xt, emask, m_pad = _tile_xs(dense, planes, nbr_mask, dims)
    cnt = jnp.maximum(jnp.sum(nbr_mask.astype(jnp.float32)), 1.0).astype(dims.acc)
    if train:
        # running stats unused in train mode; zero placeholders keep one VJP
        running = (jnp.zeros((c1,), dims.acc), jnp.zeros((c1,), dims.acc),
                   jnp.zeros((c2,), dims.acc), jnp.zeros((c2,), dims.acc))
    else:
        running = tuple(r.astype(dims.acc) for r in running)
    args = (dims, interpret, dense_t, xt, emask, cnt, running,
            params["w1"], params["b1"], params["gamma1"], params["beta1"],
            params["w2"], params["b2"], params["gamma2"], params["beta2"],
            params["w3"], params["b3"])
    def flat(o):  # (B, Mpad, C3) -> (B, M, C3)
        return o[:, :m]

    if return_argmax:
        if not train:
            raise ValueError("return_argmax requires train=True")
        out, saved, stats = _fused_sa_fwd_impl(*args)
        return flat(out).astype(jnp.float32), stats, flat(saved[0])
    out, stats = _fused_sa(*args)
    out = flat(out).astype(jnp.float32)
    return (out, stats) if train else out
