"""Fused last-edge-layer matmul + masked K-max Pallas kernel ("fused tail").

The SA layers end with ``masked_max(Dense(a2), nbr_mask, axis=2)`` (PointConv
max aggregation, reference ``pointnet2_regressor.py:10,18``): XLA materializes
the (B, M, K, C3) pre-pool activations z3 in HBM — 1.2 GB at SA1 flagship
scale — only to read them straight back for one max-reduce (3.4 ms write +
3.7 ms iota-reduce read in the round-4 profile). This kernel streams a2 once,
runs the matmul on the MXU, and takes the masked max + argmax over K inside
VMEM; z3 never exists in HBM. The custom VJP does the transpose trick: the
cotangent is scattered to argmax rows tile-by-tile in VMEM and immediately
contracted into da2 and dW3, so the (B, M, K, C3) cotangent never exists in
HBM either.

Numerics mirror the unfused pair exactly:
  * forward: z = (dot_bf16(a2, W3) [f32 acc] + b3).astype(bf16) — the same
    op sequence as models/layers.Dense with compute_dtype=bfloat16 — then
    where(mask, z, -inf), max over K (bit-identical to ops/pooling.masked_max
    up to reduction order), first-index tie rule for argmax;
  * backward: gradient routed to the argmax slot only (torch_scatter
    scatter_max rule, like masked_max's VJP), da2/dW3 via bf16 MXU dots with
    f32 accumulation.

NOT wired into any model path: at SA-layer shapes this kernel only ties
XLA's forward (XLA fuses the eval max into the dot itself) and loses the
backward on Mosaic matmul codegen — the full measured negative lives in
docs/BENCHMARKS.md round 5. It stays in-tree, parity-pinned, as the
candidate to re-measure when the Mosaic codegen picture changes (it is
bf16-production-math only; the f32/parity preset would keep the unfused
exact path regardless).

Grid discipline per docs/DESIGN.md: one grid step per batch item, fori over
centroid tiles inside; operands laid out 2-D per item (a2 as (B, M*K, C2))
with aligned pl.ds sublane slices. Whole-item VMEM blocks (16.8 MB at SA1
flagship scale) ride the large-block DMA path (re-measured round 5: 356 GB/s
at 4 MB+, tools/dma_probe.py).
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

_K = 64  # neighbor slots (reference max_num_neighbors)


def _pick_mt(m: int, k: int, c3: int) -> int:
    """Centroid-tile size: keep the f32 z tile (MT*K, C3) around 4 MB."""
    budget = 4 * 2**20 // (k * c3 * 4)
    mt = max(8, min(m, budget))
    while m % mt:
        mt //= 2
    return max(mt, 8)


def _fwd_kernel(a2_ref, mask_ref, w_ref, b_ref, out_ref, am_ref, *,
                mt: int, k: int, with_argmax: bool):
    m = mask_ref.shape[1]
    c3 = w_ref.shape[1]
    w = w_ref[...].astype(jnp.bfloat16)
    b = b_ref[...]  # (1, C3) f32
    kio = lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)

    neg = jnp.float32(-jnp.inf)

    def tile(t, _):
        rs = pl.ds(pl.multiple_of(t * mt * k, mt * k), mt * k)
        ms = pl.ds(pl.multiple_of(t * mt, mt), mt)
        a2 = a2_ref[0, rs, :].astype(jnp.bfloat16)  # (R, C2)
        acc = jax.lax.dot_general(
            a2, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, C3) f32 — same dot as Dense.__call__
        # bf16 round like Dense, then carry the EXACT bf16 values in f32:
        # the max over f32-exact bf16 values equals the bf16 max bit-for-bit,
        # and f32 sidesteps Mosaic's 16/1-bit relayout limits. Masking is a
        # true where(mask, z, -inf) (masked_max semantics incl. NaN/Inf junk
        # at invalid slots): the (MT, K, 1) f32 mask column broadcasts to
        # full shape FIRST (bool minor-dim inserts are unsupported in
        # Mosaic), then one full-shape compare drives the select.
        zf = (acc + b).astype(jnp.bfloat16).astype(jnp.float32).reshape(mt, k, c3)
        mcol = mask_ref[0, ms, :][:, :, None]  # (MT, K, 1) f32, 1.0 = valid
        m3 = mcol + jnp.zeros_like(zf)  # full-shape f32 broadcast
        zm = jnp.where(m3 > 0.5, zf, neg)
        vmax = jnp.max(zm, axis=1)  # (MT, C3) f32, exact bf16 values
        any_neg = vmax == neg  # all-invalid rows (max is the -inf fill)
        out_ref[0, ms, :] = vmax.astype(jnp.bfloat16)
        if with_argmax:
            # first-index tie rule (matches ops/pooling._max_and_argmax):
            # smallest k whose masked value equals the max. Invalid slots sit
            # at -inf and never equal a valid row's finite max; all-invalid
            # rows get k, which routes zero gradient in the backward kernel.
            eq = zm == vmax[:, None, :]
            am = jnp.min(jnp.where(eq, kio, jnp.int32(k)), axis=1)
            am_ref[0, ms, :] = jnp.where(any_neg, jnp.int32(k), am)
        return 0

    lax.fori_loop(0, m // mt, tile, 0, unroll=False)


def _bwd_kernel(a2_ref, g_ref, am_ref, w_ref, da2_ref, dw_ref, *,
                mt: int, k: int):
    m = g_ref.shape[1]
    c2 = w_ref.shape[0]
    c3 = w_ref.shape[1]
    wt = w_ref[...].astype(jnp.bfloat16)  # (C2, C3)
    kio = lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros((c2, c3), jnp.float32)

    def tile(t, _):
        rs = pl.ds(pl.multiple_of(t * mt * k, mt * k), mt * k)
        ms = pl.ds(pl.multiple_of(t * mt, mt), mt)
        g = g_ref[0, ms, :].astype(jnp.float32)  # (MT, C3) cotangent
        am = am_ref[0, ms, :]
        # scatter g to argmax rows (am == k for all-invalid -> no match);
        # f32 through the where (16-bit sublane broadcasts are Mosaic-fragile)
        gs = jnp.where(am[:, None, :] == kio, g[:, None, :],
                       jnp.float32(0.0)).reshape(mt * k, c3)
        da2_ref[0, rs, :] = jax.lax.dot_general(
            gs.astype(jnp.bfloat16), wt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(da2_ref.dtype)  # (R, C2) = gs @ W3^T
        a2 = a2_ref[0, rs, :].astype(jnp.bfloat16)
        dw_ref[...] += jax.lax.dot_general(
            a2, gs.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C2, C3) over the tile's edges
        return 0

    lax.fori_loop(0, m // mt, tile, 0, unroll=False)


def _grid_split(m_pad: int, k: int, c2: int, n_bufs: int) -> int:
    """Smallest power-of-2 M-split keeping the big double-buffered edge
    windows (n_bufs of them) under ~60 MB of the 128 MB VMEM."""
    win = m_pad * k * c2 * 2  # bf16 bytes of one whole-item edge window
    ns = 1
    while n_bufs * 2 * win // ns > 60 * 2**20 and ns < m_pad // 8:
        ns *= 2
    while m_pad % (ns * 8):
        ns //= 2
    return max(ns, 1)


def _run_fwd(a2, nbr_mask, w3, b3, *, with_argmax: bool, interpret: bool,
             mt: int | None = None):
    b, m, k, c2 = a2.shape
    c3 = w3.shape[1]
    m_pad = round_up(m, 8)
    if m_pad != m:
        a2 = jnp.pad(a2, ((0, 0), (0, m_pad - m), (0, 0), (0, 0)))
        nbr_mask = jnp.pad(nbr_mask, ((0, 0), (0, m_pad - m), (0, 0)))
    ns = _grid_split(m_pad, k, c2, n_bufs=1)  # one big window (a2 in)
    mb = m_pad // ns
    mt = mt or _pick_mt(mb, k, c3)
    a2r = a2.reshape(b, m_pad * k, c2)
    maskf = nbr_mask.astype(jnp.float32)
    out, am = pl.pallas_call(
        partial(_fwd_kernel, mt=mt, k=k, with_argmax=with_argmax),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, mb * k, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, c3), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, mb, c3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, c3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m_pad, c3), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, m_pad, c3), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(a2r, maskf, w3.astype(jnp.float32), b3.astype(jnp.float32)[None, :])
    any_valid = jnp.any(nbr_mask, axis=2)
    out = jnp.where(any_valid[..., None], out, jnp.bfloat16(0.0))
    return out[:, :m], am[:, :m]


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_tail(a2, nbr_mask, w3, b3, interpret: bool = False):
    """``masked_max(Dense(a2), nbr_mask, axis=2)`` without z3 in HBM.

    a2: (B, M, K, C2) bfloat16 edge activations (junk at invalid slots is
    fine — masking happens on z inside the kernel). Returns (B, M, C3)
    bfloat16. Same semantics as layers.Dense + ops/pooling.masked_max.
    """
    out, _ = _run_fwd(a2, nbr_mask, w3, b3, with_argmax=False,
                      interpret=interpret)
    return out


def _fused_tail_fwd(a2, nbr_mask, w3, b3, interpret):
    out, am = _run_fwd(a2, nbr_mask, w3, b3, with_argmax=True,
                       interpret=interpret)
    return out, (a2, am, w3)


def _fused_tail_bwd(interpret, res, g):
    a2, am, w3 = res
    b, m, k, c2 = a2.shape
    c3 = w3.shape[1]
    m_pad = round_up(m, 8)
    if m_pad != m:
        a2 = jnp.pad(a2, ((0, 0), (0, m_pad - m), (0, 0), (0, 0)))
        am = jnp.pad(am, ((0, 0), (0, m_pad - m), (0, 0)),
                     constant_values=k)  # pad rows route no gradient
        g = jnp.pad(g, ((0, 0), (0, m_pad - m), (0, 0)))
    ns = _grid_split(m_pad, k, c2, n_bufs=2)  # two big windows (a2 in, da2 out)
    mb = m_pad // ns
    mt = _pick_mt(mb, k, c3)
    gb = g.astype(jnp.bfloat16)
    da2, dw3 = pl.pallas_call(
        partial(_bwd_kernel, mt=mt, k=k),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, mb * k, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, c3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, c3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, c3), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, mb * k, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, c3), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m_pad * k, c2), a2.dtype),
            jax.ShapeDtypeStruct((c2, c3), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),  # dw accumulates
        ),
        interpret=interpret,
    )(a2.reshape(b, m_pad * k, c2), gb, am, w3.astype(jnp.float32))
    da2 = da2.reshape(b, m_pad, k, c2)[:, :m]
    # db3: every (b, m) with a valid argmax routes g to exactly one edge row
    db3 = jnp.sum(
        jnp.where(am[:, :m] < k, g[:, :m], 0.0).astype(jnp.float32),
        axis=(0, 1),
    )
    return da2, None, dw3, db3


fused_tail.defvjp(_fused_tail_fwd, _fused_tail_bwd)
