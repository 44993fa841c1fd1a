"""Fully-fused eval-mode set-abstraction layers (Pallas TPU).

One kernel per SA layer runs the reference SAModule's whole eval forward
(``pointnet2_regressor.py:12-20``: ball query -> PointConv MLP -> max
aggregation) for a batch item: neighbor selection + capture + the 3-layer
pointwise MLP with BatchNorm FOLDED into the weights (eval-mode BN is affine)
+ the masked max over neighbors — emitting only the (B, M, C_out) pooled
output. The (B, M, K, C) edge tensors that make the unfused eval step
HBM-bound (~13.8 GB accessed, 87% of the bandwidth roofline at flagship
scale — docs/BENCHMARKS.md) never exist.

History: round 1 shipped this design, round 2 deleted it — this stack's
Pallas block DMA was then capped at ~26 GB/s and the kernel lost to folded
XLA. Round 3 re-probed the cap LIFTED (tools/dma_probe.py: ~315 GB/s at 4 MB
blocks), which reopens the structural escape from the bandwidth roofline for
serving. This file is the round-3 rebuild with everything learned since:
grid=(B,) with an in-kernel fori over centroid tiles (per-grid-step overhead
is still ~16 us), aligned sublane ``pl.ds`` slices, and single-pass bf16 dots
with f32 accumulation (the engine's production numerics).

Scope: the SA1 layer only — stratified pair-min selection + plane capture
(identical selection semantics to ``ops/pallas_group.ball_group_pallas``,
the production SA1 path), layer-1 as outer products over the <=7
[feat..., dx, dy, dz] channels. An SA2 flavor (exact rank-scatter selection
+ in-kernel one-hot MXU gather of the wide feature table) was designed but
NOT built: the SA1 measurement already showed the whole approach capped by
VPU selection cost that scales with batch (ties at B=16, loses at B=36),
so SA2 — whose selection kernel is the most VPU-bound of all — could not
win. Build it only if those economics change.

Eval only: no VJP (training keeps the unfused autodiff path).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dl_biomass_tpu.core.cloud import round_up
from dl_biomass_tpu.ops.pallas_group import stratified_pair_select

_G = 128  # lane width / stratification residues
_K = 64  # neighbor slots (= reference max_num_neighbors)
_CM = 32  # centroids per inner tile


def _mlp_tail(a1f, w2_ref, b2_ref, w3_ref, b3_ref, dot_dt):
    """Hidden layer 2 + output layer on the MXU (f32 accumulation, bias in
    f32, activations cast to ``dot_dt`` between dots — the engine's
    ``_run_folded`` numerics)."""
    a1 = a1f.astype(dot_dt)
    h2 = (
        jnp.dot(a1, w2_ref[:].astype(dot_dt), preferred_element_type=jnp.float32)
        + b2_ref[0][None, :]
    )
    a2 = jnp.maximum(h2, 0.0).astype(dot_dt)
    h3 = (
        jnp.dot(a2, w3_ref[:].astype(dot_dt), preferred_element_type=jnp.float32)
        + b3_ref[0][None, :]
    )
    return h3  # (rows, C3) f32


def _masked_max_store(h3, nbr_ok, out_ref, sl, cm, c_out):
    """Max over the K axis, zero-filled for neighborless centroids."""
    h3 = h3.reshape(cm, _K, c_out)
    okf = nbr_ok.astype(jnp.float32)
    filled = jnp.where(okf[:, :, None] > 0.5, h3, jnp.float32(-jnp.inf))
    pooled = jnp.max(filled, axis=1)
    anyf = jnp.max(okf, axis=1)
    pooled = jnp.where(anyf[:, None] > 0.5, pooled, 0.0)
    out_ref[0, sl, :] = pooled.astype(out_ref.dtype)


def _sa1_kernel(px_ref, py_ref, pz_ref, valid_ref, *refs,
                radius2: float, n: int, n_feat: int, l_dim: int, m: int,
                bf16: bool, stage: str = "full"):
    feat_refs = refs[:n_feat]
    (cx_ref, cy_ref, cz_ref, cvalid_ref,
     w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref) = refs[n_feat:]
    dot_dt = jnp.bfloat16 if bf16 else jnp.float32

    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]  # (L, G)
    pvalid = valid_ref[0] > 0.5
    big = jnp.int32(n)
    gidx = (
        lax.broadcasted_iota(jnp.int32, (l_dim, _G), 0) * _G
        + lax.broadcasted_iota(jnp.int32, (l_dim, _G), 1)
    )
    base_keys = jnp.where(pvalid & (gidx < n), gidx, big)
    c_hidden = w2_ref.shape[0]
    c_out = w3_ref.shape[1]

    def tile(t, _):
        sl = pl.ds(pl.multiple_of(t * _CM, _CM), _CM)
        cx = cx_ref[0, sl, :][:, :, None]  # (CM, 1, 1)
        cy = cy_ref[0, sl, :][:, :, None]
        cz = cz_ref[0, sl, :][:, :, None]
        cok = (cvalid_ref[0, sl, :] > 0.5)[:, :, None]
        dx = px[None] - cx  # (CM, L, G)
        dy = py[None] - cy
        dz = pz[None] - cz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= radius2) & cok
        keys = jnp.where(ok, base_keys[None], big)

        # stratified pair-min selection — ball_group_pallas's rule by
        # construction: ONE shared implementation (pallas_group.py)
        pair, hit = stratified_pair_select(keys, big)
        nbr_ok = pair < big
        if stage == "sel":  # timing bisect: selection only
            out_ref[0, sl, :] = jnp.concatenate(
                [pair.astype(jnp.float32)] * (out_ref.shape[2] // _K), axis=1
            ).astype(out_ref.dtype)
            return 0

        def cap(plane):  # (L, G) -> (CM, K): value at each selected slot
            c = jnp.sum(hit * plane[None], axis=1)  # (CM, G)
            return c[:, :_K] + c[:, _K:]

        # layer 1 as outer products over the tiny [feat..., rel] channel set
        # (MLP([x_j, pos_j - pos_i]) — reference pointnet2_regressor.py:18)
        chans = [cap(f_ref[0]) for f_ref in feat_refs]
        chans += [
            cap(px) - cx_ref[0, sl, :],
            cap(py) - cy_ref[0, sl, :],
            cap(pz) - cz_ref[0, sl, :],
        ]
        if stage == "cap":  # timing bisect: selection + capture
            s = sum(chans)
            out_ref[0, sl, :] = jnp.concatenate(
                [s] * (out_ref.shape[2] // _K), axis=1).astype(out_ref.dtype)
            return 0
        # layer 1 on the MXU: stack the few channels onto lanes (one
        # relayout per channel) and run ONE (CM*K, P) @ (P, H1) dot — the
        # VPU outer-product form measured +2.9 ms/step at flagship scale
        cin_pad = w1_ref.shape[0]
        ch_mat = jnp.stack(
            # match the unfused path: edge inputs round to the compute dtype
            [c.astype(dot_dt).astype(jnp.float32) for c in chans]
            + [jnp.zeros((_CM, _K), jnp.float32)] * (cin_pad - len(chans)),
            axis=-1,
        ).reshape(_CM * _K, cin_pad)
        h1 = (
            jnp.dot(ch_mat.astype(dot_dt), w1_ref[:].astype(dot_dt),
                    preferred_element_type=jnp.float32)
            + b1_ref[0][None, :]
        )
        # invalid slots (pair == big): hit matches EVERY exhausted key==big
        # entry, so the captured channels hold unmasked sums over all
        # out-of-radius points (stratified_pair_select's aliasing contract) —
        # plus the layer bias. Every real consumer below masks via nbr_ok
        # before its reduction; the 'cap' bisect stage emits the raw sums,
        # for timing only.
        a1f = jnp.maximum(h1, 0.0)
        if stage == "l1":  # timing bisect: through layer 1 + pooled store
            _masked_max_store(
                jnp.concatenate([a1f] * (c_out // c_hidden), axis=1),
                nbr_ok, out_ref, sl, _CM, c_out)
            return 0
        h3 = _mlp_tail(a1f, w2_ref, b2_ref, w3_ref, b3_ref, dot_dt)
        _masked_max_store(h3, nbr_ok, out_ref, sl, _CM, c_out)
        return 0

    lax.fori_loop(0, m // _CM, tile, 0, unroll=False)


@partial(jax.jit, static_argnames=("radius", "interpret", "bf16", "out_dtype",
                                   "stage"))
def sa1_fused_eval(
    centers: jax.Array,  # (B, M, 3)
    center_mask: jax.Array,  # (B, M)
    pos: jax.Array,  # (B, N, 3)
    mask: jax.Array,  # (B, N)
    feat: Optional[jax.Array],  # (B, N, F), F <= 4
    folded_weights: Sequence[jax.Array],  # w1 (F+3,H1), b1, w2 (H1,H2), b2, w3 (H2,C), b3
    *,
    radius: float,
    interpret: bool | None = None,
    bf16: bool = False,
    out_dtype=jnp.float32,
    stage: str = "full",  # private timing bisect: sel | cap | l1 | full
) -> jax.Array:
    """Fused eval SA layer with stratified selection -> (B, M, C_out).

    Selection semantics identical to ``ball_group_pallas`` (the production
    SA1 path); MLP numerics identical to the engine's folded chain at the
    same ``bf16`` flag.
    """
    b, m, _ = centers.shape
    n = pos.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w1, b1, w2, b2, w3, b3 = [w.astype(jnp.float32) for w in folded_weights]
    f_dim = feat.shape[-1] if feat is not None else 0
    if w1.shape[0] != f_dim + 3:
        raise ValueError(f"w1 rows {w1.shape[0]} != features+3 ({f_dim + 3})")

    n_pad = round_up(n, _G)
    l_dim = n_pad // _G
    m_pad = round_up(m, _CM)

    def plane(x, pad=0.0):
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)), constant_values=pad)
        return x.reshape(b, l_dim, _G)

    def cplane(x):
        return jnp.pad(x, ((0, 0), (0, m_pad - m)))[:, :, None]

    cin_pad = round_up(w1.shape[0], 8)
    w1p = jnp.pad(w1, ((0, cin_pad - w1.shape[0]), (0, 0)))

    p_spec = pl.BlockSpec((1, l_dim, _G), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, m_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i, nd=len(shape): (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_sa1_kernel, radius2=float(radius) ** 2, n=n, n_feat=f_dim,
                l_dim=l_dim, m=m_pad, bf16=bf16, stage=stage),
        grid=(b,),
        in_specs=[p_spec] * (4 + f_dim) + [c_spec] * 4
        + [full(w1p.shape), full((1, b1.shape[0])), full(w2.shape),
           full((1, b2.shape[0])), full(w3.shape), full((1, b3.shape[0]))],
        out_specs=pl.BlockSpec((1, m_pad, w3.shape[1]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, w3.shape[1]), out_dtype),
        interpret=interpret,
    )(
        plane(pos[..., 0]), plane(pos[..., 1]), plane(pos[..., 2]),
        plane(mask.astype(jnp.float32)),
        *[plane(feat[..., c].astype(jnp.float32)) for c in range(f_dim)],
        cplane(centers[..., 0]), cplane(centers[..., 1]), cplane(centers[..., 2]),
        cplane(center_mask.astype(jnp.float32)),
        w1p, b1[None, :], w2, b2[None, :], w3, b3[None, :],
    )
    return out[:, :m]
