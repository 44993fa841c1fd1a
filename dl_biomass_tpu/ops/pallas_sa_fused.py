"""Fully-fused set-abstraction layer for inference (Pallas).

One kernel for the reference SAModule's entire eval forward (``pointnet2_
regressor.py:12-20``: fps neighbors -> PointConv MLP -> max aggregation).

One kernel per SA1: stratified ball selection + neighbor capture (as in
ops/pallas_group.py) + the 3-layer pointwise MLP with BatchNorm FOLDED into the
weights (eval mode: BN is affine) + the masked max over neighbors — emitting
only the (B, M, C_out) layer output. The (B, M, K, C) edge tensors that
dominate HBM traffic in the unfused path never exist.

Used by the inference engine (models/inference.py); training keeps the unfused
path (batch-stats BN + autodiff).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dl_biomass_tpu.core.cloud import round_up

_G = 128
_K = 64
_CM = 32


def fold_bn(kernel, bias, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold an eval-mode BatchNorm into the preceding Linear's weights."""
    inv = bn_scale / jnp.sqrt(bn_var + eps)
    return kernel * inv[None, :], (bias - bn_mean) * inv + bn_bias


def _kernel(px_ref, py_ref, pz_ref, valid_ref, feat_ref, cx_ref, cy_ref, cz_ref,
            cvalid_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
            *, radius2: float, n: int, n_feat: int, l_dim: int, m: int):
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
        cx = cx_ref[0, sl, :][:, :, None]
        cy = cy_ref[0, sl, :][:, :, None]
        cz = cz_ref[0, sl, :][:, :, None]
        cok = (cvalid_ref[0, sl, :] > 0.5)[:, :, None]
        dx = px[None] - cx
        dy = py[None] - cy
        dz = pz[None] - cz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= radius2) & cok
        keys = jnp.where(ok, base_keys[None], big)

        bmin = jnp.min(keys, axis=1)
        pair = jnp.minimum(bmin[:, :_K], bmin[:, _K:])  # (CM, K)
        nbr_ok = pair < big
        sel128 = jnp.concatenate([pair, pair], axis=1)
        hit = (keys == sel128[:, None, :]).astype(jnp.float32)

        def cap(plane):  # (L, G) -> (CM, K)
            c = jnp.sum(hit * plane[None], axis=1)
            return c[:, :_K] + c[:, _K:]

        # layer 1 as a sum of outer products over the tiny input channels
        # ([feat..., dx, dy, dz] — matching MLP([x_j, pos_j - pos_i]))
        gx, gy, gz = cap(px), cap(py), cap(pz)
        feats = [cap(feat_ref[0, f]) for f in range(n_feat)]  # (L, G) planes
        rels = (
            gx - cx_ref[0, sl, :],
            gy - cy_ref[0, sl, :],
            gz - cz_ref[0, sl, :],
        )
        chans = feats + list(rels)
        h1 = jnp.zeros((_CM, _K, c_hidden), jnp.float32) + b1_ref[0][None, None, :]
        for p, ch in enumerate(chans):
            h1 = h1 + ch[:, :, None] * w1_ref[p, :][None, None, :]
        a1 = jnp.maximum(h1, 0.0).reshape(_CM * _K, c_hidden)

        h2 = jnp.dot(a1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[0][None, :]
        a2 = jnp.maximum(h2, 0.0)
        h3 = jnp.dot(a2, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[0][None, :]

        h3 = h3.reshape(_CM, _K, c_out)
        neg = jnp.float32(-jnp.inf)
        # expand masks as f32 — Mosaic only supports minor-dim insertion on
        # 32-bit types, not bools
        okf = nbr_ok.astype(jnp.float32)
        filled = jnp.where(okf[:, :, None] > 0.5, h3, neg)
        pooled = jnp.max(filled, axis=1)
        anyf = jnp.max(okf, axis=1)
        pooled = jnp.where(anyf[:, None] > 0.5, pooled, 0.0)
        out_ref[0, sl, :] = pooled
        return 0

    lax.fori_loop(0, m // _CM, tile, 0, unroll=False)


@partial(jax.jit, static_argnames=("radius", "interpret"))
def sa_fused_eval(
    centers: jax.Array,  # (B, M, 3)
    center_mask: jax.Array,  # (B, M)
    pos: jax.Array,  # (B, N, 3)
    mask: jax.Array,  # (B, N)
    feat: jax.Array | None,  # (B, N, F), F small (SA1)
    folded_weights: Sequence[jax.Array],  # w1 (Cin,H), b1, w2 (H,H), b2, w3 (H,Cout), b3
    *,
    radius: float,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused eval SA layer -> (B, M, C_out) float32. ReLU activations."""
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

    def plane(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n))).reshape(b, l_dim, _G)

    feat_planes = jnp.stack(
        [plane(feat[..., c].astype(jnp.float32)) for c in range(f_dim)], axis=1
    ) if f_dim else jnp.zeros((b, 0, l_dim, _G), jnp.float32)

    def cplane(x):
        return jnp.pad(x, ((0, 0), (0, m_pad - m)))[:, :, None]

    cin_pad = round_up(w1.shape[0], 8)
    w1p = jnp.pad(w1, ((0, cin_pad - w1.shape[0]), (0, 0)))

    p_spec = pl.BlockSpec((1, l_dim, _G), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((1, f_dim, l_dim, _G), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, m_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_kernel, radius2=float(radius) ** 2, n=n, n_feat=f_dim,
                l_dim=l_dim, m=m_pad),
        grid=(b,),
        in_specs=[p_spec, p_spec, p_spec, p_spec, f_spec,
                  c_spec, c_spec, c_spec, c_spec,
                  full(w1p.shape), full((1, b1.shape[0])),
                  full(w2.shape), full((1, b2.shape[0])),
                  full(w3.shape), full((1, b3.shape[0]))],
        out_specs=pl.BlockSpec((1, m_pad, w3.shape[1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, w3.shape[1]), jnp.float32),
        interpret=interpret,
    )(
        plane(pos[..., 0]), plane(pos[..., 1]), plane(pos[..., 2]),
        plane(mask.astype(jnp.float32)), feat_planes,
        cplane(centers[..., 0]), cplane(centers[..., 1]), cplane(centers[..., 2]),
        cplane(center_mask.astype(jnp.float32)),
        w1p, b1[None, :], w2, b2[None, :], w3, b3[None, :],
    )
    return out[:, :m]
