"""Feature-propagation decoder (per-point predictions).

The reference's historical upstream code carries a segmentation-style PointNet++
with an FP decoder — ``knn_interpolate`` + skip MLPs
(``Misc/Lukas_OG_Scripts/pn2_regressor.py:34-45,57-59``) for per-point biomass
regression. This is its TPU-native equivalent: dense masked kNN interpolation
(inverse-distance weights, k=3) and ``FPModule`` skip fusion.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_biomass_tpu.models.layers import MLP
from dl_biomass_tpu.models.pointnet2 import GlobalSAModule, SAModule


def knn_interpolate(
    feat_src: jax.Array,  # (B, M, C) features at source (coarse) points
    pos_src: jax.Array,  # (B, M, 3)
    src_mask: jax.Array,  # (B, M)
    pos_dst: jax.Array,  # (B, N, 3) target (fine) points
    dst_mask: jax.Array,  # (B, N)
    k: int = 3,
) -> jax.Array:
    """Inverse-distance-weighted kNN interpolation -> (B, N, C)."""
    k = min(k, pos_src.shape[1])
    d2 = jnp.sum(
        jnp.square(pos_dst[:, :, None, :] - pos_src[:, None, :, :]), axis=-1
    )  # (B, N, M)
    d2 = jnp.where(src_mask[:, None, :], d2, jnp.inf)
    neg_d2, idx = jax.lax.top_k(-d2, k)  # (B, N, k)
    d2k = -neg_d2
    w = 1.0 / jnp.maximum(d2k, 1e-16)
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-16)
    gathered = jax.vmap(lambda f, i: f[i])(feat_src, idx)  # (B, N, k, C)
    out = jnp.sum(gathered * w[..., None], axis=2)
    return jnp.where(dst_mask[..., None], out, 0.0)


class FPModule(nn.Module):
    """Feature propagation: interpolate coarse features to fine points, concat
    skip features, shared MLP (``Misc/Lukas_OG_Scripts/pn2_regressor.py:34-45``)."""

    mlp_channels: Sequence[int]
    k: int = 3
    act: Optional[str] = "ReLU"

    @nn.compact
    def __call__(self, feat_src, pos_src, src_mask, feat_skip, pos_dst, dst_mask, *, train: bool):
        x = knn_interpolate(feat_src, pos_src, src_mask, pos_dst, dst_mask, self.k)
        if feat_skip is not None:
            x = jnp.concatenate([x, feat_skip], axis=-1)
        return MLP(self.mlp_channels, act=self.act, name="mlp")(x, dst_mask, train=train)


class PointNet2Segmentor(nn.Module):
    """Per-point regressor: SA encoder + FP decoder + pointwise head — the
    historical per-point biomass variant (predicted-LAS dumps,
    ``Misc/Lukas_OG_Scripts/main.py:92-100``)."""

    num_features: int
    activation_function: str = "ReLU"
    num_outputs: int = 1
    dropout_probability: float = 0.0

    @nn.compact
    def __call__(self, cloud, *, train: bool = False):
        f = self.num_features
        act = self.activation_function
        feat, pos, mask = cloud.feat, cloud.pos, cloud.mask
        if f == 0:
            feat, f = pos, 3

        h1, pos1, mask1 = SAModule(0.2, 2.0, [3 + f, 64, 64, 128], act=act, name="sa1")(
            feat, pos, mask, train=train
        )
        h2, pos2, mask2 = SAModule(0.25, 8.0, [128 + 3, 128, 128, 256], act=act, name="sa2")(
            h1, pos1, mask1, train=train
        )
        hg = GlobalSAModule([256 + 3, 256, 512, 1024], act=act, name="sa3")(
            h2, pos2, mask2, train=train
        )
        # broadcast the global vector back down the pyramid
        hg2 = jnp.broadcast_to(hg[:, None, :], (*h2.shape[:2], hg.shape[-1]))
        d2 = FPModule([1024 + 256, 256, 256], act=act, name="fp3")(
            hg2, pos2, mask2, h2, pos2, mask2, train=train
        )
        d1 = FPModule([256 + 128, 256, 128], act=act, name="fp2")(
            d2, pos2, mask2, h1, pos1, mask1, train=train
        )
        d0 = FPModule([128 + f, 128, 128, 128], act=act, name="fp1")(
            d1, pos1, mask1, feat, pos, mask, train=train
        )
        out = MLP([128, 128, self.num_outputs], act=act,
                  dropout=self.dropout_probability, name="head")(d0, mask, train=train)
        return jnp.where(mask[..., None], out, 0.0)


def dump_predicted_las(path, pos, mask, ref, pred) -> None:
    """Write one cloud's per-point observed-vs-predicted values as LAS Extra
    Bytes dims ``ref`` and ``pred`` — the historical segmentor loop's
    per-epoch artifact (``Misc/Lukas_OG_Scripts/main.py:92-100`` dumped
    ``ep{N}_{idx}.laz`` with exactly these two attributes for the first cloud
    of the eval batch). LAS (uncompressed) output: the built-in codec writes
    no LAZ.

    Args: pos (N, 3), mask (N,) bool, ref/pred (N,) per-point scalars.
    """
    import numpy as np

    from dl_biomass_tpu.io.reader import write_las

    m = np.asarray(mask, bool)
    write_las(
        np.asarray(pos, np.float64)[m],
        path,
        {
            "ref": np.asarray(ref, np.float64).reshape(-1)[m],
            "pred": np.asarray(pred, np.float64).reshape(-1)[m],
        },
    )
