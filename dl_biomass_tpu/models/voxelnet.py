"""Dense voxel-grid CNN biomass regressor — the TPU-native answer to the
reference's MinkowskiEngine probe (``Misc/Minkowski_Engine/Minkowski_Main_V1.py:4-35``).

The probe's ``ExampleNetwork(in_feat, out_feat, D=3)`` is:

    conv1: MinkowskiConvolution(in_feat -> 64,  k=3, stride=2, no bias) + BN + ReLU
    conv2: MinkowskiConvolution(64     -> 128, k=3, stride=2, bias)     + BN + ReLU
    MinkowskiGlobalPooling (mean over the sample's occupied sites)
    MinkowskiLinear(128 -> out_feat)

Sparse tensors are the right call on GPUs, where skipping empty space pays for
the gather/scatter kernel maps. On TPU the trade inverts: at forest-plot scale
a dense ``G³`` grid (G=24-32 → 14k-33k voxels) runs the SAME 27-tap, same-width
convolutions as one dense ``conv_general_dilated`` that XLA tiles straight onto
the MXU — no kernel maps, no scatter, and the "wasted" empty-voxel FLOPs are
free on a unit that is otherwise idle (the PointNet++ flagship is HBM-bound,
docs/BENCHMARKS.md). Parameter shapes are identical to the probe's
(kernel_size=3 in D=3 is 27 offsets x Cin x Cout either way), pinned by test.

Where Minkowski derives structure from the sparse coordinate set, the dense
analog carries an explicit occupancy channel and pools/normalizes over occupied
voxels only:

  * per-voxel input features: [log1p(count), mean input features, mean
    sub-voxel offset (3)] — ``ops/voxelize.py``;
  * BatchNorm statistics over occupied voxels (MaskedBatchNorm), matching
    MinkowskiBatchNorm's nonzero-site statistics;
  * global pooling = mean over occupied voxels at the final stride, with the
    occupancy tracked through the stride-2 convs by max-pooling the mask —
    matching MinkowskiGlobalPooling's average over the sample's sites.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from dl_biomass_tpu.models.layers import MaskedBatchNorm, resolve_activation, torch_linear_init
from dl_biomass_tpu.ops.voxelize import voxelize


class VoxelNet(nn.Module):
    """Voxel CNN regressor over ``CloudBatch`` inputs.

    Constructor surface mirrors the probe (``in_feat``/``out_feat``/dimension
    D=3 fixed) plus the voxelization knobs the sparse engine got from its
    coordinate manager. ``channels=(64, 128)`` with stride 2 each is the
    probe's exact stack; deeper/wider stacks are one config away.
    """

    num_features: int  # per-point input features F (probe: in_feat)
    num_outputs: int = 4  # biomass components (probe: out_feat)
    grid: int = 32  # voxels per axis
    extent: float = 0.0  # cube half-width; 0 = adapt per cloud
    channels: Sequence[int] = (64, 128)  # probe: conv1 64, conv2 128
    activation_function: str = "ReLU"
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def voxel_channels(self) -> int:
        """Input channels of conv1: log1p(count) + F feature means + 3 offsets."""
        return 1 + self.num_features + 3

    @nn.compact
    def __call__(self, cloud, *, train: bool = False):
        act = resolve_activation(self.activation_function)
        counts, feat_sum, off_sum = voxelize(
            cloud.pos, cloud.feat, cloud.mask, grid=self.grid,
            extent=None if self.extent == 0.0 else self.extent,
        )
        occ = counts > 0
        denom = jnp.maximum(counts, 1.0)[..., None]
        x = jnp.concatenate(
            [jnp.log1p(counts)[..., None], feat_sum / denom, off_sum / denom],
            axis=-1,
        )  # (B, G, G, G, C0)

        mask = occ
        for i, width in enumerate(self.channels):
            cin = x.shape[-1]
            x = nn.Conv(
                width, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                use_bias=(i > 0),  # probe: conv1 bias=False, conv2 default True
                kernel_init=torch_linear_init(cin * 27),
                bias_init=torch_linear_init(cin * 27),
                dtype=self.compute_dtype, name=f"conv{i + 1}",
            )(x.astype(self.compute_dtype))
            # occupancy at the new stride: a site exists if any of its
            # footprint existed (Minkowski's stride-2 coordinate downsample)
            mask = nn.max_pool(
                mask[..., None].astype(jnp.float32), (2, 2, 2), strides=(2, 2, 2),
                padding="SAME",  # track conv's SAME ceil(g/2) for odd grids
            )[..., 0] > 0
            x = MaskedBatchNorm(num_features=width, name=f"bn{i + 1}")(
                x, mask, use_running_average=not train
            )
            x = act(x) if act is not None else x

        # global mean over occupied sites (MinkowskiGlobalPooling)
        mf = mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(x.astype(jnp.float32) * mf, axis=(1, 2, 3)) / jnp.maximum(
            jnp.sum(mf, axis=(1, 2, 3)), 1.0
        )  # (B, C)

        out = nn.Dense(
            self.num_outputs,
            kernel_init=torch_linear_init(pooled.shape[-1]),
            bias_init=torch_linear_init(pooled.shape[-1]),
            name="head",
        )(pooled)
        return out.astype(jnp.float32)

    def param_count(self) -> int:
        """Closed-form parameter count (pinned by test): conv kernels are the
        same 27 x Cin x Cout shapes a Minkowski k=3/D=3 convolution carries."""
        total = 0
        cin = self.voxel_channels
        for i, w in enumerate(self.channels):
            total += 27 * cin * w + (w if i > 0 else 0)  # kernel (+ bias)
            total += 2 * w  # BN gamma/beta
            cin = w
        total += cin * self.num_outputs + self.num_outputs  # head
        return total
