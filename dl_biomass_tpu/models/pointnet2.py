"""PointNet++ (SSG) biomass regressor — the TPU-native rebuild of the reference
``Net`` (``pointnet2_regressor.py:36-58``).

Architecture parity (widths scaled by ``neuron_multiplier``, 0 treated as 1):

  SA1: fps ratio 0.2,  ball r=2,  MLP[3+F, 64, 64, 128]
  SA2: fps ratio 0.25, ball r=8,  MLP[128+3, 128, 128, 256]
  SA3: global — MLP[256+3, 256, 512, 1024] + masked global max pool
  head: MLP[1024, 128, 128, 4], act=None, dropout p       (4 biomass components)

TPU-first differences from the reference (documented, behavior-equivalent):
  * dense ``(B, N, ...)`` + mask instead of ragged PyG batches;
  * centroid count per SA layer is static: ``ceil(ratio * N)`` of the padded size
    rather than of the per-cloud valid count (valid counts are 0.9N..1.1N after
    augmentation, so the reference's own count varies in the same envelope);
  * ball query returns a dense (B, M, K<=64) index matrix + mask instead of an
    edge list; neighbor selection is deterministic first-K-by-index;
  * fps random start draws from the flax 'fps' RNG stream (torch_cluster's
    random_start) or falls back to the first valid point when no stream is bound.

Variants beyond the reference constructor surface:
  * ``doubled_radius`` — the "w_doubled_radius" run-history variant (radii x2);
  * ``msg`` — multi-scale grouping (two radii per SA layer, concatenated), the
    BASELINE.json config-3 variant.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_biomass_tpu.models.layers import MLP, FusedSAMLP
from dl_biomass_tpu.ops import ball_query, farthest_point_sample, gather_points, group_neighborhoods, masked_max


class SAModule(nn.Module):
    """Set-abstraction layer: FPS -> ball query -> grouped pointwise MLP -> max.

    Mirrors the reference ``SAModule`` (``pointnet2_regressor.py:5-20``): PointConv
    message ``MLP([x_j, pos_j - pos_i])`` with max aggregation, no self loops added
    (each centroid is in its own ball at distance 0 regardless).
    """

    ratio: float
    radius: float
    mlp_channels: Sequence[int]
    act: Optional[str] = "ReLU"
    max_neighbors: int = 64
    extra_radii: Sequence[float] = ()  # MSG: extra scales, features concatenated
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False  # rematerialize the edge MLP in backward: the saved
    # (B, M, K, C) residuals dominate training memory (they OOM B>=128 at 10k
    # pts); recompute trades ~30% extra FLOPs for ~4x batch headroom
    fast_group: bool = False  # fused stratified ball-query+gather kernel
    # (ops/pallas_group.py). ONLY valid when this layer's inputs carry no
    # gradient (the first SA layer: pos/feat come straight from data) — the
    # kernel has no VJP and its outputs are stop-gradient'ed.
    fast_fps: bool = False  # sectored multi-start FPS (ops/fps.py
    # fps_sectored): S x fewer sequential argmax steps; production
    # approximation, parity mode keeps exact FPS
    fused_sa: bool = False  # fused Pallas edge-MLP+BN+max kernels with custom
    # VJP (ops/pallas_sa_train.py): no (B, M, K, C) tensor touches HBM inside
    # the MLP stack. Needs K=64 and a 2-hidden-layer MLP; same math as the
    # unfused path to fp tolerance.
    exact_selection: bool = False  # parity mode: exact first-K ball query
    # everywhere (torch_cluster semantics, reference pointnet2_regressor.py:
    # 14-15) — the Pallas exact kernel on TPU, top_k on CPU; overrides
    # fast_group's stratified sampling and approx_min_k's 0.95 recall
    analytic_bn: bool = False  # folded-BN MLP path (see models/layers.py MLP)
    split_first_layer: bool = True  # per-POINT first MLP layer on the MXU
    # gather path: W0 @ [x_j, p_j - p_i] is linear, so z0 = (Wf@x_j + Wp@p_j
    # + b0) - Wp@p_i computes the layer-1 matmul once per point instead of
    # once per edge (16x fewer FLOPs at SA2) and — the real win — the
    # gathered table becomes the lane-aligned bf16 z-table: no per-edge
    # rel-pos tensor, no concat, and no f32 aux-gather mantissa passes.
    # Exact linear algebra (fp reassociation only); parity-pinned by test.

    @nn.compact
    def __call__(self, feat, pos, mask, *, train: bool):
        b, n, _ = pos.shape
        m = math.ceil(self.ratio * n)

        fps_key = self.make_rng("fps") if self.has_rng("fps") else None
        if self.fast_fps and not self.exact_selection:
            from dl_biomass_tpu.ops.fps import fps_sectored

            idx = fps_sectored(pos, mask, m, key=fps_key, use_pallas=self.use_pallas)
        elif fps_key is not None:
            idx = farthest_point_sample(pos, mask, m, key=fps_key, use_pallas=self.use_pallas)
        else:
            idx = farthest_point_sample(pos, mask, m, use_pallas=self.use_pallas)
        centers = gather_points(pos, idx)
        center_mask = jnp.take_along_axis(mask, idx, axis=1)

        # remat wraps from_z0 too, so the split path keeps working (and its
        # speedup) for memory-bound large-batch runs that enable remat
        mlp_cls = (nn.remat(MLP, static_argnums=(3,),
                            methods=["__call__", "from_z0"])
                   if self.remat else MLP)
        use_fused_sa = (
            self.fused_sa
            and self.use_pallas
            and self.max_neighbors == 64
            and len(self.mlp_channels) == 4
            and (self.act is None or self.act in ("None", "ReLU", "LeakyReLU", "ELU"))
        )
        use_fused = (
            self.fast_group
            and not self.exact_selection
            and self.use_pallas
            and self.max_neighbors == 64
            and (feat is None or feat.shape[-1] <= 4)
        )

        def fused_mlp(scale_i):
            return FusedSAMLP(
                self.mlp_channels, act=self.act, compute_dtype=self.compute_dtype,
                name=f"mlp{scale_i}" if scale_i else "mlp",
            )

        def one_scale(r: float, scale_i: int):
            dense = None  # wide edge-feature block for the fused SA MLP
            planes = None  # narrow per-channel (B, M, K) planes for it
            if use_fused:
                from dl_biomass_tpu.ops.pallas_group import ball_group_pallas

                if use_fused_sa:
                    # end-to-end plane pipeline: the grouping kernel's raw
                    # captured planes feed the fused MLP kernels directly —
                    # no (B, M, K, C) edge tensor exists anywhere at SA1
                    # (coord planes come out already centroid-relative)
                    _, nbr_mask, rel_planes, feat_planes = ball_group_pallas(
                        centers, center_mask, pos, mask, feat, radius=r,
                        raw_planes=True, need_idx=False,
                    )
                    planes = list(feat_planes) + list(rel_planes)
                else:
                    # bf16 plane stores in production: the kernel's output DMA
                    # is its bottleneck and the MLP casts edges to the compute
                    # dtype anyway (bit-identical inputs, half the DMA)
                    _, nbr_mask, rel, gfeat = ball_group_pallas(
                        centers, center_mask, pos, mask, feat, radius=r,
                        compute_dtype=self.compute_dtype, need_idx=False,
                    )
                    grouped = jax.lax.stop_gradient(jnp.concatenate([gfeat, rel], axis=-1))
            else:
                if self.use_pallas and self.max_neighbors == 64:
                    # the rank-scatter exact kernel beats approx_min_k at SA2
                    # scale (4.9 vs 5.3 ms) AND has exact first-K semantics, so
                    # the TPU non-fused path is always exact — approx recall
                    # drops no longer exist in production (round 3)
                    from dl_biomass_tpu.ops.pallas_ballquery import ball_query_pallas

                    nbr_idx, nbr_mask = ball_query_pallas(
                        centers, center_mask, pos, mask, radius=r, k=self.max_neighbors
                    )
                else:
                    nbr_idx, nbr_mask = ball_query(
                        centers, center_mask, pos, mask, radius=r, k=self.max_neighbors,
                        method="exact" if self.exact_selection else "auto",
                    )
                use_mxu = (
                    self.use_pallas
                    and feat is not None
                    and feat.shape[-1] >= 16  # wide rows: MXU beats XLA gather
                    and pos.shape[1] <= 4096  # value table must fit VMEM
                    and self.max_neighbors == 64
                )
                use_split = (
                    self.split_first_layer
                    and use_mxu
                    and not use_fused_sa
                    and not self.analytic_bn
                )
                if use_split:
                    from dl_biomass_tpu.ops.pallas_mxu_gather import mxu_gather

                    # Per-point first layer: layer 0 is linear in
                    # [x_j, p_j - p_i], so its output decomposes as
                    # z0 = (Wf@x_j + Wp@p_j + b0) - Wp@p_i — the matmul runs
                    # once per POINT (N) instead of per edge (M*K), the
                    # gather moves the lane-aligned z-table instead of
                    # feat+aux-pos, and no rel/concat edge tensors exist.
                    # Same math as MLP's layer 0 (Dense numerics mirrored:
                    # compute-dtype matmuls, f32 accumulation).
                    mlp = mlp_cls(
                        self.mlp_channels, act=self.act,
                        compute_dtype=self.compute_dtype,
                        analytic_bn=self.analytic_bn,
                        name=f"mlp{scale_i}" if scale_i else "mlp",
                    )
                    w0, b0 = mlp.first_dense().kernel_bias()
                    cdt = self.compute_dtype
                    acc = jnp.promote_types(cdt, jnp.float32)
                    fdim = feat.shape[-1]
                    wf, wp = w0[:fdim], w0[fdim:]
                    zpt = (
                        jnp.dot(feat.astype(cdt), wf.astype(cdt),
                                preferred_element_type=acc)
                        + jnp.dot(pos.astype(cdt), wp.astype(cdt),
                                  preferred_element_type=acc)
                        + b0
                    ).astype(cdt)
                    gz = mxu_gather(zpt, nbr_idx)
                    cshift = jnp.dot(centers.astype(cdt), wp.astype(cdt),
                                     preferred_element_type=acc)
                    # subtract in compute dtype: upcasting gz to f32 here
                    # doubles the biggest split-path fusion's traffic; the
                    # extra bf16 rounding of cshift is within the path's
                    # envelope (parity pinned in TestSplitFirstLayer)
                    z0 = gz - cshift[:, :, None, :].astype(gz.dtype)
                    h = mlp.from_z0(z0, nbr_mask, train)
                    return masked_max(h, nbr_mask, axis=2)
                if use_mxu:
                    from dl_biomass_tpu.ops.pallas_mxu_gather import mxu_gather

                    # features (differentiable) and positions (gradient-free
                    # aux) share ONE one-hot build inside the kernel
                    gfeat, gpos = mxu_gather(feat, nbr_idx, aux=pos)
                    if use_fused_sa:
                        dense = jnp.where(nbr_mask[..., None], gfeat, jnp.zeros((), gfeat.dtype))
                        planes = [
                            gpos[..., c] - centers[..., c : c + 1] for c in range(3)
                        ]
                    else:
                        rel = gpos - centers[:, :, None, :]
                        grouped = jnp.where(
                            nbr_mask[..., None],
                            jnp.concatenate([gfeat, rel.astype(gfeat.dtype)], axis=-1),
                            jnp.zeros((), gfeat.dtype),
                        )
                else:
                    grouped = group_neighborhoods(pos, feat, centers, nbr_idx, nbr_mask)
                    if use_fused_sa:
                        dense, planes = grouped, []
            if use_fused_sa:
                return fused_mlp(scale_i)(dense, planes, nbr_mask, train)
            h = mlp_cls(
                self.mlp_channels,
                act=self.act,
                compute_dtype=self.compute_dtype,
                analytic_bn=self.analytic_bn,
                name=f"mlp{scale_i}" if scale_i else "mlp",
            )(grouped, nbr_mask, train)
            return masked_max(h, nbr_mask, axis=2)  # (B, M, C)

        out = one_scale(self.radius, 0)
        for si, r in enumerate(self.extra_radii, start=1):
            out = jnp.concatenate([out, one_scale(r, si)], axis=-1)
        return out, centers, center_mask


class GlobalSAModule(nn.Module):
    """Global set abstraction: MLP over [feat, pos] then masked global max pool.

    Mirrors the reference ``GlobalSAModule`` (``pointnet2_regressor.py:23-33``);
    ``global_max_pool(x, batch)`` becomes a masked max over the point axis.
    """

    mlp_channels: Sequence[int]
    act: Optional[str] = "ReLU"
    compute_dtype: jnp.dtype = jnp.float32
    analytic_bn: bool = False

    @nn.compact
    def __call__(self, feat, pos, mask, *, train: bool):
        h = jnp.concatenate([feat, pos], axis=-1)
        h = MLP(self.mlp_channels, act=self.act, compute_dtype=self.compute_dtype,
                analytic_bn=self.analytic_bn, name="mlp")(h, mask, train=train)
        return masked_max(h, mask, axis=1)  # (B, C)


class PointNet2Regressor(nn.Module):
    """Drop-in TPU equivalent of the reference ``Net(num_features,
    activation_function, neuron_multiplier, dropout_probability)``."""

    num_features: int
    activation_function: str = "ReLU"
    neuron_multiplier: int = 0
    dropout_probability: float = 0.5
    # architecture knobs (defaults = reference constants)
    sa1_ratio: float = 0.2
    sa1_radius: float = 2.0
    sa2_ratio: float = 0.25
    sa2_radius: float = 8.0
    max_neighbors: int = 64
    doubled_radius: bool = False
    msg: bool = False
    remat: bool = False
    fast_group: bool = False  # fused SA1 grouping kernel (stratified selection)
    fast_fps: bool = False  # sectored multi-start FPS in both SA layers
    fused_sa: bool = False  # fused SA MLP+BN+max Pallas kernels (TPU train+eval);
    # correct and parity-tested, but HBM-streaming-capped on this stack — see
    # core/config.py note
    exact_selection: bool = False  # parity preset: exact first-K ball query
    analytic_bn: bool = False  # folded-BN MLPs (models/layers.py MLP._folded):
    # train-mode BN stats from input moments + normalize folded into the
    # producing matmul — cuts edge-tensor HBM passes, same algebra
    split_first_layer: bool = True  # per-point first MLP layer on the MXU
    # gather path (SA2): see SAModule.split_first_layer
    num_outputs: int = 4
    # historical scalar-output variant (Misc/pn2_regressor_V2.py:42-44): the
    # global SA output and the head's hidden widths are doubled
    global_width_mult: int = 1
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, cloud, *, train: bool = False):
        nm = self.neuron_multiplier if self.neuron_multiplier != 0 else 1
        f = self.num_features
        act = self.activation_function
        r1 = self.sa1_radius * (2 if self.doubled_radius else 1)
        r2 = self.sa2_radius * (2 if self.doubled_radius else 1)
        common = dict(
            act=act,
            max_neighbors=self.max_neighbors,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            remat=self.remat,
            fused_sa=self.fused_sa,
            exact_selection=self.exact_selection,
            analytic_bn=self.analytic_bn,
            fast_fps=self.fast_fps,
            split_first_layer=self.split_first_layer,
        )
        msg1 = (r1 * 2,) if self.msg else ()
        msg2 = (r2 * 2,) if self.msg else ()
        sa_mult = 2 if self.msg else 1  # MSG concatenates two scales

        feat, pos, mask = cloud.feat, cloud.pos, cloud.mask
        if f == 0:
            # reference: x = coords when use_columns is empty
            feat = pos
            f = 3

        h, pos, mask = SAModule(
            self.sa1_ratio, r1, [3 + f, 64 * nm, 64 * nm, 128 * nm],
            extra_radii=msg1, name="sa1",
            # SA1's pos/feat come straight from the batch (no parameters
            # upstream), so the no-VJP fused grouping kernel is safe here
            fast_group=self.fast_group,
            **common,
        )(feat, pos, mask, train=train)
        h, pos, mask = SAModule(
            self.sa2_ratio, r2, [128 * nm * sa_mult + 3, 128 * nm, 128 * nm, 256 * nm],
            extra_radii=msg2, name="sa2", **common,
        )(h, pos, mask, train=train)
        gw = self.global_width_mult
        h = GlobalSAModule(
            [256 * nm * sa_mult + 3, 256 * nm, 512 * nm, 1024 * nm * gw],
            act=act, compute_dtype=self.compute_dtype,
            analytic_bn=self.analytic_bn, name="sa3",
        )(h, pos, mask, train=train)
        out = MLP(
            [1024 * nm * gw, 128 * nm * gw, 128 * nm * gw, self.num_outputs],
            act=None, dropout=self.dropout_probability,
            compute_dtype=self.compute_dtype, analytic_bn=self.analytic_bn,
            name="head",
        )(h, train=train)
        return out.astype(jnp.float32)  # predictions always f32


def pointnet2_v2(num_features: int, activation_function: str = "ReLU") -> PointNet2Regressor:
    """The reference's historical V2 variant: scalar biomass output with a
    doubled global/head width (``Misc/pn2_regressor_V2.py:35-53``)."""
    return PointNet2Regressor(
        num_features=num_features,
        activation_function=activation_function,
        num_outputs=1,
        global_width_mult=2,
    )


def model_to_dict(model) -> dict:
    """JSON-serializable constructor args (for checkpoint sidecar metadata).

    Family-aware: dispatches on the model class so every family's checkpoints
    carry a self-describing sidecar (``family`` key; absent = pointnet2)."""
    from dl_biomass_tpu.models.voxelnet import VoxelNet

    if isinstance(model, VoxelNet):
        return dict(
            family="voxelnet",
            num_features=model.num_features,
            num_outputs=model.num_outputs,
            grid=model.grid,
            extent=model.extent,
            channels=list(model.channels),
            activation_function=model.activation_function,
            compute_dtype="bfloat16" if model.compute_dtype == jnp.bfloat16 else "float32",
        )
    return dict(
        num_features=model.num_features,
        activation_function=model.activation_function,
        neuron_multiplier=model.neuron_multiplier,
        dropout_probability=model.dropout_probability,
        sa1_ratio=model.sa1_ratio,
        sa1_radius=model.sa1_radius,
        sa2_ratio=model.sa2_ratio,
        sa2_radius=model.sa2_radius,
        max_neighbors=model.max_neighbors,
        doubled_radius=model.doubled_radius,
        msg=model.msg,
        remat=model.remat,
        fast_group=model.fast_group,
        fast_fps=model.fast_fps,
        fused_sa=model.fused_sa,
        exact_selection=model.exact_selection,
        analytic_bn=model.analytic_bn,
        split_first_layer=model.split_first_layer,
        num_outputs=model.num_outputs,
        global_width_mult=model.global_width_mult,
        compute_dtype="bfloat16" if model.compute_dtype == jnp.bfloat16 else "float32",
        use_pallas=model.use_pallas,
    )


def model_from_dict(d: dict):
    d = dict(d)
    d["compute_dtype"] = jnp.bfloat16 if d.get("compute_dtype") == "bfloat16" else jnp.float32
    family = d.pop("family", "pointnet2")
    if family == "voxelnet":
        from dl_biomass_tpu.models.voxelnet import VoxelNet

        d["channels"] = tuple(d.get("channels", (64, 128)))
        return VoxelNet(**d)
    if family != "pointnet2":
        raise ValueError(f"unknown model family {family!r}")
    return PointNet2Regressor(**d)


def build_model(cfg, num_features: int):
    """Construct the regressor from a TrainConfig-style pair (hp + model cfg)."""
    hp, mc = cfg.hp, cfg.model
    if getattr(mc, "family", "pointnet2") == "voxelnet":
        from dl_biomass_tpu.models.voxelnet import VoxelNet

        return VoxelNet(
            num_features=num_features,
            grid=mc.voxel_grid,
            extent=mc.voxel_extent,
            channels=tuple(getattr(mc, "voxel_channels", (64, 128))),
            activation_function=hp.activation_function,
            compute_dtype=jnp.bfloat16 if mc.compute_dtype == "bfloat16" else jnp.float32,
        )
    up = getattr(mc, "use_pallas", "auto")
    if up == "auto":
        use_pallas = jax.default_backend() == "tpu"
    else:
        use_pallas = up in (True, "on", "true", "1")
    return PointNet2Regressor(
        num_features=num_features,
        activation_function=hp.activation_function,
        neuron_multiplier=hp.neuron_multiplier,
        dropout_probability=hp.dropout_probability,
        sa1_ratio=mc.sa1_ratio,
        sa1_radius=mc.sa1_radius,
        sa2_ratio=mc.sa2_ratio,
        sa2_radius=mc.sa2_radius,
        max_neighbors=mc.max_neighbors,
        doubled_radius=mc.doubled_radius,
        msg=mc.msg,
        remat=getattr(mc, "remat", False),
        fast_group=getattr(mc, "fast_group", False),
        fast_fps=getattr(mc, "fast_fps", False),
        fused_sa=getattr(mc, "fused_sa", False),
        exact_selection=getattr(mc, "exact_selection", False),
        analytic_bn=getattr(mc, "analytic_bn", False),
        split_first_layer=getattr(mc, "split_first_layer", True),
        compute_dtype=jnp.bfloat16 if mc.compute_dtype == "bfloat16" else jnp.float32,
        use_pallas=use_pallas,
    )
