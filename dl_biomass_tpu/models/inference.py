"""Optimized inference engine.

Builds a jitted serving forward from a trained model's variables:

  * BatchNorm folded into the Linear weights (eval-mode BN is affine) — the
    flax module stack is bypassed entirely; the serving graph is a flat chain
    of kernels + folded matmuls;
  * selection/gather run on the production kernels (Pallas FPS, approx ball
    query, MXU gather);
  * dropout off, deterministic FPS starts.

Scope: the flagship SSG architecture (ReLU, single-scale, K=64). Falls back to
``model.apply`` semantics elsewhere. Numerically equivalent to
``model.apply(variables, batch, train=False)`` up to f32 reassociation
(~1e-4 relative).

History: round 1 ran SA1 through a fully-fused eval Pallas kernel
(ops/pallas_sa_fused.py); round-2 measurement showed this stack's Pallas HBM
streaming is ~10x slower than XLA's (docs/ROUNDLOG.md), the fused path tied or
trailed plain XLA eval, and the kernel was deleted — the folded-XLA chain here
IS the fast serving path on this hardware.

Measured (v5e, B=16 x 10240, bf16): 20.9 ms/batch = 765 clouds/s, identical
to ``model.apply`` eval to 3e-4 relative — the engine's value is the flat
pre-folded serving graph (no flax module traversal, BN folded once at load),
not a different compute path.
"""

from __future__ import annotations

import math
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

from dl_biomass_tpu.ops import (
    ball_query,
    farthest_point_sample,
    gather_points,
    group_neighborhoods,
    masked_max,
)


def fold_bn(kernel, bias, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold an eval-mode BatchNorm into the preceding Linear's weights."""
    inv = bn_scale / jnp.sqrt(bn_var + eps)
    return kernel * inv[None, :], (bias - bn_mean) * inv + bn_bias


def _folded_mlp(params: dict, stats: dict) -> List[Tuple[jax.Array, jax.Array]]:
    """[(W', b'), ...] with hidden-layer BN folded; final layer plain."""
    n_lin = sum(1 for k in params if k.startswith("lin"))
    out = []
    for i in range(n_lin):
        w = params[f"lin{i}"]["kernel"]
        b = params[f"lin{i}"]["bias"]
        if i < n_lin - 1:  # hidden: fold bn{i}
            bn_p = params[f"bn{i}"]
            bn_s = stats[f"bn{i}"]
            w, b = fold_bn(w, b, bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"])
        out.append((w, b))
    return out


def _run_folded(x, layers, act=True, compute_dtype=jnp.float32):
    """act=True: ReLU on hidden layers (SA/global MLPs); act=False: identity
    (the head uses act=None — reference pointnet2_regressor.py:50).

    ``compute_dtype=bf16`` matches the model's production eval numerics AND
    its speed — serving the folded chain in f32 measured 3.4x slower (the
    edge tensors are bandwidth-bound; f32 doubles the bytes). Dots run on
    explicitly flattened 2-D operands — the same eval-only layout hint as
    models/layers.Dense (a 4-D operand makes XLA pick an M-minor dot layout
    for 64-wide outputs and pay a full relayout copy downstream)."""
    shp = x.shape
    if x.ndim > 2:
        x = x.reshape(-1, shp[-1])
    for i, (w, b) in enumerate(layers):
        x = jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                    preferred_element_type=jnp.float32) + b
        if act and i < len(layers) - 1:
            x = jnp.maximum(x, 0.0)
        x = x.astype(compute_dtype)
    return x.reshape(*shp[:-1], x.shape[-1])


def compile_inference(model, variables, fused_eval: bool = False,
                      mesh=None) -> Callable:
    """Returns a jitted ``fn(batch) -> (B, num_outputs)`` serving function.

    What this buys is OPERATIONAL, not speed: measured head-to-head the
    folded chain ties the trainer's ``_eval_step`` at B in {1, 16, 36}
    (docs/SERVING.md round-4 adjudication — XLA folds eval-mode BN on its
    own just as well). The engine's value is the flat pre-folded graph
    whose compiled executable is keyed on the graph alone (weights are
    runtime ARGUMENTS — a new checkpoint or process at the same shapes
    reuses the persistent compile cache with zero recompile), target-free
    serving without a Trainer, and being the basis of the AOT export
    (models/export.py).

    ``fused_eval=True`` runs SA1 as ONE fused Pallas kernel (selection +
    capture + folded MLP + max, ops/pallas_sa_eval.py). Off by default on
    measurement: it ties the folded-XLA chain at B=16 (18.4 vs 18.7 ms) and
    loses at B=36 (39.5 vs 37.8) — the kernel's VPU selection cost scales
    linearly with batch while the XLA chain amortizes (docs/BENCHMARKS.md
    "round 3: the Pallas re-probe").

    ``mesh``: serve data-parallel over a ``jax.sharding.Mesh`` — folded
    weights replicated once at build, each batch's cloud axis sharded over
    the ``dp`` axis (the serving analog of the reference's DataParallel
    scatter/gather, ``testing_model.py:56-67``). The batch size must be a
    multiple of the dp size. Like the trainer's mesh path this rides XLA's
    SPMD partitioner, so it is exercised on the virtual CPU mesh (jnp
    selection path); single-chip TPU serving passes ``mesh=None``."""
    from dl_biomass_tpu.models.pointnet2 import PointNet2Regressor

    if not isinstance(model, PointNet2Regressor):
        # e.g. VoxelNet: a getattr probe here would raise AttributeError and
        # slip past callers' NotImplementedError fallbacks (eval/predict.py)
        raise NotImplementedError(
            f"inference engine covers PointNet2Regressor; got "
            f"{type(model).__name__} — serve it through model.apply"
        )
    if model.activation_function != "ReLU" or model.msg or model.max_neighbors != 64:
        raise NotImplementedError(
            "inference engine covers the flagship SSG/ReLU/K=64 config; "
            "use model.apply for other variants"
        )
    if fused_eval and not (
        model.use_pallas and model.fast_group
        and (model.num_features or 3) <= 4 and not model.exact_selection
    ):
        # without this, fused_eval=True would silently take the non-fused
        # branch below and a fused-vs-folded comparison would measure the
        # same path twice
        raise NotImplementedError(
            "fused_eval requires the stratified SA1 production path "
            "(use_pallas + fast_group, <= 4 features, not exact_selection)"
        )
    params = variables["params"]
    stats = variables.get("batch_stats")
    if not stats:
        raise ValueError(
            "compile_inference folds eval-mode BatchNorm into the matmuls and "
            "needs variables['batch_stats'] (train at least one step, or load "
            "a checkpoint that carries batch statistics)"
        )
    ct = model.compute_dtype
    sa1_layers = _folded_mlp(params["sa1"]["mlp"], stats["sa1"]["mlp"])
    sa2_layers = _folded_mlp(params["sa2"]["mlp"], stats["sa2"]["mlp"])
    sa3_layers = _folded_mlp(params["sa3"]["mlp"], stats["sa3"]["mlp"])
    head_layers = _folded_mlp(params["head"], stats["head"])
    r1 = model.sa1_radius * (2 if model.doubled_radius else 1)
    r2 = model.sa2_radius * (2 if model.doubled_radius else 1)

    def _bq(c, cmk, p, pmk, r):
        """Selection matching SAModule's semantics (torch_cluster first-K,
        reference pointnet2_regressor.py:14-15): the exact Pallas kernel on
        TPU — it beats approx_min_k at SA2 scale and is exact — and exact
        top_k off-TPU when the model demands exactness."""
        if model.use_pallas:
            from dl_biomass_tpu.ops.pallas_ballquery import ball_query_pallas

            return ball_query_pallas(c, cmk, p, pmk, radius=r, k=64)
        return ball_query(c, cmk, p, pmk, radius=r, k=64,
                          method="exact" if model.exact_selection else "auto")

    def _fps(p, mk, m):
        """FPS matching SAModule: sectored production sampler when the model
        trains with fast_fps (else the engine's centroids would diverge from
        model.apply's), exact otherwise."""
        if model.fast_fps and not model.exact_selection:
            from dl_biomass_tpu.ops.fps import fps_sectored

            return fps_sectored(p, mk, m, use_pallas=model.use_pallas)
        return farthest_point_sample(p, mk, m, use_pallas=model.use_pallas)

    # the folded weights are passed as ARGUMENTS, not closure captures: a
    # captured jnp array becomes an HLO literal, and ~1M params of literals
    # made the remote compile service pathologically slow (13+ min vs ~1 min
    # for the same graph with parameters); arguments also let a weight refresh
    # reuse the compiled executable
    @jax.jit
    def infer(folded, batch):
        sa1_layers, sa2_layers, sa3_layers, head_layers = folded
        feat, pos, mask = batch.feat, batch.pos, batch.mask
        if feat.shape[-1] == 0:
            feat = pos
        b, n, _ = pos.shape
        m1 = math.ceil(model.sa1_ratio * n)
        m2 = math.ceil(model.sa2_ratio * m1)

        idx1 = _fps(pos, mask, m1)
        c1 = gather_points(pos, idx1)
        cm1 = jnp.take_along_axis(mask, idx1, axis=1)
        if (model.use_pallas and model.fast_group and feat.shape[-1] <= 4
                and not model.exact_selection):
            if fused_eval:
                # the whole SA1 layer (stratified selection + capture + folded
                # MLP + max) as ONE kernel: no (B, M, K, C) edge tensor ever
                # touches HBM (ops/pallas_sa_eval.py)
                from dl_biomass_tpu.ops.pallas_sa_eval import sa1_fused_eval

                h1 = sa1_fused_eval(
                    c1, cm1, pos, mask, feat,
                    [w for wb in sa1_layers for w in wb], radius=r1,
                    bf16=(jnp.dtype(ct) == jnp.dtype(jnp.bfloat16)),
                    out_dtype=ct,
                )
            else:
                # production SA1 grouping: fused stratified ball query + gather
                # (1.8 ms vs ~17 ms approx query + XLA gathers at flagship scale)
                from dl_biomass_tpu.ops.pallas_group import ball_group_pallas

                _, nm1, rel1, g1 = ball_group_pallas(c1, cm1, pos, mask, feat, radius=r1,
                                                     compute_dtype=ct, need_idx=False)
                e1 = jnp.concatenate([g1, rel1], axis=-1)
                h1 = masked_max(_run_folded(e1, sa1_layers, compute_dtype=ct), nm1, axis=2)
        else:
            nidx1, nm1 = _bq(c1, cm1, pos, mask, r1)
            # [feat_j, pos_j - pos_i] channel order is the folded-W1 contract —
            # one shared implementation with the model path (ops/grouping.py)
            e1 = group_neighborhoods(pos, feat, c1, nidx1, nm1)
            h1 = masked_max(_run_folded(e1, sa1_layers, compute_dtype=ct), nm1, axis=2)

        idx2 = _fps(c1, cm1, m2)
        c2 = gather_points(c1, idx2)
        cm2 = jnp.take_along_axis(cm1, idx2, axis=1)
        nidx, nm = _bq(c2, cm2, c1, cm1, r2)
        if (model.split_first_layer and model.use_pallas
                and c1.shape[1] <= 4096):
            # per-point first layer (mirrors SAModule.split_first_layer):
            # folded layer 0 is linear in [h1_j, c1_j - c2_i], so compute it
            # once per point, gather the lane-aligned z-table, and shift by
            # the centroid term — no rel tensor, no concat, no f32 aux
            # mantissa passes
            from dl_biomass_tpu.ops.pallas_mxu_gather import mxu_gather

            w0, b0 = sa2_layers[0]
            fdim = h1.shape[-1]
            zpt = (
                jnp.dot(h1.astype(ct), w0[:fdim].astype(ct),
                        preferred_element_type=jnp.float32)
                + jnp.dot(c1.astype(ct), w0[fdim:].astype(ct),
                          preferred_element_type=jnp.float32)
                + b0
            ).astype(ct)
            # INVARIANT (no jnp.where zeroing here, unlike the unsplit
            # branch): ball-query pad slots carry index 0, so the one-hot
            # gather returns point 0's FINITE z row for masked slots, and
            # masked_max excludes them via nm. Any change to ball_query's
            # padding semantics (e.g. out-of-range pad indices -> all-zero
            # one-hot rows are also finite) must keep gathered pad rows
            # finite or re-add the masking (see tests/test_mxu_gather.py
            # TestPadRowFiniteness).
            gz = mxu_gather(zpt, nidx)
            cshift = jnp.dot(c2.astype(ct), w0[fdim:].astype(ct),
                             preferred_element_type=jnp.float32)
            # subtract + ReLU in compute dtype: an f32 upcast here doubles
            # the biggest split-path fusion's traffic (same discipline as
            # SAModule's split path)
            z0 = jnp.maximum(  # layer 0 is hidden: ReLU applies
                gz - cshift[:, :, None, :].astype(gz.dtype), 0.0
            ).astype(ct)
            h2 = masked_max(
                _run_folded(z0, sa2_layers[1:], compute_dtype=ct), nm, axis=2
            )
        else:
            if model.use_pallas and c1.shape[1] <= 4096:
                from dl_biomass_tpu.ops.pallas_mxu_gather import mxu_gather

                gfeat, gpos = mxu_gather(h1, nidx, aux=c1)
            else:
                gfeat, gpos = gather_points(h1, nidx), gather_points(c1, nidx)
            rel = gpos - c2[:, :, None, :]
            e = jnp.where(nm[..., None], jnp.concatenate([gfeat, rel], axis=-1), 0.0)
            h2 = masked_max(_run_folded(e, sa2_layers, compute_dtype=ct), nm, axis=2)

        g = jnp.concatenate([h2, c2], axis=-1)
        h3 = masked_max(_run_folded(g, sa3_layers, compute_dtype=ct), cm2, axis=1)
        return _run_folded(h3, head_layers, act=False, compute_dtype=ct).astype(jnp.float32)

    folded = (tuple(sa1_layers), tuple(sa2_layers), tuple(sa3_layers),
              tuple(head_layers))

    if mesh is not None:
        from dl_biomass_tpu.parallel.mesh import replicated_sharding, shard_batch

        folded = jax.device_put(folded, replicated_sharding(mesh))

        def serve(batch):
            return infer(folded, shard_batch(batch, mesh))

    else:
        # weights-as-arguments also means the persistent compilation cache keys
        # on the GRAPH alone: any same-shape engine (new checkpoint, new
        # process) reuses the cached executable instead of recompiling per
        # weight set
        def serve(batch):
            return infer(folded, batch)

    # internals for compile_dataset_inference (the scanned whole-dataset path
    # consumes exactly these two; it takes its mesh as its own parameter)
    serve._infer = infer
    serve._folded = folded
    return serve


def compile_dataset_inference(model, variables, fused_eval: bool = False,
                              mesh=None) -> Callable:
    """One-dispatch serving over a whole DeviceDataset.

    Returns ``fn(ds, batch_size) -> (P, num_outputs) numpy`` that runs every
    batch of the dataset through the folded serving forward inside ONE
    compiled ``lax.scan`` — the serving analog of the trainer's scan-epoch
    path. Per-batch dispatch latency dominates directory-scale serving on a
    remote-dispatch backend; scanning collapses the epoch's S round trips to
    one (measured at 288 plots x 7168 pts, batch 36: 268 clouds/s per-batch
    sync, 381 pipelined dispatch, 978 scanned). Row order matches
    ``ds.plot_ids``.
    """
    serve = compile_inference(model, variables, fused_eval=fused_eval, mesh=mesh)
    infer, folded = serve._infer, serve._folded

    from functools import partial

    from dl_biomass_tpu.io.device_data import _assemble_batch

    def constrain(batch):
        if mesh is None:
            return batch
        from dl_biomass_tpu.parallel.mesh import batch_sharding

        s = batch_sharding(mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, s), batch
        )

    @partial(jax.jit, static_argnames=("base_n",))
    def run_all(folded, pos, feat, mask, y, idxs, valids, *, base_n: int):
        def body(_, per):
            idx, valid = per
            zeros = jnp.zeros(idx.shape[0], bool)  # no augmentation in serving
            batch = _assemble_batch(pos, feat, mask, y, idx, zeros, valid,
                                    jax.random.key(0), base_n=base_n)
            return 0, infer(folded, constrain(batch))

        _, outs = jax.lax.scan(body, 0, (idxs, valids))
        return outs  # (S, B, num_outputs)

    def serve_dataset(ds, batch_size: int):
        import numpy as np

        idxs, _, valids, _ = ds.epoch_spec_arrays(batch_size)
        outs = run_all(
            folded, ds.pos, ds.feat, ds.mask, ds.y,
            jnp.asarray(idxs), jnp.asarray(valids), base_n=ds.base_n,
        )
        flat = np.asarray(outs).reshape(-1, outs.shape[-1])
        return flat[np.asarray(valids).reshape(-1)]

    return serve_dataset
