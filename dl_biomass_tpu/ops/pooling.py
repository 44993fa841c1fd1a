"""Masked reductions.

``masked_max`` replaces both the torch_scatter scatter-max aggregation inside
``PointConv`` and ``global_max_pool(x, batch)`` (reference
``pointnet2_regressor.py:30``): with dense ``(B, N, C)`` batching the segment
structure disappears and a max over the point axis with -inf masking is exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def masked_max(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    """Max over ``axis`` ignoring mask=False entries.

    Slots with no valid entries yield 0 (matching scatter-max's empty-segment
    fill in PyG; in practice every centroid includes itself so this never fires
    on the main path).

    Custom VJP: the forward saves the argmax instead of the inputs, so the
    backward builds the gradient from an iota compare against a small (.., C)
    index tensor rather than re-reading the huge (B, M, K, C) edge activations
    (jnp.max's default VJP recompares against the saved operand — one extra
    full HBM pass over the largest tensors in the step). Ties go to the first
    argmax, matching torch_scatter's scatter_max backward (the reference's
    aggregation, ``pointnet2_regressor.py:18``); jnp.max's VJP would split
    tied gradients evenly instead — ties only occur for duplicated points
    (the noise augment appends copies), where either convention is valid.

    The primal (inference) path computes ONLY the max — no argmax, so eval
    never pays a second reduction pass; under differentiation the fwd rule
    computes (max, argmax) together in ONE variadic reduce (separate
    jnp.max + jnp.argmax cost two full passes over the edge tensor).
    """
    filled = _filled(x, mask)
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    av = jnp.expand_dims(any_valid, -1) if any_valid.ndim == out.ndim - 1 else any_valid
    return jnp.where(av, out, 0.0)


def _filled(x, mask):
    neg = jnp.asarray(-jnp.inf, x.dtype)
    m = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    return jnp.where(m, x, neg)


def _max_and_argmax(x, axis):
    """(max, argmax) in ONE variadic reduce — first index wins ties, matching
    jnp.argmax (and torch_scatter's scatter_max) exactly."""
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)

    def red(a, b):
        av, ai = a
        bv, bi = b
        take = (bv > av) | ((bv == av) & (bi < ai))
        return jnp.where(take, bv, av), jnp.where(take, bi, ai)

    return jax.lax.reduce(
        (x, iota), (jnp.asarray(-jnp.inf, x.dtype), jnp.int32(0)), red, (axis,)
    )


def _masked_max_fwd(x, mask, axis):
    filled = _filled(x, mask)
    out, am = _max_and_argmax(filled, axis)
    any_valid = jnp.any(mask, axis=axis)
    av = jnp.expand_dims(any_valid, -1) if any_valid.ndim == out.ndim - 1 else any_valid
    out = jnp.where(av, out, 0.0)
    # zero-element carrier for the static (reduced-axis size, dtype) pair:
    # custom_vjp residuals must be JAX types
    proto = jnp.empty((x.shape[axis], 0), x.dtype)
    return out, (am, av, proto)


def _masked_max_bwd(axis, res, g):
    am, av, proto = res
    dtype, k = proto.dtype, proto.shape[0]
    g = jnp.where(av, g, 0.0)
    kio_shape = [1] * (g.ndim + 1)
    kio_shape[axis] = k
    kio = jax.lax.broadcasted_iota(jnp.int32, tuple(kio_shape), axis)
    dx = jnp.where(
        kio == jnp.expand_dims(am, axis),
        jnp.expand_dims(g, axis),
        jnp.zeros((), g.dtype),
    ).astype(dtype)
    return dx, None


masked_max.defvjp(_masked_max_fwd, _masked_max_bwd)


def masked_mean(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    """Mean over ``axis`` ignoring mask=False entries (0 where empty)."""
    m = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    s = jnp.sum(jnp.where(m, x, 0.0), axis=axis)
    cnt = jnp.sum(m.astype(x.dtype), axis=axis)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)
