"""Batched on-device point-cloud augmentation.

TPU-native rebuild of the reference transforms (``augmentation.py:54-122``), with
the same chain and distributions but static shapes + masks and explicit PRNG keys:

  * ``point_removal`` — drop a uniform-random subset so that the kept count is
    ~ U[round(0.9*n), n] (reference ``augmentation.py:73-88``). Dense version
    masks out removed slots instead of compacting.
  * ``random_noise`` — draw sigma ~ U(0.01, 0.025); add or subtract (50/50)
    gaussian noise on a *copy* of coords and features; then *append* a
    uniform-random subset of up to 10% of those noisy copies to the original,
    un-jittered cloud (reference ``augmentation.py:91-122``). Dense version
    writes appended points into pad slots beyond the base capacity; base slots
    stay clean.
  * ``rotate_points`` — uniform z-rotation in (-180, 180) degrees (reference
    ``augmentation.py:54-70``). Features are not rotated.

The reference applies these per sample in Python inside ``__getitem__``
(fresh randomness every epoch); here the whole batch is augmented in one fused
XLA computation on device, vmapped over clouds, so augmentation never stalls the
input pipeline.

Shape contract: valid input points live in slots ``[0, N)`` of a capacity-C
buffer with ``C >= ceil(1.1 * N)`` (use :func:`aug_capacity`); appended noise
points are written to slots ``[N, C)``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dl_biomass_tpu.core.cloud import CloudBatch, round_up


def aug_capacity(n: int, align: int = 128) -> int:
    """Capacity needed to hold a cloud of n points after noise-append (≤1.1n)."""
    return round_up(n + int(-(-n // 10)), align)


def random_scale(key: jax.Array, pos: jax.Array, lo: float = 0.9, hi: float = 1.1) -> jax.Array:
    """Uniform isotropic scale (not in the reference's chain — provided for the
    BASELINE 'rotate/jitter/scale' config; off by default)."""
    s = jax.random.uniform(key, (), minval=lo, maxval=hi)
    return pos * s


def rotate_points(key: jax.Array, pos: jax.Array) -> jax.Array:
    """Random z-axis rotation, angle ~ U(-180, 180) degrees. pos (..., 3)."""
    theta = jax.random.uniform(key, (), minval=-jnp.pi, maxval=jnp.pi)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # matches the reference's row-vector matmul: coords @ [[c,-s,0],[s,c,0],[0,0,1]]
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    return jnp.stack([x * c + y * s, -x * s + y * c, z], axis=-1)


def _ranks_over_valid(key: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Random permutation over valid slots: returns ``(ranks, order)`` where
    valid slots get distinct ranks 0..nv-1 (invalid >= nv) and ``order[r]`` is
    the slot holding rank r. 'Uniform random subset of size k' = rank < k for
    a traced k; its members in permutation order are ``order[:k]``."""
    n = mask.shape[0]
    scores = jnp.where(mask, jax.random.uniform(key, (n,)), jnp.inf)
    order = jnp.argsort(scores)  # valid slots first, in random order
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return ranks, order


def _randint_traced(key: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Uniform integer in [lo, hi] inclusive with traced bounds."""
    u = jax.random.uniform(key, ())
    span = (hi - lo + 1).astype(jnp.float32)
    return lo + jnp.floor(u * span).astype(jnp.int32)


def point_removal(key: jax.Array, mask: jax.Array, ranks: Optional[jax.Array] = None) -> jax.Array:
    """Mask out a random subset so the kept count ~ U[round(0.9*nv), nv].

    ``ranks`` (from :func:`_ranks_over_valid`) may be shared with
    :func:`random_noise` — a prefix of one uniform permutation is a uniform
    subset, and conditioned on the kept prefix, a shorter prefix is a uniform
    subset OF the kept set, so one sort serves both draws exactly."""
    k_rank, k_cnt = jax.random.split(key)
    nv = jnp.sum(mask.astype(jnp.int32))
    lo = jnp.round(0.9 * nv).astype(jnp.int32)
    keep = _randint_traced(k_cnt, lo, nv)
    if ranks is None:
        ranks, _ = _ranks_over_valid(k_rank, mask)
    return mask & (ranks < keep)


def random_noise(
    key: jax.Array,
    pos: jax.Array,  # (C, 3)
    feat: jax.Array,  # (C, F)
    mask: jax.Array,  # (C,)
    base_n: int,
    order: Optional[jax.Array] = None,  # shared valid-slot permutation
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Append jittered duplicates to the ORIGINAL (un-jittered) cloud.

    Reference semantics (``augmentation.py:113-120``): noise is computed over a
    copy of the cloud, and only a random subset of those *noisy copies* is
    appended — the base points themselves stay clean. Appended points are
    written to slots [base_n, C)."""
    c = pos.shape[0]
    cap_extra = c - base_n
    k_sd, k_sign, k_noise_p, k_noise_f, k_rank, k_cnt = jax.random.split(key, 6)

    sd = jax.random.uniform(k_sd, (), minval=0.01, maxval=0.025)
    sign = jnp.where(jax.random.uniform(k_sign, ()) >= 0.5, 1.0, -1.0)
    noisy_pos = pos + sign * sd * jax.random.normal(k_noise_p, pos.shape)
    noisy_feat = feat + sign * sd * jax.random.normal(k_noise_f, feat.shape)

    nv = jnp.sum(mask.astype(jnp.int32))
    hi = jnp.round(0.1 * nv.astype(jnp.float32)).astype(jnp.int32)
    n_extra = jnp.minimum(_randint_traced(k_cnt, jnp.int32(0), hi), cap_extra)

    if order is None:
        _, order = _ranks_over_valid(k_rank, mask)
    # order[r] = slot of the valid point with rank r: the permutation prefix
    # IS the uniform append subset (see point_removal's sharing note)
    app_src = order[:cap_extra]  # source slot for each append slot
    app_valid = jnp.arange(cap_extra, dtype=jnp.int32) < n_extra

    out_pos = pos.at[base_n:].set(jnp.where(app_valid[:, None], noisy_pos[app_src], 0.0))
    out_feat = feat.at[base_n:].set(jnp.where(app_valid[:, None], noisy_feat[app_src], 0.0))
    out_mask = mask.at[base_n:].set(app_valid)
    return out_pos, out_feat, out_mask


def augment_cloud(
    key: jax.Array,
    pos: jax.Array,
    feat: jax.Array,
    mask: jax.Array,
    base_n: Optional[int] = None,
    with_scale: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full reference chain: point_removal -> random_noise -> rotate_points
    (order per ``augmentation.py:278-280``); optional trailing random_scale."""
    if base_n is None:
        base_n = mask.shape[0] - mask.shape[0] // 11  # default: cap = ceil(1.1 n)
    k_rm, k_noise, k_rot, k_sc, k_perm = jax.random.split(key, 5)
    # ONE shared permutation serves both subset draws exactly (the removal
    # keep-set is a prefix; the append set is a shorter prefix, which given
    # the keep-set is a uniform subset of it — the sort is half the
    # augmentation's cost at 7k points, so not paying it twice matters)
    ranks, order = _ranks_over_valid(k_perm, mask)
    mask = point_removal(k_rm, mask, ranks=ranks)
    pos, feat, mask = random_noise(k_noise, pos, feat, mask, base_n, order=order)
    pos = rotate_points(k_rot, pos)
    if with_scale:
        pos = random_scale(k_sc, pos)
    return pos, feat, mask


@partial(jax.jit, static_argnames=("base_n",))
def augment_batch(key: jax.Array, batch: CloudBatch, base_n: int) -> CloudBatch:
    """Vmapped augmentation over a CloudBatch whose valid points occupy slots
    [0, base_n) of a capacity >= aug_capacity(base_n) buffer."""
    keys = jax.random.split(key, batch.batch_size)
    pos, feat, mask = jax.vmap(lambda k, p, f, m: augment_cloud(k, p, f, m, base_n))(
        keys, batch.pos, batch.feat, batch.mask
    )
    return CloudBatch(pos=pos, feat=feat, mask=mask, y=batch.y)
