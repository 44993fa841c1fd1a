"""Fused Pallas TPU kernel for batched farthest-point sampling.

The jnp/XLA FPS (ops/fps.py) is correct but latency-bound: each of the k
sequential iterations round-trips HBM for the distance cache and the coordinate
arrays. This kernel keeps everything in VMEM for the whole k-step loop:

  * layout: coordinate planes ``(B_blk, N)`` (x, y, z separately) so the point
    axis sits on the 128-wide lane dimension — every per-iteration op is a clean
    VPU pass; a ``(B, N, 3)`` layout would waste 125/128 lanes;
  * per iteration (all clouds in lockstep): squared distance to the last pick,
    running-min update, row argmax, one-hot coordinate extraction of the pick —
    ~1.5 us/iteration vs ~200 us for the XLA loop;
  * selected points get dist = -inf so indices are unique (matching
    ops/fps.py / the reference's delete-after-pick,
    ``downsampling_point_clouds.py:75,91``);
  * output is ``(B, k)`` with the block's lane dimension equal to the full
    array's (Mosaic requires block lane dims be 128-divisible OR full-size;
    k = ceil(ratio*N) is rarely 128-divisible), so the per-iteration store is a
    width-1 dynamic lane store.

VMEM: 5 planes x (8 x N) f32 — N up to ~100k points fits the ~16 MB budget.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dl_biomass_tpu.core.cloud import round_up

_B_BLK = 8  # f32 sublane width (minimum batch tile)
_B_BLK_MAX = 32  # widest batch tile: amortizes the sequential k-loop across
# clouds (each grid step runs the full loop; fewer steps = less serialization).
# VMEM at 32 rows x 100k pts x 5 planes f32 = ~64 MB exceeds budget, so the
# wrapper scales the tile down for very large N.


def _fps_kernel(px_ref, py_ref, pz_ref, valid_ref, start_ref, out_ref):
    b, n = px_ref.shape
    k = out_ref.shape[1]  # out block is (B_blk, k): lane dim == full array dim,
    # which satisfies Mosaic's block-divisibility rule for any k
    # NOTE: coordinate planes are read from their refs directly — stacking them
    # into one (3, B, N) value doubled VMEM residency and OOM'd 50k-pt clouds
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    valid = valid_ref[:] > 0.5
    neg = jnp.float32(-jnp.inf)
    lane = lax.broadcasted_iota(jnp.int32, (b, n), 1)

    def pick(idx_col, dists):
        """one-hot extract coords of idx per row; kill its dist."""
        oh = lane == idx_col[:, None]
        ohf = oh.astype(jnp.float32)
        l = (
            jnp.sum(px * ohf, axis=1, keepdims=True),
            jnp.sum(py * ohf, axis=1, keepdims=True),
            jnp.sum(pz * ohf, axis=1, keepdims=True),
        )
        return l, jnp.where(oh, neg, dists)  # l: 3 x (B, 1)

    start = start_ref[:, 0]  # (B,)
    dists = jnp.where(valid, jnp.float32(jnp.inf), neg)
    l, dists = pick(start, dists)
    # Mosaic has no dynamic lane store, so selections accumulate in a carried
    # (B, k) register block (one masked (B, k) pass per iteration — trivial next
    # to the (B, N) distance pass) and store once at the end.
    kcol = lax.broadcasted_iota(jnp.int32, (b, k), 1)
    acc = jnp.where(kcol == 0, start[:, None], 0)

    def step(i, dists, acc, l):
        dx, dy, dz = px - l[0], py - l[1], pz - l[2]
        d = dx * dx + dy * dy + dz * dz
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=1).astype(jnp.int32)
        acc = jnp.where(kcol == i, nxt[:, None], acc)
        l, dists = pick(nxt, dists)
        return dists, acc, l

    # hand-unroll 4 picks per loop iteration: Mosaic's per-iteration scalar-core
    # overhead (~us) dominates the ~1us of vector work per FPS step, and its
    # fori_loop lowering only supports unroll=1 or full unroll
    u = 4
    n_main = (k - 1) // u

    def body(j, carry):
        dists, acc, l = carry
        base = 1 + j * u
        for off in range(u):
            dists, acc, l = step(base + off, dists, acc, l)
        return dists, acc, l

    dists, acc, l = lax.fori_loop(0, n_main, body, (dists, acc, l), unroll=False)
    for i in range(1 + n_main * u, k):  # static remainder (< u iterations)
        dists, acc, l = step(i, dists, acc, l)
    out_ref[:, :] = acc


@partial(jax.jit, static_argnames=("num_samples", "interpret"))
def fps_pallas(
    pos: jax.Array,  # (B, N, 3) f32
    mask: jax.Array,  # (B, N) bool
    num_samples: int,
    starts: jax.Array,  # (B,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Batched FPS -> (B, num_samples) int32. Same semantics as
    ops.fps.farthest_point_sample with explicit starts."""
    b, n, _ = pos.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_pad = round_up(n, 128)
    # pick the widest batch tile that fits ~8MB of VMEM for the 5 (blk, N) planes
    blk = _B_BLK
    while blk < _B_BLK_MAX and blk < round_up(b, _B_BLK) and 5 * 2 * blk * n_pad * 4 <= 8 * 2**20:
        blk *= 2
    b_pad = round_up(b, blk)
    planes = []
    for c in range(3):
        p = pos[..., c]
        p = jnp.pad(p, ((0, b_pad - b), (0, n_pad - n)))
        planes.append(p)
    valid = jnp.pad(mask.astype(jnp.float32), ((0, b_pad - b), (0, n_pad - n)))
    # pad rows are fully invalid; give them start 0 (their outputs are dropped)
    starts_p = jnp.pad(starts.astype(jnp.int32), (0, b_pad - b))[:, None]

    grid = (b_pad // blk,)
    imap = lambda i: (i, 0)
    # Pallas double-buffers input blocks, so the working set is ~2x the plane
    # bytes plus loop temporaries; raise the scoped-VMEM cap for big-N clouds
    # (v5e has headroom beyond the 16MB default).
    vmem_bytes = min(2 * 5 * blk * n_pad * 4 + 4 * 2**20, 100 * 2**20)
    out = pl.pallas_call(
        _fps_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, n_pad), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n_pad), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n_pad), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n_pad), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, num_samples), imap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, num_samples), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(planes[0], planes[1], planes[2], valid, starts_p)
    return out[:b]
