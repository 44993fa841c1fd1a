"""Fused Pallas TPU kernel for batched farthest-point sampling.

The jnp/XLA FPS (ops/fps.py) is correct but latency-bound: each of the k
sequential iterations round-trips HBM for the distance cache and the coordinate
arrays. This kernel keeps everything in VMEM for the whole k-step loop:

  * layout: coordinate planes ``(B_blk, N)`` (x, y, z separately) so the point
    axis sits on the 128-wide lane dimension — every per-iteration op is a clean
    VPU pass; a ``(B, N, 3)`` layout would waste 125/128 lanes;
  * per iteration (all clouds in lockstep): candidate distance via the
    precomputed-|p|^2 FMA form (d = |p|^2 - 2 p.l + |l|^2 — 3 passes instead of
    the 6 of (p-l)^2), running-min fused with the previous pick's kill, row
    argmax, one-hot coordinate extraction of the pick;
  * selected points get dist = -inf so indices are unique (matching
    ops/fps.py / the reference's delete-after-pick,
    ``downsampling_point_clouds.py:75,91``);
  * output layout is ``(k, B)`` (transposed) when the whole batch fits one
    grid step: each iteration stores its picks with ONE dynamic sublane store
    instead of a (B, k) accumulate-where pass. When the batch must be tiled
    (grid > 1), Mosaic's block rule forces the lane dim to be full-size, so a
    ``(B, k)`` accumulate-carry variant is used instead (Mosaic has no dynamic
    LANE store).

VMEM: 5 planes x (B_blk x N) f32 — N up to ~100k points fits the budget.
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
_B_BLK_MAX = 128  # widest batch tile: amortizes the sequential k-loop across
# clouds (each grid step runs the full loop; fewer steps = less serialization)
# and enables the transposed single-step store layout. VMEM caps the tile for
# very large N (the wrapper scales it down).


def _fps_kernel(px_ref, py_ref, pz_ref, valid_ref, start_ref, out_ref, *, transposed: bool, k: int):
    b, n = px_ref.shape
    # NOTE: coordinate planes are read from their refs directly — stacking them
    # into one (3, B, N) value doubled VMEM residency and OOM'd 50k-pt clouds
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    valid = valid_ref[:] > 0.5
    neg = jnp.float32(-jnp.inf)
    lane = lax.broadcasted_iota(jnp.int32, (b, n), 1)
    # |p|^2 once: the per-iteration distance becomes 3 FMA passes. Same argmax
    # winners as the (p-l)^2 form up to ~1e-7 relative rounding; exact ties —
    # duplicated points — still resolve to the first index either way.
    sq = px * px + py * py + pz * pz

    def extract(idx_col):
        """one-hot extraction of the picked point's coords (per row)."""
        ohf = (lane == idx_col[:, None]).astype(jnp.float32)
        lx = jnp.sum(px * ohf, axis=1, keepdims=True)
        ly = jnp.sum(py * ohf, axis=1, keepdims=True)
        lz = jnp.sum(pz * ohf, axis=1, keepdims=True)
        return lx, ly, lz

    start = start_ref[:, 0]  # (B,)
    dists0 = jnp.where(valid, jnp.float32(jnp.inf), neg)
    l0 = extract(start)
    if transposed:
        out_ref[0:1, :] = start[None, :]
        acc0 = None
    else:
        kcol = lax.broadcasted_iota(jnp.int32, (b, k), 1)
        acc0 = jnp.where(kcol == 0, start[:, None], 0)

    def step(i, dists, prev, l, acc):
        # fused update: new candidate distance, running min, and the kill of
        # the previous pick (min keeps older kills at -inf automatically);
        # `prev` is carried as an index vector — bool (B, N) loop carries do
        # not legalize in Mosaic
        t = px * l[0] + py * l[1] + pz * l[2]
        ll = l[0] * l[0] + l[1] * l[1] + l[2] * l[2]  # (B, 1) scalar math
        d = sq - 2.0 * t + ll
        dists = jnp.where(lane == prev[:, None], neg, jnp.minimum(dists, d))
        nxt = jnp.argmax(dists, axis=1).astype(jnp.int32)
        if transposed:
            out_ref[pl.ds(i, 1), :] = nxt[None, :]
        else:
            acc = jnp.where(kcol == i, nxt[:, None], acc)
        return dists, nxt, extract(nxt), acc

    # hand-unroll picks per loop iteration: Mosaic's per-iteration scalar-core
    # overhead (~us) dominates the ~1us of vector work per FPS step, and its
    # fori_loop lowering only supports unroll=1 or full unroll
    u = 4
    n_main = (k - 1) // u

    if transposed:
        def body(j, carry):
            dists, prev, l = carry
            base = 1 + j * u
            for off in range(u):
                dists, prev, l, _ = step(base + off, dists, prev, l, None)
            return dists, prev, l

        dists, prev, l = lax.fori_loop(0, n_main, body, (dists0, start, l0), unroll=False)
        for i in range(1 + n_main * u, k):  # static remainder (< u iterations)
            dists, prev, l, _ = step(i, dists, prev, l, None)
    else:
        def body(j, carry):
            dists, prev, l, acc = carry
            base = 1 + j * u
            for off in range(u):
                dists, prev, l, acc = step(base + off, dists, prev, l, acc)
            return dists, prev, l, acc

        dists, prev, l, acc = lax.fori_loop(
            0, n_main, body, (dists0, start, l0, acc0), unroll=False
        )
        for i in range(1 + n_main * u, k):
            dists, prev, l, acc = step(i, dists, prev, l, acc)
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

    n_pad = max(round_up(n, 128), 256)  # single-lane-tile (n_pad=128) blocks
    # hit a Mosaic legalization bug (f32->i32 unrealized cast) — pad wider;
    # pad lanes are invalid (-inf dists) so semantics are unchanged
    # pick the widest batch tile that fits ~8MB of VMEM for the 5 (blk, N) planes
    blk = _B_BLK
    while blk < _B_BLK_MAX and blk < round_up(b, _B_BLK) and 5 * 2 * blk * n_pad * 4 <= 8 * 2**20:
        blk *= 2
    b_pad = round_up(b, blk)
    transposed = blk == b_pad  # single grid step: lane dim (B) is full-size
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
    if transposed:
        # pad the pick axis to the 8-sublane grain: dynamic sublane stores into
        # a non-8-aligned block fail to legalize (f32<->i32 materialization
        # error in Mosaic's masked-store path)
        k_pad = round_up(num_samples, 8)
        out_spec = pl.BlockSpec((k_pad, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((k_pad, b_pad), jnp.int32)
    else:
        out_spec = pl.BlockSpec((blk, num_samples), imap, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b_pad, num_samples), jnp.int32)
    out = pl.pallas_call(
        partial(_fps_kernel, transposed=transposed, k=num_samples),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, n_pad), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n_pad), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n_pad), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n_pad), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(planes[0], planes[1], planes[2], valid, starts_p)
    return (out[:num_samples].T if transposed else out)[:b]
