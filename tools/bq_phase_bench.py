"""Phase bisection of the rank-scatter exact ball-query kernel at SA2 scale.

Dispatch-amortized: each timing point jits ONE function that runs the kernel
R times in a lax.fori_loop with a data dependency (centroids perturbed by the
previous round's output), so the axon per-dispatch latency (~20 ms round-trip)
is paid once, not per kernel run.

Variants stub out phases of the kernel (distance-only, +rank, +extract,
full) to attribute the ~6.7 ms in-step cost before redesigning.

Usage: python tools/bq_phase_bench.py [B] [M] [N]
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from dl_biomass_tpu.core.cloud import round_up

_G = 128
_R = 8
_KEY_BITS = 24
_INT_BIG_PY = 0x7FFFFFFF

LOOPS = 20


def _bq_kernel(px_ref, py_ref, pz_ref, valid_ref, cx_ref, cy_ref, cz_ref,
               cvalid_ref, out_ref, *, radius2, k, n, cm, phase):
    l_dim, g_dim = px_ref.shape[1], px_ref.shape[2]
    m = cx_ref.shape[1]
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]
    pvalid = valid_ref[0] > 0.5
    big_key = jnp.int32(n)
    gidx = (
        lax.broadcasted_iota(jnp.int32, (l_dim, g_dim), 0) * g_dim
        + lax.broadcasted_iota(jnp.int32, (l_dim, g_dim), 1)
    )
    inb = pvalid & (gidx < n)
    slt_g = (lax.broadcasted_iota(jnp.int32, (g_dim, g_dim), 0)
             < lax.broadcasted_iota(jnp.int32, (g_dim, g_dim), 1)).astype(jnp.bfloat16)
    slt_l = (lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 0)
             < lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 1)).astype(jnp.bfloat16)
    int_big = jnp.int32(_INT_BIG_PY)
    kio = lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
    rrow = lax.broadcasted_iota(jnp.int32, (cm, _R, g_dim), 1)

    def tile(t, _):
        sl = pl.ds(pl.multiple_of(t * cm, cm), cm)
        cx = cx_ref[0, sl, :][:, :, None]
        cy = cy_ref[0, sl, :][:, :, None]
        cz = cz_ref[0, sl, :][:, :, None]
        cok = (cvalid_ref[0, sl, :] > 0.5)[:, :, None]
        dx = px[None] - cx
        dy = py[None] - cy
        dz = pz[None] - cz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= radius2) & cok & inb[None]
        if phase == "dist":
            red = jnp.sum(jnp.sum(ok.astype(jnp.int32), axis=2), axis=1, keepdims=True)
            out_ref[0, sl, :] = jnp.broadcast_to(red, (cm, k))
            return 0
        okb = ok.astype(jnp.bfloat16)
        pre_g = jax.lax.dot_general(
            okb, slt_g, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rowcnt = jnp.sum(okb.astype(jnp.float32), axis=2)
        pre_l = jax.lax.dot_general(
            rowcnt.astype(jnp.bfloat16), slt_l, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rank = jnp.minimum(pre_l[:, :, None] + pre_g, jnp.float32(k))
        packed = (rank.astype(jnp.int32) << _KEY_BITS) | gidx[None]
        val = jnp.where(ok, packed, int_big)
        if phase == "rank":
            red = jnp.min(jnp.min(val, axis=2), axis=1, keepdims=True)
            out_ref[0, sl, :] = jnp.broadcast_to(red, (cm, k))
            return 0

        def rnd(r, carry):
            val_cur, cand = carry
            bmin = jnp.min(val_cur, axis=1)
            cand = jnp.where(rrow == r, bmin[:, None, :], cand)
            val_cur = jnp.where(val_cur == bmin[:, None, :], int_big, val_cur)
            return val_cur, cand

        cand0 = jnp.full((cm, _R, g_dim), _INT_BIG_PY, jnp.int32)
        _, cand = lax.fori_loop(0, _R, rnd, (val, cand0))
        if phase == "extract":
            red = jnp.min(jnp.min(cand, axis=2), axis=1, keepdims=True)
            out_ref[0, sl, :] = jnp.broadcast_to(red, (cm, k))
            return 0

        acc = jnp.full((cm, k, g_dim), big_key, jnp.int32)
        for r in range(_R):
            cand_r = lax.index_in_dim(cand, r, axis=1, keepdims=False)
            cr = cand_r >> _KEY_BITS
            ckey = cand_r & ((1 << _KEY_BITS) - 1)
            eq = cr[:, None, :] == kio
            acc = jnp.where(eq, ckey[:, None, :], acc)
        out_ref[0, sl, :] = jnp.min(acc, axis=2)
        return 0

    def tile_dyn(t, _):
        """Merged extraction+scatter with an exact dynamic round bound."""
        sl = pl.ds(pl.multiple_of(t * cm, cm), cm)
        cx = cx_ref[0, sl, :][:, :, None]
        cy = cy_ref[0, sl, :][:, :, None]
        cz = cz_ref[0, sl, :][:, :, None]
        cok = (cvalid_ref[0, sl, :] > 0.5)[:, :, None]
        dx = px[None] - cx
        dy = py[None] - cy
        dz = pz[None] - cz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= radius2) & cok & inb[None]
        okb = ok.astype(jnp.bfloat16)
        pre_g = jax.lax.dot_general(
            okb, slt_g, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rowcnt = jnp.sum(okb.astype(jnp.float32), axis=2)
        pre_l = jax.lax.dot_general(
            rowcnt.astype(jnp.bfloat16), slt_l, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rank = pre_l[:, :, None] + pre_g
        # winners-only pre-mask: rank < k keeps exactly the first-K-by-index
        win = ok & (rank < jnp.float32(k))
        packed = (rank.astype(jnp.int32) << _KEY_BITS) | gidx[None]
        val = jnp.where(win, packed, int_big)
        # exact per-tile round bound: max winners in any residue bucket
        w = jnp.sum(win.astype(jnp.float32), axis=1)  # (CM, G)
        w_max = jnp.max(w).astype(jnp.int32)

        def rnd(r, carry):
            val_cur, acc = carry
            bmin = jnp.min(val_cur, axis=1)  # (CM, G)
            val_cur = jnp.where(val_cur == bmin[:, None, :], int_big, val_cur)
            cr = bmin >> _KEY_BITS  # >= k only for exhausted buckets
            ckey = bmin & ((1 << _KEY_BITS) - 1)
            eq = cr[:, None, :] == kio
            acc = jnp.where(eq, ckey[:, None, :], acc)
            return val_cur, acc

        acc0 = jnp.full((cm, k, g_dim), big_key, jnp.int32)
        _, acc = lax.fori_loop(0, w_max, rnd, (val, acc0))
        out_ref[0, sl, :] = jnp.min(acc, axis=2)
        return 0


    def tile_merged(t, _, unroll_py=False):
        """Merged extraction+scatter, FUNCTIONAL carries, static 8 rounds."""
        sl = pl.ds(pl.multiple_of(t * cm, cm), cm)
        cx = cx_ref[0, sl, :][:, :, None]
        cy = cy_ref[0, sl, :][:, :, None]
        cz = cz_ref[0, sl, :][:, :, None]
        cok = (cvalid_ref[0, sl, :] > 0.5)[:, :, None]
        dx = px[None] - cx
        dy = py[None] - cy
        dz = pz[None] - cz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= radius2) & cok & inb[None]
        okb = ok.astype(jnp.bfloat16)
        pre_g = jax.lax.dot_general(
            okb, slt_g, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rowcnt = jnp.sum(okb.astype(jnp.float32), axis=2)
        pre_l = jax.lax.dot_general(
            rowcnt.astype(jnp.bfloat16), slt_l, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rank = pre_l[:, :, None] + pre_g
        win = ok & (rank < jnp.float32(k))
        packed = (rank.astype(jnp.int32) << _KEY_BITS) | gidx[None]
        val = jnp.where(win, packed, int_big)

        def rnd(r, carry):
            val_cur, acc = carry
            bmin = jnp.min(val_cur, axis=1)
            val_cur = jnp.where(val_cur == bmin[:, None, :], int_big, val_cur)
            cr = bmin >> _KEY_BITS
            ckey = bmin & ((1 << _KEY_BITS) - 1)
            eq = cr[:, None, :] == kio
            acc = jnp.where(eq, ckey[:, None, :], acc)
            return val_cur, acc

        acc = jnp.full((cm, k, g_dim), big_key, jnp.int32)
        if unroll_py:
            carry = (val, acc)
            for r in range(_R):
                carry = rnd(r, carry)
            acc = carry[1]
        else:
            _, acc = lax.fori_loop(0, _R, rnd, (val, acc))
        out_ref[0, sl, :] = jnp.min(acc, axis=2)
        return 0

    from functools import partial as _p
    body = {"dyn": tile_dyn, "mstatic": tile_merged,
            "munroll": _p(tile_merged, unroll_py=True)}.get(phase, tile)
    lax.fori_loop(0, m // cm, body, 0, unroll=False)


def _bq_kernel_when(px_ref, py_ref, pz_ref, valid_ref, cx_ref, cy_ref, cz_ref,
                    cvalid_ref, out_ref, val_ref, acc_ref, *, radius2, k, n, cm,
                    rounds=_R, predicated=True):
    """Static 8-round unroll, each round predicated on r < w_max (exact)."""
    l_dim, g_dim = px_ref.shape[1], px_ref.shape[2]
    m = cx_ref.shape[1]
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]
    pvalid = valid_ref[0] > 0.5
    big_key = jnp.int32(n)
    gidx = (
        lax.broadcasted_iota(jnp.int32, (l_dim, g_dim), 0) * g_dim
        + lax.broadcasted_iota(jnp.int32, (l_dim, g_dim), 1)
    )
    inb = pvalid & (gidx < n)
    slt_g = (lax.broadcasted_iota(jnp.int32, (g_dim, g_dim), 0)
             < lax.broadcasted_iota(jnp.int32, (g_dim, g_dim), 1)).astype(jnp.bfloat16)
    slt_l = (lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 0)
             < lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 1)).astype(jnp.bfloat16)
    int_big = jnp.int32(_INT_BIG_PY)
    kio = lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)

    def tile(t, _):
        sl = pl.ds(pl.multiple_of(t * cm, cm), cm)
        cx = cx_ref[0, sl, :][:, :, None]
        cy = cy_ref[0, sl, :][:, :, None]
        cz = cz_ref[0, sl, :][:, :, None]
        cok = (cvalid_ref[0, sl, :] > 0.5)[:, :, None]
        dx = px[None] - cx
        dy = py[None] - cy
        dz = pz[None] - cz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= radius2) & cok & inb[None]
        okb = ok.astype(jnp.bfloat16)
        pre_g = jax.lax.dot_general(
            okb, slt_g, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rowcnt = jnp.sum(okb.astype(jnp.float32), axis=2)
        pre_l = jax.lax.dot_general(
            rowcnt.astype(jnp.bfloat16), slt_l, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rank = pre_l[:, :, None] + pre_g
        win = ok & (rank < jnp.float32(k))
        packed = (rank.astype(jnp.int32) << _KEY_BITS) | gidx[None]
        val_ref[...] = jnp.where(win, packed, int_big)
        acc_ref[...] = jnp.full((cm, k, g_dim), big_key, jnp.int32)
        w = jnp.sum(win.astype(jnp.float32), axis=1)  # (CM, G)
        w_max = jnp.max(w).astype(jnp.int32)

        for r in range(rounds):
            @pl.when((r < w_max) if predicated else (r >= 0))
            def _():
                val_cur = val_ref[...]
                bmin = jnp.min(val_cur, axis=1)
                val_ref[...] = jnp.where(val_cur == bmin[:, None, :], int_big, val_cur)
                cr = bmin >> _KEY_BITS
                ckey = bmin & ((1 << _KEY_BITS) - 1)
                eq = cr[:, None, :] == kio
                acc_ref[...] = jnp.where(eq, ckey[:, None, :], acc_ref[...])

        out_ref[0, sl, :] = jnp.min(acc_ref[...], axis=2)
        return 0

    lax.fori_loop(0, m // cm, tile, 0, unroll=False)


@partial(jax.jit, static_argnames=("radius", "k", "cm", "phase"))
def bq(centers, center_mask, pos, mask, *, radius, k=64, cm=32, phase="full"):
    b, m, _ = centers.shape
    n = pos.shape[1]
    n_pad = round_up(n, _G)
    l_dim = n_pad // _G
    m_pad = round_up(m, cm)

    def plane(x, pad_val=0.0):
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)), constant_values=pad_val)
        return x.reshape(b, l_dim, _G)

    px = plane(pos[..., 0]); py = plane(pos[..., 1]); pz = plane(pos[..., 2])
    pv = plane(mask.astype(jnp.float32))
    cx = jnp.pad(centers[..., 0], ((0, 0), (0, m_pad - m)))[:, :, None]
    cy = jnp.pad(centers[..., 1], ((0, 0), (0, m_pad - m)))[:, :, None]
    cz = jnp.pad(centers[..., 2], ((0, 0), (0, m_pad - m)))[:, :, None]
    cv = jnp.pad(center_mask.astype(jnp.float32), ((0, 0), (0, m_pad - m)))[:, :, None]
    p_spec = pl.BlockSpec((1, l_dim, _G), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, m_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if phase.startswith("when"):
        rounds = _R if phase == "when" else int(phase[4:])
        out = pl.pallas_call(
            partial(_bq_kernel_when, radius2=float(radius) ** 2, k=k, n=n, cm=cm,
                    rounds=rounds, predicated=(phase == "when")),
            grid=(b,),
            in_specs=[p_spec] * 4 + [c_spec] * 4,
            out_specs=pl.BlockSpec((1, m_pad, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, m_pad, k), jnp.int32),
            scratch_shapes=[pltpu.VMEM((cm, l_dim, _G), jnp.int32),
                            pltpu.VMEM((cm, k, _G), jnp.int32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        )(px, py, pz, pv, cx, cy, cz, cv)
        return out[:, :m]
    out = pl.pallas_call(
        partial(_bq_kernel, radius2=float(radius) ** 2, k=k, n=n, cm=cm, phase=phase),
        grid=(b,),
        in_specs=[p_spec] * 4 + [c_spec] * 4,
        out_specs=pl.BlockSpec((1, m_pad, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, k), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(px, py, pz, pv, cx, cy, cz, cv)
    return out[:, :m]


def timed(fn, *args):
    """Time a fori_loop-chained jit of LOOPS kernel runs; return ms/run."""
    @jax.jit
    def loop(centers, cmask, pos, mask):
        def body(i, carry):
            c, acc = carry
            out = fn(c, cmask, pos, mask)
            # data dependency: nudge centers by a zero derived from out
            z = (jnp.sum(out[0, 0]) & 0).astype(jnp.float32)
            return c + z, acc + out[0, 0, 0]
        return lax.fori_loop(0, LOOPS, body, (centers, jnp.int32(0)))

    out = loop(*args)
    jax.block_until_ready(out)
    int(out[1])  # hard sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(*args)
        int(out[1])
        best = min(best, (time.perf_counter() - t0) / LOOPS)
    return best * 1000


def main(b=36, m=512, n=2048):
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(b, n, 3)) * 5, jnp.float32)
    mask = jnp.ones((b, n), bool)
    centers = pos[:, :m]
    cmask = mask[:, :m]
    for phase in ("full", "mstatic", "munroll"):
        for cm in (32,):
            fn = partial(bq, radius=8.0, cm=cm, phase=phase)
            ms = timed(fn, centers, cmask, pos, mask)
            print(f"phase={phase:8s} cm={cm:3d}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    argv = [int(a) for a in sys.argv[1:]]
    main(*argv)
