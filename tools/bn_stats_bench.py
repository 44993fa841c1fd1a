"""BN train-stat pass formulations at SA edge-tensor shapes (TPU).

The round-4/5 profiles show ~10.8 ms/step of convert_reduce fusions (the
masked sum/sumsq stat passes + BN backward reduces) streaming at only
~226 GB/s while the iota_reduce masked-max fusion reads the same class of
tensor at ~325 GB/s. This measures alternative stat formulations.

Usage: python tools/bn_stats_bench.py
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

LOOPS = 10


def stats_current(x, m3):
    """Mirror of MaskedBatchNorm's masked one-pass sum/sumsq."""
    xf = x.astype(jnp.float32)
    m = m3[..., None].astype(jnp.float32)
    xm = xf * m
    s1 = jnp.sum(xm, axis=(0, 1, 2))
    s2 = jnp.sum(xm * xf, axis=(0, 1, 2))
    return s1, s2


def stats_unmasked(x, m3):
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(0, 1, 2))
    s2 = jnp.sum(xf * xf, axis=(0, 1, 2))
    return s1, s2


def stats_twostage(x, m3):
    xf = x.astype(jnp.float32)
    m = m3[..., None].astype(jnp.float32)
    xm = xf * m
    p1 = jnp.sum(xm, axis=2)
    p2 = jnp.sum(xm * xf, axis=2)
    return jnp.sum(p1, axis=(0, 1)), jnp.sum(p2, axis=(0, 1))


def stats_bf16_partial(x, m3):
    """Partial K-axis sums in bf16 (64 terms, |x|~1: ~1e-2 relative), final
    reduce f32 — halves the first-stage accumulator width."""
    m = m3[..., None].astype(x.dtype)
    xm = x * m
    p1 = jnp.sum(xm, axis=2, dtype=x.dtype).astype(jnp.float32)
    p2 = jnp.sum(xm * x, axis=2, dtype=x.dtype).astype(jnp.float32)
    return jnp.sum(p1, axis=(0, 1)), jnp.sum(p2, axis=(0, 1))


def _stats_kernel(x_ref, mask_ref, out_ref, *, mt: int, k: int):
    m = mask_ref.shape[1]
    c = x_ref.shape[2]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[...] = jnp.zeros((2, c), jnp.float32)

    def tile(t, carry):
        s1, s2 = carry
        rs = pl.ds(pl.multiple_of(t * mt * k, mt * k), mt * k)
        ms = pl.ds(pl.multiple_of(t * mt, mt), mt)
        xf = x_ref[0, rs, :].astype(jnp.float32).reshape(mt, k, -1)
        mcol = mask_ref[0, ms, :][:, :, None]  # (MT, K, 1) f32
        xm = xf * mcol
        s1 = s1 + jnp.sum(xm, axis=(0, 1)).reshape(1, c)
        s2 = s2 + jnp.sum(xm * xf, axis=(0, 1)).reshape(1, c)
        return s1, s2

    z = jnp.zeros((1, c), jnp.float32)
    s1, s2 = lax.fori_loop(0, m // mt, tile, (z, z), unroll=False)
    out_ref[0:1, :] += s1
    out_ref[1:2, :] += s2


@partial(jax.jit, static_argnames=("mt",))
def stats_pallas(x, m3, mt: int = 256):
    b, mm, k, c = x.shape
    out = pl.pallas_call(
        partial(_stats_kernel, mt=mt, k=k),
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, mm * k, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mm, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(x.reshape(b, mm * k, c), m3.astype(jnp.float32))
    return out[0], out[1]


def timed(fn, x, m3):
    @jax.jit
    def loop(x, m3):
        def body(i, acc):
            s1, s2 = fn(x, m3)
            return acc + jnp.sum(s1) + jnp.sum(s2)
        return lax.fori_loop(0, LOOPS, body, jnp.float32(0))

    out = loop(x, m3)
    float(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(x, m3)
        float(out)
        best = min(best, (time.perf_counter() - t0) / LOOPS)
    return best * 1000


def main():
    rng = np.random.default_rng(0)
    for name, (b, m, k, c) in [
        ("SA1c64", (36, 2048, 64, 64)),
        ("SA2c128", (36, 512, 64, 128)),
    ]:
        x = jnp.asarray(rng.normal(size=(b, m, k, c)), jnp.bfloat16)
        m3 = jnp.asarray(rng.random(size=(b, m, k)) > 0.1)
        gb = b * m * k * c * 2 / 1e9
        want = np.asarray(stats_current(x, m3)[0])
        for label, fn in [
            ("current  ", stats_current),
            ("unmasked ", stats_unmasked),
            ("twostage ", stats_twostage),
            ("bf16part ", stats_bf16_partial),
            ("pallas   ", stats_pallas),
        ]:
            ms = timed(fn, x, m3)
            got = np.asarray(fn(x, m3)[0])
            tag = ""
            if label.strip() not in ("unmasked",):
                rel = float(np.max(np.abs(got - want) / (np.abs(want) + 1e-3)))
                tag = f"  max_rel_s1={rel:.2e}"
            print(f"{name} {label}: {ms:7.3f} ms  ({gb/ms*1000:6.1f} GB/s){tag}",
                  flush=True)


if __name__ == "__main__":
    main()
