"""Pallas block-DMA vs XLA HBM bandwidth probe.

Round 2 measured this stack's Pallas block DMA at ~26 GB/s while plain XLA
elementwise ops stream at ~220 GB/s — a 9x gap that inverted the fused-SA-
kernel trade (docs/BENCHMARKS.md "the Pallas-DMA wall") and governs every
kernel design here. The gap is an axon-stack artifact, not a TPU property,
so it must be RE-MEASURED whenever the tunnel/libtpu stack changes: if the
cap lifts, `model.fused_sa` should be flipped on and the headline re-run.

Prints one line per measurement and a final verdict line:
  PALLAS_DMA_CAP: {"xla_gbps": ..., "pallas_gbps": ..., "capped": true/false}

Usage: python tools/dma_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REPEATS = 5
CHAIN = 16  # iterations per host sync: the tunnel's dispatch+sync round trip
# is tens of ms, so a 1-op-per-sync timing measures latency, not bandwidth —
# chain K dependent calls and sync once (same methodology as bench.py)


def _sync(x):
    # block_until_ready returns early on this backend; a host transfer syncs
    return float(jnp.sum(x[..., :1, :1]))


def _time_chained(fn, x):
    x = fn(x)
    _sync(x)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            x = fn(x)
        _sync(x)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def xla_bandwidth(mb: int = 256) -> float:
    n = mb * 2**20 // 4
    x = jnp.arange(n, dtype=jnp.float32).reshape(-1, 1024)
    f = jax.jit(lambda a: a + 1.0)
    dt = _time_chained(f, x)
    gbps = 2 * n * 4 / dt / 1e9  # read + write
    print(f"XLA fused add over {mb} MB: {dt*1e3:.2f} ms/iter -> {gbps:.1f} GB/s")
    return gbps


def pallas_bandwidth(block_kb: int = 1024, blocks: int = 128) -> float:
    """Trivial-body copy kernel: bandwidth = bytes moved / time."""
    rows = block_kb * 1024 // (4 * 128)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(blocks, rows, 128)), jnp.float32
    )

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    f = jax.jit(
        lambda a: pl.pallas_call(
            kernel,
            grid=(blocks,),
            in_specs=[pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        )(a)
    )
    dt = _time_chained(f, x)
    nbytes = x.size * 4
    gbps = 2 * nbytes / dt / 1e9
    print(
        f"Pallas copy {blocks} x {block_kb} KB blocks: {dt*1e3:.2f} ms/iter -> {gbps:.1f} GB/s"
    )
    return gbps


def main() -> None:
    print(f"backend: {jax.devices()[0]}")
    xla = xla_bandwidth()
    best_pallas = 0.0
    for kb in (256, 1024, 4096):
        best_pallas = max(best_pallas, pallas_bandwidth(block_kb=kb))
    capped = best_pallas < 0.5 * xla
    import json

    print(
        "PALLAS_DMA_CAP: "
        + json.dumps(
            {
                "xla_gbps": round(xla, 1),
                "pallas_gbps": round(best_pallas, 1),
                "capped": capped,
                "action": (
                    "cap persists: keep fused_sa off"
                    if capped
                    else "cap LIFTED: flip model.fused_sa on and re-measure bench.py"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
