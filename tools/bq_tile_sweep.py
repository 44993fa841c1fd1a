"""Tile sweep for the rank-scatter exact ball-query kernel at SA2 scale.

The SA2 ball query (B=16, M=512 centroids, N=2048 points, K=64) measures
~3.0 ms in the round-3 train/eval traces — the largest single device item.
The centroid tile ``cm`` trades per-tile fixed cost (loop iterations) against
VMEM working-set size; this sweeps it. Semantics are identical for every cm.

Usage: python tools/bq_tile_sweep.py [M] [N]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from dl_biomass_tpu.ops.pallas_ballquery import ball_query_pallas

B = 16
REPEATS = 3
STEPS = 8


def main(m=512, n=2048):
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(B, n, 3)) * 5, jnp.float32)
    mask = jnp.ones((B, n), bool)
    centers = pos[:, :m]
    cmask = mask[:, :m]
    ref = None
    for cm in (16, 32, 64, 128, 256):
        if m % cm and cm > m:
            continue
        idx, nm = ball_query_pallas(centers, cmask, pos, mask, radius=8.0, cm=cm)
        int(idx.ravel()[0])
        if ref is None:
            ref = (np.asarray(idx), np.asarray(nm))
        else:
            ok = np.array_equal(ref[0], np.asarray(idx)) and np.array_equal(
                ref[1], np.asarray(nm))
            if not ok:
                print(f"cm={cm}: OUTPUT MISMATCH", flush=True)
                continue
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            outs = []
            for i in range(STEPS):
                idx, nm = ball_query_pallas(centers, cmask, pos, mask,
                                            radius=8.0, cm=cm)
                outs.append(idx.ravel()[0])
            int(sum(int(o) for o in outs))
            best = min(best, (time.perf_counter() - t0) / STEPS)
        print(f"cm={cm}: {best*1000:.3f} ms", flush=True)


if __name__ == "__main__":
    argv = [int(a) for a in sys.argv[1:]]
    main(*argv)
