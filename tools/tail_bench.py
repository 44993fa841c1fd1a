"""fused_tail vs unfused Dense+masked_max at SA-layer shapes (TPU).

Dispatch-amortized (fori-chained jit, one host sync per window).
Usage: python tools/tail_bench.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from dl_biomass_tpu.ops.pallas_tail import fused_tail
from dl_biomass_tpu.ops.pooling import masked_max

LOOPS = 10


def unfused(a2, mask, w3, b3):
    y = jnp.dot(a2.astype(jnp.bfloat16), w3.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    z = (y + b3).astype(jnp.bfloat16)
    return masked_max(z, mask, axis=2)


def timed(fn, *args, grad=False):
    if grad:
        def loss(a2, w3, b3, mask):
            return jnp.sum(fn(a2, mask, w3, b3).astype(jnp.float32))
        gfn = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def loop(a2, mask, w3, b3):
            def body(i, carry):
                a2c, acc = carry
                da2, dw, db = gfn(a2c, w3, b3, mask)
                return a2c + 0 * da2, acc + jnp.sum(db)
            return lax.fori_loop(0, LOOPS, body, (a2, jnp.float32(0)))
    else:
        @jax.jit
        def loop(a2, mask, w3, b3):
            def body(i, carry):
                a2c, acc = carry
                out = fn(a2c, mask, w3, b3)
                # full-output dependency: a [0,0,0] probe lets XLA DCE the
                # computation down to one element (measured 2.9 "ms" = an
                # impossible 830 GB/s); the sum forces every element live
                return a2c, acc + jnp.sum(out.astype(jnp.float32))
            return lax.fori_loop(0, LOOPS, body, (a2, jnp.float32(0)))

    out = loop(*args)
    float(out[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(*args)
        float(out[1])
        best = min(best, (time.perf_counter() - t0) / LOOPS)
    return best * 1000


def main():
    rng = np.random.default_rng(0)
    for name, (b, m, k, c2, c3) in [
        ("SA1", (36, 2048, 64, 64, 128)),
        ("SA2", (36, 512, 64, 128, 256)),
    ]:
        a2 = jnp.asarray(rng.normal(size=(b, m, k, c2)), jnp.bfloat16)
        mask = jnp.asarray(rng.random(size=(b, m, k)) > 0.1)
        w3 = jnp.asarray(rng.normal(size=(c2, c3)) * 0.1, jnp.float32)
        b3 = jnp.asarray(rng.normal(size=(c3,)) * 0.1, jnp.float32)
        for label, fn in (("unfused", unfused),
                          ("fused  ", lambda a, ms, w, bb: fused_tail(a, ms, w, bb))):
            fwd = timed(fn, a2, mask, w3, b3)
            fb = timed(fn, a2, mask, w3, b3, grad=True)
            print(f"{name} {label}: fwd {fwd:7.3f} ms   fwd+bwd {fb:7.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
