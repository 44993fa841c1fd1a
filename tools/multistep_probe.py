"""Per-execute-bubble probe: G train steps per jitted call via lax.scan.

dispatch_probe.py showed the ~3.3 ms/step wall-vs-device gap is NOT the host
fold_in dispatch; the hypothesis is per-execute overhead (the tunnel does not
pipeline consecutive executes even when queued). If true, running G steps per
execute amortizes the bubble: wall(G)/G -> device-busy as G grows.

Usage: python tools/multistep_probe.py [train|eval] [B] [N]
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REPEATS = 3


def main(which="train", b=16, n=10240):
    from dl_biomass_tpu.core.cloud import CloudBatch
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.loss import weighted_component_mse
    from dl_biomass_tpu.train.trainer import Trainer, TrainState

    rng = np.random.default_rng(0)

    def mk(g):  # G stacked batches (leading scan axis)
        return CloudBatch(
            pos=jnp.asarray(rng.normal(size=(g, b, n, 3)) * 5, jnp.float32),
            feat=jnp.asarray(rng.normal(size=(g, b, n, 1)), jnp.float32),
            mask=jnp.ones((g, b, n), bool),
            y=jnp.asarray(rng.normal(size=(g, b, 4)), jnp.float32),
        )

    cfg = TrainConfig(hp=HyperParams(batch_size=b))
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    flat0 = mk(1)
    one = jax.tree.map(lambda x: x[0], flat0)
    state0 = trainer.init_state(jax.random.key(0), one)
    tx = trainer.tx
    key = jax.random.key(1)

    def train_body(state, xs):
        batch, k = xs
        k_fps, k_drop = jax.random.split(k)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, rngs={"fps": k_fps, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            w = jnp.any(batch.mask, axis=1)
            return weighted_component_mse(out, batch.y, w), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        return TrainState(params=params,
                          batch_stats=updates.get("batch_stats", state.batch_stats),
                          opt_state=opt_state, step=state.step + 1), loss

    def eval_body(carry, batch):
        params, batch_stats = carry
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch, train=False)
        w = jnp.any(batch.mask, axis=1)
        return carry, weighted_component_mse(out, batch.y, w)

    for g in (1, 2, 4, 8):
        batches = mk(g)
        if which == "train":
            @partial(jax.jit, donate_argnums=(0,))
            def steps(state, batches, base_key, g=g):
                ks = jax.random.split(jax.random.fold_in(base_key, state.step), g)
                return lax_scan(train_body, state, (batches, ks))

            from jax import lax
            def lax_scan(f, init, xs):
                return lax.scan(f, init, xs)

            state = jax.tree.map(jnp.copy, state0)
            state, losses = steps(state, batches, key)
            float(jnp.sum(losses))
            best = float("inf")
            n_calls = max(1, 8 // g)
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                for _ in range(n_calls):
                    state, losses = steps(state, batches, key)
                float(jnp.sum(losses))
                best = min(best, (time.perf_counter() - t0) / (n_calls * g))
        else:
            from jax import lax

            @jax.jit
            def esteps(params, batch_stats, batches):
                _, losses = lax.scan(eval_body, (params, batch_stats), batches)
                return losses

            state = state0
            losses = esteps(state.params, state.batch_stats, batches)
            float(jnp.sum(losses))
            best = float("inf")
            n_calls = max(1, 8 // g)
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                outs = []
                for _ in range(n_calls):
                    outs.append(esteps(state.params, state.batch_stats, batches))
                float(sum(jnp.sum(o) for o in outs))
                best = min(best, (time.perf_counter() - t0) / (n_calls * g))
        print(f"G={g}: {best*1000:.2f} ms/step ({b / best:.1f} clouds/s)")


if __name__ == "__main__":
    args = sys.argv[1:]
    which = args[0] if args else "train"
    rest = [int(a) for a in args[1:]]
    main(which, *rest)
