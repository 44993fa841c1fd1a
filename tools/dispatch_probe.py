"""Quantify per-step host/dispatch overhead in the train-step timing loop.

The round-3 trace shows ~29.7 ms device-busy inside a ~33.4 ms wall step —
a ~3.7 ms/step gap. Candidate causes: the per-step ``jax.random.fold_in``
dispatch, pytree flatten cost, and the tunnel's execute-RPC latency. This
probe times three variants of the same 8-step chain:

  a) baseline      — fold_in on host per step (bench.py's loop)
  b) prekeys       — all step keys precomputed before the window
  c) infold        — key derived inside the jitted step from state.step
                     (zero per-step host computations beyond the step call)

Usage: python tools/dispatch_probe.py [B] [N]
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

TIMED_STEPS = 8
REPEATS = 3


def main(b=16, n=10240):
    from dl_biomass_tpu.core.cloud import CloudBatch
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.loss import weighted_component_mse
    from dl_biomass_tpu.train.trainer import Trainer, TrainState

    rng = np.random.default_rng(0)
    batch = CloudBatch(
        pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 5, jnp.float32),
        feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
        mask=jnp.ones((b, n), bool),
        y=jnp.asarray(rng.normal(size=(b, 4)), jnp.float32),
    )
    cfg = TrainConfig(hp=HyperParams(batch_size=b))
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    state0 = trainer.init_state(jax.random.key(0), batch)
    key = jax.random.key(1)

    def timed(run):
        best = float("inf")
        state = jax.tree.map(jnp.copy, state0)
        state, loss = run(state, 0)  # compile/warm
        float(loss)
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for i in range(TIMED_STEPS):
                state, loss = run(state, i)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / TIMED_STEPS)
        return best * 1000

    # a) baseline: host fold_in per step
    def run_a(state, i):
        return trainer._train_step(state, batch, jax.random.fold_in(key, i))

    # b) precomputed keys
    keys = [jax.random.fold_in(key, i) for i in range(TIMED_STEPS)]
    for k in keys:
        k.block_until_ready()

    def run_b(state, i):
        return trainer._train_step(state, batch, keys[i])

    # c) fold inside jit from state.step
    tx = trainer.tx

    @partial(jax.jit, donate_argnums=(0,))
    def step_infold(state, batch, base_key):
        k = jax.random.fold_in(base_key, state.step)
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

    def run_c(state, i):
        return step_infold(state, batch, key)

    for name, run in [("a_host_fold_in", run_a), ("b_prekeys", run_b),
                      ("c_infold", run_c)]:
        ms = timed(run)
        print(f"{name}: {ms:.2f} ms/step ({b / ms * 1000:.1f} clouds/s)")


if __name__ == "__main__":
    argv = [int(a) for a in sys.argv[1:]]
    main(*argv)
