"""Train-throughput batch sweep at the headline shape (10240 pts/cloud).

VERDICT r2's bar is >=500 train clouds/s; per-step fixed cost (~1.7 ms:
sequential FPS argmax chain + kernel-launch floors) amortizes with batch, and
the reference's own operating point is batch 36 (`main.py:41`; its HP search
spans 8-40). This sweep measures clouds/s at B in {16, 32, 36, 48, 64} so the
headline can report both the BASELINE reporting point (B=16) and the
reference-matching batch.

Usage: python tools/batch_sweep.py [B ...]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 10240
TIMED_STEPS = 8
REPEATS = 3


def main(batches) -> None:
    from dl_biomass_tpu.core.cloud import CloudBatch
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    rows = {}
    for b in batches:
        batch = CloudBatch(
            pos=jnp.asarray(rng.normal(size=(b, N, 3)) * 5, jnp.float32),
            feat=jnp.asarray(rng.normal(size=(b, N, 1)), jnp.float32),
            mask=jnp.ones((b, N), bool),
            y=jnp.asarray(rng.normal(size=(b, 4)), jnp.float32),
        )
        cfg = TrainConfig(hp=HyperParams(batch_size=b))
        model = build_model(cfg, num_features=1)
        trainer = Trainer(model, cfg)
        state = trainer.init_state(jax.random.key(0), batch)
        key = jax.random.key(1)
        state, loss = trainer._train_step(state, batch, key)
        float(loss)  # hard sync (block_until_ready returns early on this stack)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for i in range(TIMED_STEPS):
                state, loss = trainer._train_step(
                    state, batch, jax.random.fold_in(key, i)
                )
            float(loss)
            best = min(best, (time.perf_counter() - t0) / TIMED_STEPS)
        loss, _ = trainer._eval_step(state.params, state.batch_stats, batch)
        float(loss)
        beste = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            ls = []
            for i in range(TIMED_STEPS):
                loss, _ = trainer._eval_step(state.params, state.batch_stats, batch)
                ls.append(loss)
            float(sum(ls))
            beste = min(beste, (time.perf_counter() - t0) / TIMED_STEPS)
        rows[str(b)] = {
            "clouds_per_sec": round(b / best, 1),
            "ms_per_step": round(best * 1000, 2),
            "ms_per_16_clouds": round(best * 1000 * 16 / b, 2),
            "infer_clouds_per_sec": round(b / beste, 1),
            "infer_ms_per_step": round(beste * 1000, 2),
        }
        print(f"B={b}: {rows[str(b)]}", file=sys.stderr)
    print(json.dumps({"metric": "train_batch_sweep_10k_pts", "rows": rows,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    bs = [int(a) for a in sys.argv[1:]] or [16, 32, 36, 48, 64]
    main(bs)
