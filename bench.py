"""Headline benchmark: clouds/sec/chip at ~10k points (train + infer).

BASELINE.json's metric is "Clouds/sec/chip at 10k pts (train + infer)" with a
>=10x-the-reference-GPU target. The reference never recorded throughput
(SURVEY.md §6) and its torch/PyG stack is not installed here, so vs_baseline is
computed against a documented estimate:

  REFERENCE_GPU_CLOUDS_PER_SEC = 50.0
  PointNet++ SSG fwd+bwd at ~10k pts/cloud on a single V100/RTX-class GPU with
  torch_cluster fps+radius kernels runs ~20-25 ms/cloud => ~40-50 clouds/s;
  we take the favourable end. (The reference's *actual* end-to-end rate was far
  lower — it re-read the biomass CSV per sample inside __getitem__ — so this is
  a conservative baseline.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...detail}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_CLOUDS_PER_SEC = 50.0

B = 16  # clouds per step
N = 10240  # ~10k pts, lane-aligned
TIMED_STEPS = 8


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from dl_biomass_tpu.core.cloud import CloudBatch
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    batch = CloudBatch(
        pos=jnp.asarray(rng.normal(size=(B, N, 3)) * 5, jnp.float32),
        feat=jnp.asarray(rng.normal(size=(B, N, 1)), jnp.float32),
        mask=jnp.ones((B, N), bool),
        y=jnp.asarray(rng.normal(size=(B, 4)), jnp.float32),
    )

    cfg = TrainConfig(hp=HyperParams(batch_size=B))
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.key(0), batch)

    key = jax.random.key(1)

    # warmup / compile. NOTE: on this backend block_until_ready returns before
    # execution finishes (async-dispatch artifact) — only a host transfer truly
    # synchronizes, so every timing boundary pulls a scalar to host.
    state, loss = trainer._train_step(state, batch, key)
    float(loss)
    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        state, loss = trainer._train_step(state, batch, jax.random.fold_in(key, i))
    float(loss)  # all steps chain through `state`; reading the last syncs all
    train_dt = (time.perf_counter() - t0) / TIMED_STEPS
    train_cps = B / train_dt

    # inference: device executes queued programs in order, so syncing the last
    # call's output (a real host transfer) bounds all of them — same
    # methodology as the chained train steps, without per-call dispatch latency
    loss, out = trainer._eval_step(state.params, state.batch_stats, batch)
    float(loss)
    t0 = time.perf_counter()
    losses = []
    for i in range(TIMED_STEPS):
        loss, out = trainer._eval_step(state.params, state.batch_stats, batch)
        losses.append(loss)
    float(sum(losses))
    infer_dt = (time.perf_counter() - t0) / TIMED_STEPS
    infer_cps = B / infer_dt

    value = round(train_cps, 2)
    print(
        json.dumps(
            {
                "metric": "train_clouds_per_sec_per_chip_10k_pts",
                "value": value,
                "unit": "clouds/s",
                "vs_baseline": round(value / REFERENCE_GPU_CLOUDS_PER_SEC, 3),
                "infer_clouds_per_sec": round(infer_cps, 2),
                "train_ms_per_step": round(train_dt * 1000, 2),
                "infer_ms_per_step": round(infer_dt * 1000, 2),
                "batch": B,
                "points_per_cloud": N,
                "device": str(jax.devices()[0]),
                "baseline_estimate_note": "reference GPU est. 50 clouds/s (see module docstring)",
                # the baseline is an estimate; report the break-even point so
                # the multiple isn't hostage to a single point value
                "baseline_sensitivity": (
                    f"vs_baseline >= 10x holds for any reference baseline "
                    f"<= {value / 10.0:.1f} clouds/s"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
