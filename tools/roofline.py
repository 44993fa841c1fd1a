"""Roofline check: XLA cost analysis of the train/eval steps vs v5e peaks.

Lowers and compiles the flagship train/eval steps on the CURRENT backend and
prints each computation's FLOPs and bytes accessed next to the v5e roofline
floors (197 bf16 TFLOP/s, 819 GB/s HBM). Run on the TPU backend for
representative fusion; the CPU backend overestimates bytes (different fusion
decisions — measured 69.8 GB vs a ~34 ms real step that bounds traffic at
~27 GB).

Usage: python tools/roofline.py [B] [N]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from dl_biomass_tpu.core.cloud import CloudBatch
from dl_biomass_tpu.core.config import HyperParams, TrainConfig
from dl_biomass_tpu.models.pointnet2 import build_model
from dl_biomass_tpu.train.trainer import Trainer

V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def main(b: int = 16, n: int = 10240) -> None:
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
    state = trainer.init_state(jax.random.key(0), batch)
    key = jax.random.key(1)

    for name, fn, args in [
        ("train", trainer._train_step, (state, batch, key)),
        ("eval", trainer._eval_step, (state.params, state.batch_stats, batch)),
    ]:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bts = float(ca.get("bytes accessed", 0.0))
        print(
            f"{name}: {flops / 1e9:.1f} GFLOP, {bts / 1e9:.2f} GB accessed | "
            f"v5e floors: compute {flops / V5E_BF16_FLOPS * 1e3:.2f} ms, "
            f"HBM {bts / V5E_HBM_BPS * 1e3:.2f} ms"
        )


if __name__ == "__main__":
    argv = [int(a) for a in sys.argv[1:]]
    main(*argv)
