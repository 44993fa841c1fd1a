"""Training objective for sequential studies.

Parity with the reference's Optuna objective (``hyperparameter_tuning.py:57-227``):
per trial — suggest hyperparameters (the reference's exact active search space:
lr log-uniform 1e-6..1e-1, num_augs 0..10, batch_size 8..40 step 4, patience
5..30 step 5; the rest fixed at the committed constants), rebuild the model,
train with early stopping, report val MSE per epoch, honor pruning, and return
``min(val_mse_list)``.

Unlike the reference, datasets are NOT re-read from disk per trial — the
device-resident dataset is shared across trials.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from dl_biomass_tpu.core.config import HyperParams, TrainConfig
from dl_biomass_tpu.sweep.study import Trial, TrialPruned


def make_training_objective(
    train_ds,
    val_ds,
    *,
    base_cfg: Optional[TrainConfig] = None,
    max_num_epochs: int = 100,
    seed: int = 0,
    search_batch_and_augs: bool = True,
    log_fn=print,
) -> Callable[[Trial], float]:
    base_cfg = base_cfg or TrainConfig()

    def objective(trial: Trial) -> float:
        hp = HyperParams(
            lr=trial.suggest_float("lr", 1e-6, 1e-1, log=True),
            num_augs=trial.suggest_int("num_augs", 0, 10) if search_batch_and_augs
            else base_cfg.hp.num_augs,
            batch_size=trial.suggest_int("batch_size", 8, 40, step=4)
            if search_batch_and_augs else base_cfg.hp.batch_size,
            patience=trial.suggest_int("patience", 5, 30, step=5),
            weight_decay=base_cfg.hp.weight_decay,
            num_points=base_cfg.hp.num_points,
            ground_filter_height=base_cfg.hp.ground_filter_height,
            activation_function=base_cfg.hp.activation_function,
            neuron_multiplier=base_cfg.hp.neuron_multiplier,
            dropout_probability=base_cfg.hp.dropout_probability,
            optimizer=base_cfg.hp.optimizer,
        )
        cfg = TrainConfig(hp=hp, model=base_cfg.model, num_epochs=max_num_epochs)

        from dl_biomass_tpu.models.pointnet2 import build_model
        from dl_biomass_tpu.train.trainer import EarlyStopping, Trainer

        model = build_model(cfg, num_features=train_ds.num_features)
        trainer = Trainer(model, cfg)
        key = jax.random.fold_in(jax.random.key(seed), trial.number)
        state = trainer.init_state(key, next(train_ds.batches(hp.batch_size)))

        stopper = EarlyStopping(hp.patience, True)
        best = float("inf")
        for epoch in range(max_num_epochs):
            ek = jax.random.fold_in(key, epoch)
            # per-step fused path, NOT the scan epoch: the scanned epoch's
            # computation shape includes the step count S = f(num_augs,
            # batch_size), so a search over both would compile O(augs x
            # batches) scan programs; the fused step compiles once per
            # batch_size and serves every (augs, epoch-length) combination.
            state, train_mse, _ = trainer.train_epoch_fused(
                state, train_ds, ek,
                batch_size=hp.batch_size, num_augs=hp.num_augs, shuffle=True,
            )
            val_mse = trainer.evaluate_fused(state, val_ds, batch_size=hp.batch_size)
            best = min(best, val_mse)
            trial.report(val_mse, epoch)
            if stopper.update(val_mse):
                log_fn(f"  trial {trial.number}: early stop at epoch {epoch}")
                return best
            if trial.should_prune():
                log_fn(f"  trial {trial.number}: pruned at epoch {epoch}")
                raise TrialPruned()
        return best

    return objective
