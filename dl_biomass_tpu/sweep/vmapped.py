"""Vmapped parallel hyperparameter trials.

The reference explores hyperparameters with *sequential* Optuna trials, each
rebuilding datasets and model and running a full early-stopped training loop
(``hyperparameter_tuning.py:57-227``) — days of wall clock. On TPU the
continuous axes (lr, weight decay) vmap cleanly: T trials train simultaneously
under ONE compiled train step, sharing every batch's device data, with per-trial
optimizer hyperparameters and per-trial early-stopping masks (a stopped trial's
update is frozen via jnp.where, so shapes never change).

Axes that change shapes (batch size, num_augs, point count) group trials into
separate vmapped runs — see :func:`grid_sweep`.

Multi-chip: trials are embarrassingly parallel, so the trial axis shards over
EVERY device of a mesh (``VmappedSweep(..., mesh=...)``) — each chip trains
T/D trials under the same compiled step with the batch replicated; XLA inserts
no collectives at all (the only cross-device traffic is the per-epoch val-MSE
host read). This is the TPU-idiomatic replacement for distributing Optuna
workers (reference ``hyperparameter_tuning.py:249,306``).

The optimizer is re-implemented inline (rather than optax) because the moment
update must be a pure function of per-trial scalars to vmap: torch-``Adam``
semantics (L2 folded into the gradient pre-moments) and decoupled ``AdamW``.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dl_biomass_tpu.train.loss import weighted_component_mse

_B1, _B2, _EPS = 0.9, 0.999, 1e-8


def _adam_update(params, grads, mu, nu, count, lr, wd, adamw: bool):
    """One Adam/AdamW step with per-call scalar lr/wd (vmappable)."""
    count = count + 1
    b1c = 1.0 - _B1 ** count
    b2c = 1.0 - _B2 ** count

    def upd(p, g, m, v):
        if not adamw:
            g = g + wd * p  # torch Adam L2 (main.py:84 semantics)
        m = _B1 * m + (1.0 - _B1) * g
        v = _B2 * v + (1.0 - _B2) * jnp.square(g)
        step = (m / b1c) / (jnp.sqrt(v / b2c) + _EPS)
        if adamw:
            step = step + wd * p
        return p - lr * step, m, v

    flat_p, tree = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_m = jax.tree.leaves(mu)
    flat_v = jax.tree.leaves(nu)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = tree.unflatten([o[0] for o in out])
    new_m = tree.unflatten([o[1] for o in out])
    new_v = tree.unflatten([o[2] for o in out])
    return new_p, new_m, new_v, count


@dataclass
class TrialResult:
    lr: float
    weight_decay: float
    batch_size: int
    num_augs: int
    best_val_mse: float
    epochs_run: int
    stopped_early: bool


class VmappedSweep:
    """T simultaneous trials over (lr, weight_decay) with shared data."""

    def __init__(self, model, lrs: Sequence[float], wds: Sequence[float],
                 optimizer: str = "Adam", patience: int = 10,
                 early_stopping: bool = True, mesh=None):
        assert len(lrs) == len(wds)
        self.model = model
        self.lrs = jnp.asarray(lrs, jnp.float32)
        self.wds = jnp.asarray(wds, jnp.float32)
        self.t = len(lrs)
        self.patience = patience
        self.early_stopping = early_stopping
        self.adamw = optimizer == "AdamW"
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            d = mesh.devices.size
            if self.t % d:
                raise ValueError(
                    f"{self.t} trials not divisible by {d} mesh devices"
                )
            # trials shard over EVERY mesh axis (embarrassingly parallel)
            self._trial_s = NamedSharding(mesh, P(tuple(mesh.axis_names)))
            self._repl_s = NamedSharding(mesh, P())
            self.lrs = jax.device_put(self.lrs, self._trial_s)
            self.wds = jax.device_put(self.wds, self._trial_s)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _shard_trials(self, tree):
        """Place every (T, ...)-leading leaf sharded on the trial axis."""
        if self.mesh is None:
            return tree
        return jax.tree.map(lambda x: jax.device_put(x, self._trial_s), tree)

    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        return jax.tree.map(lambda x: jax.device_put(x, self._repl_s), tree)

    # -- state -------------------------------------------------------------------

    def init_states(self, key: jax.Array, example_batch):
        def init_one(k):
            return self.model.init(
                {"params": k, "fps": jax.random.fold_in(k, 1), "dropout": jax.random.fold_in(k, 2)},
                example_batch, train=True,
            )

        variables = jax.jit(jax.vmap(init_one))(jax.random.split(key, self.t))
        params = variables["params"]
        bstats = variables.get("batch_stats", {})
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        count = jnp.zeros((self.t,), jnp.float32)
        return self._shard_trials(
            dict(params=params, batch_stats=bstats, mu=mu, nu=nu, count=count)
        )

    # -- compiled steps ------------------------------------------------------------

    def _build_train_step(self):
        model, adamw = self.model, self.adamw

        def one(params, bstats, mu, nu, count, lr, wd, active, key, batch):
            k_fps, k_drop = jax.random.split(key)

            def loss_fn(p):
                out, upd = model.apply(
                    {"params": p, "batch_stats": bstats}, batch, train=True,
                    rngs={"fps": k_fps, "dropout": k_drop}, mutable=["batch_stats"],
                )
                w = jnp.any(batch.mask, axis=1)
                return weighted_component_mse(out, batch.y, w), upd

            (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_p, new_m, new_v, new_c = _adam_update(
                params, grads, mu, nu, count, lr, wd, adamw
            )
            new_b = upd.get("batch_stats", bstats)
            # frozen (early-stopped) trials keep their state bit-for-bit
            # (active is a per-trial scalar here — vmap axis 0)
            params = jax.tree.map(lambda n, o: jnp.where(active, n, o), new_p, params)
            mu = jax.tree.map(lambda n, o: jnp.where(active, n, o), new_m, mu)
            nu = jax.tree.map(lambda n, o: jnp.where(active, n, o), new_v, nu)
            bstats = jax.tree.map(lambda n, o: jnp.where(active, n, o), new_b, bstats)
            count = jnp.where(active, new_c, count)
            return params, bstats, mu, nu, count, loss

        vm = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))

        @jax.jit
        def step(state, lrs, wds, active, keys, batch):
            p, b, m, v, c, loss = vm(
                state["params"], state["batch_stats"], state["mu"], state["nu"],
                state["count"], lrs, wds, active, keys, batch,
            )
            return dict(params=p, batch_stats=b, mu=m, nu=v, count=c), loss

        return step

    def _build_eval_step(self):
        model = self.model

        def one(params, bstats, batch):
            out = model.apply({"params": params, "batch_stats": bstats}, batch, train=False)
            w = jnp.any(batch.mask, axis=1)
            return weighted_component_mse(out, batch.y, w)

        return jax.jit(jax.vmap(one, in_axes=(0, 0, None)))

    # -- run ------------------------------------------------------------------------

    def run(
        self,
        train_ds,
        val_ds,
        *,
        key: jax.Array,
        batch_size: int,
        num_augs: int = 0,
        num_epochs: int = 100,
        log_fn=print,
    ) -> List[TrialResult]:
        example = next(train_ds.batches(batch_size))
        state = self.init_states(key, example)
        active = np.ones(self.t, bool)
        trigger = np.zeros(self.t, int)
        last_val = np.full(self.t, np.inf)
        best_val = np.full(self.t, np.inf)
        epochs_run = np.zeros(self.t, int)

        for epoch in range(num_epochs):
            ek = jax.random.fold_in(key, epoch)
            for i, batch in enumerate(
                train_ds.batches(batch_size, key=ek, num_augs=num_augs, shuffle=True)
            ):
                keys = self._shard_trials(
                    jax.random.split(jax.random.fold_in(ek, i), self.t)
                )
                state, loss = self._train_step(
                    state, self.lrs, self.wds,
                    self._shard_trials(jnp.asarray(active)),
                    keys, self._replicate(batch),
                )
            vals = []
            for batch in val_ds.batches(batch_size):
                vals.append(self._eval_step(state["params"], state["batch_stats"],
                                            self._replicate(batch)))
            val_mse = np.mean(np.stack([np.asarray(v) for v in vals]), axis=0)

            epochs_run[active] = epoch + 1
            best_val = np.where(active, np.minimum(best_val, val_mse), best_val)
            if self.early_stopping:
                rising = val_mse > last_val
                trigger = np.where(active & rising, trigger + 1, np.where(active, 0, trigger))
                last_val = np.where(active & ~rising, val_mse, last_val)
                newly_stopped = active & (trigger >= self.patience)
                active = active & ~newly_stopped
            log_fn(
                f"  epoch {epoch}: active {int(active.sum())}/{self.t}, "
                f"best val {np.nanmin(best_val):.4f}"
            )
            if not active.any():
                break

        return [
            TrialResult(
                lr=float(self.lrs[i]), weight_decay=float(self.wds[i]),
                batch_size=batch_size, num_augs=num_augs,
                best_val_mse=float(best_val[i]), epochs_run=int(epochs_run[i]),
                stopped_early=bool(~active[i]),
            )
            for i in range(self.t)
        ]


def grid_sweep(
    model_fn,
    train_ds,
    val_ds,
    *,
    lrs: Sequence[float],
    wds: Sequence[float],
    batch_sizes: Sequence[int] = (36,),
    num_augs: int = 0,
    num_epochs: int = 100,
    patience: int = 10,
    optimizer: str = "Adam",
    key: Optional[jax.Array] = None,
    study=None,
    mesh=None,
    log_fn=print,
) -> List[TrialResult]:
    """Full (lr x wd) x batch-size grid: the (lr, wd) product runs as one vmapped
    fleet per batch size. Results are optionally recorded into a Study for the
    reporting surface (trials_dataframe / param importances)."""
    key = key if key is not None else jax.random.key(0)
    pairs = list(itertools.product(lrs, wds))
    all_results: List[TrialResult] = []
    for bs in batch_sizes:
        sweep = VmappedSweep(
            model_fn, [p[0] for p in pairs], [p[1] for p in pairs],
            optimizer=optimizer, patience=patience, mesh=mesh,
        )
        log_fn(f"vmapped sweep: {len(pairs)} trials in parallel @ batch_size={bs}")
        all_results += sweep.run(
            train_ds, val_ds, key=jax.random.fold_in(key, bs),
            batch_size=bs, num_augs=num_augs, num_epochs=num_epochs, log_fn=log_fn,
        )
    if study is not None:
        from dl_biomass_tpu.sweep.study import FrozenTrial, TrialState

        for r in all_results:
            ft = FrozenTrial(number=len(study.trials))
            ft.params = {"lr": r.lr, "weight_decay": r.weight_decay,
                         "batch_size": r.batch_size, "num_augs": r.num_augs}
            ft.value = r.best_val_mse
            ft.state = TrialState.COMPLETE
            study.trials.append(ft)
    return all_results
