"""Training loop: jit/pjit train+eval steps, early stopping, save-on-best.

Rebuilds the reference's script-level loop (``main.py:146-253``) as a library:

  * torch ``Adam(lr, weight_decay)`` semantics (L2 folded into gradients before
    the moment updates) and decoupled ``AdamW`` (``hyperparameter_tuning.py:139-142``);
  * weighted 4-component MSE (``train/loss.py``);
  * early stopping with the reference's exact trigger rule (``main.py:226-235``):
    the trigger count resets — and the comparison baseline updates — only on
    non-increasing val MSE;
  * per-epoch CSV append ``epoch, train_mse, val_mse`` (``main.py:220-223``);
  * save-on-best checkpointing, but as real Orbax checkpoints of
    params + batch_stats + opt_state (the reference pickles the whole module and
    can never resume training — ``main.py:243-245``);
  * data parallelism: params replicated, batch sharded over the ``dp`` mesh axis;
    XLA inserts the gradient all-reduce over ICI (replaces DataParallel).

Exactly two computations are compiled for the whole run (train_step, eval_step);
every batch reuses them — there are no shape-polymorphic paths.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dl_biomass_tpu.core.cloud import CloudBatch
from dl_biomass_tpu.core.config import TrainConfig
from dl_biomass_tpu.parallel.mesh import replicated_sharding, shard_batch
from dl_biomass_tpu.train.loss import weighted_component_mse


def make_optimizer(hp) -> optax.GradientTransformation:
    """torch-parity optimizers.

    ``Adam`` with weight_decay in torch is L2 regularization *inside* the
    gradient (decay added before the moment estimates), not AdamW's decoupled
    decay — hence add_decayed_weights before adam.
    """
    if hp.optimizer == "Adam":
        return optax.chain(
            optax.add_decayed_weights(hp.weight_decay),
            optax.adam(hp.lr),
        )
    if hp.optimizer == "AdamW":
        return optax.adamw(hp.lr, weight_decay=hp.weight_decay)
    raise ValueError(f"unknown optimizer {hp.optimizer!r}")


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


class EarlyStopping:
    """Reference trigger rule (``main.py:226-235``): increment when val MSE rises
    above the last *accepted* value; reset and accept otherwise."""

    def __init__(self, patience: int, enabled: bool = True):
        self.patience = patience
        self.enabled = enabled
        self.trigger_times = 0
        self.last_val = np.inf

    def update(self, val_mse: float) -> bool:
        """Returns True if training should stop."""
        if not self.enabled:
            return False
        if val_mse > self.last_val:
            self.trigger_times += 1
            return self.trigger_times >= self.patience
        self.trigger_times = 0
        self.last_val = val_mse
        return False


class Trainer:
    def __init__(self, model, cfg: TrainConfig, mesh=None):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.tx = make_optimizer(cfg.hp)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._fused_train_step = None  # built on first train_epoch_fused use
        self._fused_eval_step = None  # built on first evaluate_fused use
        self._scan_train_epoch = None  # built on first train_epoch_scan use
        self._scan_eval_epoch = None  # built on first evaluate_scan use

    def _constrain_batch(self, batch):
        """Pin an in-jit assembled batch to the mesh's batch sharding (dp
        axis); identity without a mesh. The single home for this constraint —
        all four fused/scan x train/eval paths go through it so they can't
        drift."""
        if self.mesh is None:
            return batch
        from dl_biomass_tpu.parallel.mesh import batch_sharding

        s = batch_sharding(self.mesh)
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, s), batch
        )

    # ---- state ---------------------------------------------------------------

    def init_state(self, key: jax.Array, example_batch: CloudBatch) -> TrainState:
        variables = self.model.init(
            {"params": key, "fps": jax.random.fold_in(key, 1), "dropout": jax.random.fold_in(key, 2)},
            example_batch,
            train=True,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        return state

    # ---- compiled steps --------------------------------------------------------

    def _step_core(self, state: TrainState, batch: CloudBatch, key: jax.Array):
        """One gradient step (traced body shared by the plain and fused steps)."""
        model, tx = self.model, self.tx
        k_fps, k_drop = jax.random.split(key)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"fps": k_fps, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            w = jnp.any(batch.mask, axis=1)  # zero-weight fully-padded clouds
            loss = weighted_component_mse(out, batch.y, w)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        new_state = TrainState(
            params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, loss

    def _build_train_step(self):
        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch: CloudBatch, key: jax.Array):
            return self._step_core(state, batch, key)

        return train_step

    def _build_fused_train_step(self):
        """Assemble+augment+train in ONE compiled computation: batches() costs
        a second device dispatch per step (assembly is its own jit), and on a
        tunneled backend dispatch latency is real — the fused step's inputs
        are the device-resident dataset plus a handful of int32 specs."""
        from dl_biomass_tpu.io.device_data import _assemble_batch

        @partial(jax.jit, donate_argnums=(0,), static_argnames=("base_n",))
        def fused_step(state, pos, feat, mask, y, idx, aug_flag, valid,
                       akey, skey, *, base_n: int):
            batch = _assemble_batch(pos, feat, mask, y, idx, aug_flag, valid,
                                    akey, base_n=base_n)
            return self._step_core(state, self._constrain_batch(batch), skey)

        return fused_step

    def _build_eval_step(self):
        model = self.model

        @jax.jit
        def eval_step(params, batch_stats, batch: CloudBatch):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, train=False
            )
            w = jnp.any(batch.mask, axis=1)
            return weighted_component_mse(out, batch.y, w), out

        return eval_step

    # ---- loops -----------------------------------------------------------------

    def train_epoch(
        self, state: TrainState, batches: Iterable[CloudBatch], key: jax.Array
    ) -> Tuple[TrainState, float, int]:
        losses = []
        counts = []
        for i, batch in enumerate(batches):
            batch = shard_batch(batch, self.mesh)
            state, loss = self._train_step(state, batch, jax.random.fold_in(key, i))
            losses.append(loss)
            # real (non-padded) clouds only — a partial final batch must not
            # inflate the throughput metric
            counts.append(jnp.sum(jnp.any(batch.mask, axis=1)))
        # one host sync per epoch, not per step
        n = int(sum(int(c) for c in counts))
        return state, float(np.mean([float(l) for l in losses])), n

    def train_epoch_fused(
        self, state: TrainState, ds, key: jax.Array, *,
        batch_size: int, num_augs: int = 0, shuffle: bool = True,
    ) -> Tuple[TrainState, float, int]:
        """train_epoch over a DeviceDataset through the fused
        assemble+augment+train step — ONE device dispatch per step instead of
        two. Identical key discipline to ``ds.batches`` + ``train_epoch``, so
        losses match the unfused path bit-for-bit (pinned by test)."""
        if key is None:
            raise ValueError("train_epoch_fused needs a PRNG key")
        if self._fused_train_step is None:
            self._fused_train_step = self._build_fused_train_step()
        losses = []
        n_clouds = 0
        for i, (idx, aug_flag, valid, akey) in enumerate(
            ds.epoch_specs(batch_size, key=key, num_augs=num_augs, shuffle=shuffle)
        ):
            state, loss = self._fused_train_step(
                state, ds.pos, ds.feat, ds.mask, ds.y, idx, aug_flag, valid,
                akey, jax.random.fold_in(key, i), base_n=ds.base_n,
            )
            losses.append(loss)
            n_clouds += int(valid.sum())  # host numpy — no device sync
        return state, float(np.mean([float(l) for l in losses])), n_clouds

    def _build_scan_train_epoch(self):
        """The WHOLE training epoch as one compiled computation: lax.scan over
        the per-step specs, each iteration = assemble + augment + gradient
        step (the fused-step body). On the tunneled backend every dispatch
        costs real round-trip latency, and per-step loss retrieval costs
        another — scanning collapses an epoch's 2S round trips to 1. Key
        discipline matches train_epoch_fused exactly (``fold_in(akey, b0)`` /
        ``fold_in(key, i)`` inside the body), so losses and parameters are
        bit-identical to the per-step paths (pinned by test)."""
        from dl_biomass_tpu.io.device_data import _assemble_batch

        @partial(jax.jit, donate_argnums=(0,), static_argnames=("base_n",))
        def scan_epoch(state, pos, feat, mask, y, idxs, aug_flags, valids,
                       b0s, steps, akey, key, *, base_n: int):
            def body(st, per):
                idx, aug_flag, valid, b0, i = per
                batch = _assemble_batch(
                    pos, feat, mask, y, idx, aug_flag, valid,
                    jax.random.fold_in(akey, b0), base_n=base_n,
                )
                return self._step_core(
                    st, self._constrain_batch(batch), jax.random.fold_in(key, i)
                )

            return jax.lax.scan(body, state, (idxs, aug_flags, valids, b0s, steps))

        return scan_epoch

    def train_epoch_scan(
        self, state: TrainState, ds, key: jax.Array, *,
        batch_size: int, num_augs: int = 0, shuffle: bool = True,
    ) -> Tuple[TrainState, float, int]:
        """train_epoch over a DeviceDataset as ONE device dispatch: the scanned
        fused step (see _build_scan_train_epoch). Bit-identical losses/params
        to train_epoch_fused; one loss array comes back per epoch instead of
        one scalar per step."""
        if key is None:
            # (unlike epoch_specs) a training epoch always consumes the key —
            # per-step dropout/FPS keys come from fold_in(key, i) in the body
            raise ValueError("train_epoch_scan needs a PRNG key")
        if self._scan_train_epoch is None:
            self._scan_train_epoch = self._build_scan_train_epoch()
        idxs, augs, valids, b0s = ds.epoch_spec_arrays(
            batch_size, key=key, num_augs=num_augs, shuffle=shuffle
        )
        from dl_biomass_tpu.io.device_data import AUG_KEY_DOMAIN

        state, losses = self._scan_train_epoch(
            state, ds.pos, ds.feat, ds.mask, ds.y,
            jnp.asarray(idxs), jnp.asarray(augs), jnp.asarray(valids),
            jnp.asarray(b0s), jnp.arange(len(b0s), dtype=jnp.int32),
            jax.random.fold_in(key, AUG_KEY_DOMAIN), key, base_n=ds.base_n,
        )
        return state, float(np.mean(np.asarray(losses))), int(valids.sum())

    def _build_scan_eval_epoch(self):
        """Whole validation epoch in one dispatch (scan of the fused eval)."""
        from dl_biomass_tpu.io.device_data import _assemble_batch

        model = self.model

        @partial(jax.jit, static_argnames=("base_n",))
        def scan_eval(params, batch_stats, pos, feat, mask, y, idxs, valids,
                      *, base_n: int):
            def body(_, per):
                idx, valid = per
                zeros = jnp.zeros(idx.shape[0], bool)  # no augmentation in eval
                batch = _assemble_batch(pos, feat, mask, y, idx, zeros, valid,
                                        jax.random.key(0), base_n=base_n)
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    self._constrain_batch(batch), train=False,
                )
                w = jnp.any(batch.mask, axis=1)
                return 0, weighted_component_mse(out, batch.y, w)

            _, losses = jax.lax.scan(body, 0, (idxs, valids))
            return losses

        return scan_eval

    def evaluate_scan(self, state: TrainState, ds, *, batch_size: int) -> float:
        """evaluate() over a DeviceDataset in one dispatch per epoch."""
        if self._scan_eval_epoch is None:
            self._scan_eval_epoch = self._build_scan_eval_epoch()
        idxs, _, valids, _ = ds.epoch_spec_arrays(batch_size)
        losses = self._scan_eval_epoch(
            state.params, state.batch_stats,
            ds.pos, ds.feat, ds.mask, ds.y,
            jnp.asarray(idxs), jnp.asarray(valids), base_n=ds.base_n,
        )
        return float(np.mean(np.asarray(losses)))

    def _build_fused_eval_step(self):
        """Assemble+eval in one computation (see _build_fused_train_step)."""
        from dl_biomass_tpu.io.device_data import _assemble_batch

        model = self.model

        @partial(jax.jit, static_argnames=("base_n",))
        def fused_eval(params, batch_stats, pos, feat, mask, y, idx, valid,
                       *, base_n: int):
            zeros = jnp.zeros(idx.shape[0], bool)  # no augmentation in eval
            batch = _assemble_batch(pos, feat, mask, y, idx, zeros, valid,
                                    jax.random.key(0), base_n=base_n)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                self._constrain_batch(batch), train=False,
            )
            w = jnp.any(batch.mask, axis=1)
            return weighted_component_mse(out, batch.y, w), out

        return fused_eval

    def evaluate_fused(self, state: TrainState, ds, *, batch_size: int) -> float:
        """evaluate() over a DeviceDataset through one dispatch per batch."""
        if self._fused_eval_step is None:
            self._fused_eval_step = self._build_fused_eval_step()
        losses = []
        for idx, _, valid, _ in ds.epoch_specs(batch_size):
            loss, _ = self._fused_eval_step(
                state.params, state.batch_stats,
                ds.pos, ds.feat, ds.mask, ds.y,
                idx, valid, base_n=ds.base_n,
            )
            losses.append(loss)
        return float(np.mean([float(l) for l in losses]))

    def evaluate(self, state: TrainState, batches: Iterable[CloudBatch]) -> float:
        losses = []
        for batch in batches:
            batch = shard_batch(batch, self.mesh)
            loss, _ = self._eval_step(state.params, state.batch_stats, batch)
            losses.append(loss)
        return float(np.mean([float(l) for l in losses]))

    def predict(self, state: TrainState, batches: Iterable[CloudBatch]) -> np.ndarray:
        # dispatch every batch before the first sync (async dispatch pipelines
        # the device work; a per-batch np.asarray would serialize each batch
        # behind a host round-trip)
        outs = []
        for batch in batches:
            batch = shard_batch(batch, self.mesh)
            _, out = self._eval_step(state.params, state.batch_stats, batch)
            outs.append((out, jnp.any(batch.mask, axis=1)))
        return np.concatenate(
            [np.asarray(o)[np.asarray(w)] for o, w in outs], axis=0
        )

    def fit(
        self,
        state: TrainState,
        train_batches_fn: Callable[[jax.Array], Iterable[CloudBatch]],
        val_batches_fn: Callable[[], Iterable[CloudBatch]],
        *,
        key: jax.Array,
        num_epochs: Optional[int] = None,
        csv_path: Optional[str] = None,
        checkpoint_dir: Optional[str] = None,
        log_fn: Callable[[str], None] = print,
        metric_writer=None,
        resume: bool = False,
    ) -> Dict[str, Any]:
        """Full training run with early stopping + save-on-best.

        Returns a history dict with per-epoch train/val MSE, throughput, and the
        best state.

        ``train_batches_fn`` / ``val_batches_fn`` may also be DeviceDatasets
        directly — training then runs through the fused assemble+train step
        (one dispatch per step; same math, pinned by test) with
        ``cfg.hp.batch_size`` / ``cfg.hp.num_augs``.
        """
        cfg = self.cfg
        # the train steps DONATE the incoming state's buffers; a state that
        # already went through a fit/step is a stale handle whose reuse
        # surfaces as an opaque backend INVALID_ARGUMENT at the next host
        # read — fail here with the actual story instead
        deleted = [
            leaf for leaf in jax.tree.leaves(state.params)
            if hasattr(leaf, "is_deleted") and leaf.is_deleted()
        ]
        if deleted:
            raise ValueError(
                "fit() received a state whose buffers were already donated "
                "(consumed by a previous fit/train step). Pass a fresh "
                "init_state(...) or the previous run's hist['best_state']."
            )
        train_ds = train_batches_fn if hasattr(train_batches_fn, "epoch_specs") else None
        val_ds = val_batches_fn if hasattr(val_batches_fn, "epoch_specs") else None
        num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
        stopper = EarlyStopping(cfg.hp.patience, cfg.early_stopping)
        history: Dict[str, Any] = {
            "epoch": [], "train_mse": [], "val_mse": [], "epoch_seconds": [],
            "clouds_per_sec": [],
        }
        best_val = np.inf
        best_state = jax.tree.map(jnp.copy, state)  # pre-donation copy
        stopped_early = False
        start_epoch = 0

        if resume and checkpoint_dir:
            # real mid-run resume (params + opt state + epoch counter) — the
            # reference pickles only the module and can never continue a run
            from dl_biomass_tpu.train.checkpoint import restore_latest

            restored, meta = restore_latest(checkpoint_dir, state)
            if restored is not None:
                state = restored
                best_state = jax.tree.map(jnp.copy, restored)  # pre-donation copy
                start_epoch = int(meta["epoch"]) + 1 if meta else 0
                best_val = float(meta["val_mse"]) if meta else np.inf
                stopper.last_val = best_val
                log_fn(f"Resuming from epoch {start_epoch} (best val MSE {best_val:.4f})")

        if checkpoint_dir:
            # sidecar metadata so eval can rebuild the exact model later
            import json

            from dl_biomass_tpu.models.pointnet2 import model_to_dict

            os.makedirs(checkpoint_dir, exist_ok=True)
            with open(os.path.join(checkpoint_dir, "model_config.json"), "w") as f:
                json.dump({"model": model_to_dict(self.model), "train": cfg.to_dict()}, f, indent=2)

        for epoch in range(start_epoch, num_epochs):
            t0 = time.perf_counter()
            ep_key = jax.random.fold_in(key, epoch)
            scan = cfg.scan_epochs
            if train_ds is not None:
                epoch_fn = self.train_epoch_scan if scan else self.train_epoch_fused
                state, train_mse, n_clouds = epoch_fn(
                    state, train_ds, ep_key,
                    batch_size=cfg.hp.batch_size, num_augs=cfg.hp.num_augs,
                )
            else:
                state, train_mse, n_clouds = self.train_epoch(
                    state, train_batches_fn(ep_key), ep_key
                )
            if val_ds is not None:
                eval_fn = self.evaluate_scan if scan else self.evaluate_fused
                val_mse = eval_fn(state, val_ds, batch_size=cfg.hp.batch_size)
            else:
                val_mse = self.evaluate(state, val_batches_fn())
            dt = time.perf_counter() - t0

            history["epoch"].append(epoch)
            history["train_mse"].append(train_mse)
            history["val_mse"].append(val_mse)
            history["epoch_seconds"].append(dt)
            history["clouds_per_sec"].append(n_clouds / dt if dt > 0 else 0.0)

            if csv_path:
                with open(csv_path, "a") as f:
                    f.write(f"{epoch}, {train_mse}, {val_mse}\n")
            if metric_writer is not None:
                metric_writer.scalar("Training MSE", train_mse, epoch)
                metric_writer.scalar("Validation MSE", val_mse, epoch)

            if val_mse <= best_val:
                best_val = val_mse
                # deep-copy: train_step donates its input state's buffers, so a
                # bare reference would be a dead buffer after the next step
                best_state = jax.tree.map(jnp.copy, state)
                if checkpoint_dir:
                    from dl_biomass_tpu.train.checkpoint import save_checkpoint

                    save_checkpoint(checkpoint_dir, state, epoch=epoch, val_mse=val_mse)
                log_fn(f"    Saving model for epoch {epoch}")

            log_fn(
                f"    Epoch: {epoch}  | Mean val MSE: {round(val_mse, 2)}"
                f"  | Mean train MSE: {round(train_mse, 2)}"
            )

            if stopper.update(val_mse):
                log_fn(f"\nEarly stopping at epoch {epoch}!\n")
                stopped_early = True
                break

        history["best_val_mse"] = float(best_val)
        history["best_state"] = best_state
        history["final_state"] = state
        history["stopped_early"] = stopped_early
        return history
