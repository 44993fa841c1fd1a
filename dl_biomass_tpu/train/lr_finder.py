"""Learning-rate range test.

Parity with the reference's torch-lr-finder usage (``Misc/lr_finder_test.py:57-61``):
sweep the learning rate exponentially from ``start_lr`` to ``end_lr`` over
``num_iter`` steps, record the (smoothed) training loss per step, and suggest
the lr at the steepest descent point.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dl_biomass_tpu.train.loss import weighted_component_mse


def lr_range_test(
    model,
    train_batches: Iterable,
    *,
    key: jax.Array,
    start_lr: float = 1e-7,
    end_lr: float = 1.0,
    num_iter: int = 100,
    smooth_f: float = 0.05,
    diverge_th: float = 5.0,
) -> Dict[str, object]:
    """Returns {"lr": [...], "loss": [...], "suggestion": float}."""
    import optax

    batches = list(train_batches)
    if not batches:
        raise ValueError("no batches")
    example = batches[0]
    variables = model.init(
        {"params": key, "fps": jax.random.fold_in(key, 1), "dropout": jax.random.fold_in(key, 2)},
        example, train=True,
    )
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    tx = optax.sgd(1.0)  # lr applied manually per step
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state, batch, lr, k):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, batch, train=True,
                rngs={"fps": k, "dropout": jax.random.fold_in(k, 1)},
                mutable=["batch_stats"],
            )
            w = jnp.any(batch.mask, axis=1)
            return weighted_component_mse(out, batch.y, w), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)  # per-step traced lr
        params = optax.apply_updates(params, updates)
        return params, upd.get("batch_stats", bstats), opt_state, loss

    gamma = (end_lr / start_lr) ** (1.0 / max(num_iter - 1, 1))
    lrs: List[float] = []
    losses: List[float] = []
    smoothed = None
    best = np.inf
    for i in range(num_iter):
        lr = start_lr * gamma**i
        batch = batches[i % len(batches)]
        params, bstats, opt_state, loss = step(
            params, bstats, opt_state, batch, jnp.float32(lr), jax.random.fold_in(key, i)
        )
        loss = float(loss)
        if not np.isfinite(loss):
            break
        smoothed = loss if smoothed is None else smooth_f * loss + (1 - smooth_f) * smoothed
        lrs.append(lr)
        losses.append(smoothed)
        best = min(best, smoothed)
        if smoothed > diverge_th * best:
            break

    suggestion: Optional[float] = None
    if len(losses) > 3:
        grads_ = np.gradient(np.asarray(losses))
        suggestion = float(lrs[int(np.argmin(grads_))])
    return {"lr": lrs, "loss": losses, "suggestion": suggestion}
