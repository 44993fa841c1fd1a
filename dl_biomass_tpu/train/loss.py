"""Weighted multi-component biomass loss.

Reference: per-component MSE combined with fixed weights a=1/11, b=1/12, c=1/5,
d=1/72 — "loss for each component relative to its contribution to total biomass"
(reference ``main.py:157-169``; identical blocks in ``hyperparameter_tuning.py`` and
the val loops). Components: bark, branch, foliage, wood (tons/ha).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# bark, branch, foliage, wood (main.py:163-166)
COMPONENT_WEIGHTS: Tuple[float, float, float, float] = (1 / 11, 1 / 12, 1 / 5, 1 / 72)

COMPONENT_NAMES = ("bark", "branch", "foliage", "wood")


def weighted_component_mse(
    pred: jax.Array,  # (B, 4)
    target: jax.Array,  # (B, 4)
    sample_weight: Optional[jax.Array] = None,  # (B,) 0/1 for pad clouds
) -> jax.Array:
    """Scalar loss: sum_c w_c * MSE_c, MSE over the batch per component."""
    se = jnp.square(pred - target)  # (B, 4)
    if sample_weight is None:
        per_comp = jnp.mean(se, axis=0)
    else:
        w = sample_weight.astype(se.dtype)[:, None]
        per_comp = jnp.sum(se * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(per_comp * jnp.asarray(COMPONENT_WEIGHTS, se.dtype))
