"""Augmentation visualizer — side-by-side original vs augmented cloud renders.

Parity with the reference ``Visualize_Augmentation.py:16-167``, driven by the
framework's on-device transforms instead of standalone numpy copies.
"""

from __future__ import annotations

from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def visualize_augmentation(
    pos: np.ndarray,
    feat: Optional[np.ndarray] = None,
    out_path: Optional[str] = None,
    seed: int = 0,
):
    """Render (original | augmented) 3-D scatters of one cloud."""
    import jax
    import jax.numpy as jnp

    from dl_biomass_tpu.transforms.augment import aug_capacity, augment_cloud

    pos = np.asarray(pos, np.float32)
    n = len(pos)
    cap = aug_capacity(n)
    p = np.zeros((cap, 3), np.float32)
    p[:n] = pos
    f = np.zeros((cap, 1), np.float32)
    if feat is not None:
        f[:n] = np.asarray(feat, np.float32).reshape(n, -1)[:, :1]
    m = np.zeros(cap, bool)
    m[:n] = True

    ap, af, am = augment_cloud(jax.random.key(seed), jnp.asarray(p), jnp.asarray(f),
                               jnp.asarray(m), n)
    aug = np.asarray(ap)[np.asarray(am)]

    fig = plt.figure(figsize=[20, 10])
    ax = fig.add_subplot(121, projection="3d")
    ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], c=pos[:, 2], cmap="viridis", linewidth=0.5)
    ax.set_title(f"Original ({n} pts)")
    ax = fig.add_subplot(122, projection="3d")
    ax.scatter(aug[:, 0], aug[:, 1], aug[:, 2], c=aug[:, 2], cmap="viridis", linewidth=0.5)
    ax.set_title(f"Augmented ({len(aug)} pts)")
    if out_path:
        plt.savefig(out_path)
    plt.close(fig)
    return aug
