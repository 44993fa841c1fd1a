"""Device-mesh and sharding utilities.

The reference's only parallelism is single-process multi-GPU DataParallel
(reference ``main.py:140-142`` + ``DataListLoader``): replicate the model, scatter
a Python list of graphs, gather outputs. The TPU-native equivalent is SPMD over a
``jax.sharding.Mesh``:

  * ``dp`` axis — batch (cloud) dimension sharded across chips; gradient psum
    rides ICI automatically once params are replicated and batch is sharded;
  * ``mp`` axis — optional model/point-axis parallelism for very large clouds
    (centroid-sharded grouping compute).

No explicit collectives are written anywhere: ``jit`` + sharding annotations let
XLA insert the all-reduces (the scaling-book recipe).

Scaling caveat (honesty over marketing): ``dp`` is the production strategy —
per-chip work is independent and the only collective is the gradient psum.
``mp`` is correctness-tested (tests/test_parallel.py sharding-invariance) and
exercised by the multichip dry run, but it has NOT been measured on real
multi-chip hardware, and FPS's per-iteration global argmax forces a cross-chip
reduction every one of its k steps — at flagship cloud sizes mp is expected to
HURT throughput. Treat mp as the escape hatch for clouds too large for one
chip's HBM, not as a speedup axis, until a real-hardware measurement says
otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    """Create a (dp, mp) mesh. dp=-1 uses all remaining devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        if n % mp != 0:
            raise ValueError(f"{n} devices not divisible by mp={mp}")
        dp = n // mp
    if dp * mp > n:
        raise ValueError(f"mesh ({dp}x{mp}) larger than device count {n}")
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(batch, mesh: Optional[Mesh]):
    """Place a CloudBatch with its leading axis sharded over the dp mesh axis."""
    if mesh is None:
        return batch
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
