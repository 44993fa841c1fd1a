"""dl_biomass_tpu — a TPU-native (JAX/XLA/Pallas) framework for LiDAR-to-biomass
deep learning.

Re-implements the full capability surface of the reference PyTorch/PyG pipeline
(cczls1991/DL_Biomass) as an idiomatic TPU framework:

- ``io``         — LAS/parquet point-cloud codecs, datasets, prefetching input pipeline
- ``transforms`` — batched on-device augmentations (rotate / point-removal / jitter)
- ``ops``        — Pallas + XLA point-cloud kernels (FPS, ball query, grouping, pooling)
- ``models``     — PointNet++ set-abstraction regressor family
- ``train``      — jit/pjit training loop, weighted multi-task loss, checkpoints
- ``eval``       — metrics + reporting parity with the reference ``testing_model.py``
- ``sweep``      — vmapped parallel hyperparameter search + study persistence
- ``experiments``— point-density ablation, augmentation visualizer
- ``parallel``   — device-mesh / sharding utilities (DP over ICI)

The reference repo is a collection of research scripts; this package gives the same
workload a real API. See SURVEY.md at the repo root for the component-by-component
mapping to the reference.
"""

__version__ = "0.1.0"

from dl_biomass_tpu.core.cloud import CloudBatch  # noqa: F401
from dl_biomass_tpu.core.config import HyperParams, TrainConfig  # noqa: F401
