"""Config system for the framework.

The reference has no config system — every script hard-codes a ``hp`` dict literal
plus static flags and absolute Windows paths (reference ``main.py:30-48``,
``point_density_effect.py:23-33``). This module exposes exactly those knobs as typed
dataclasses with JSON round-trip and dotted CLI overrides (``--hp.lr 1e-3``).
"""

from __future__ import annotations

import copy
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence


@dataclass
class HyperParams:
    """Tuned hyperparameters. Defaults are the reference's committed best trial
    (reference ``main.py:38-48``)."""

    lr: float = 0.00179966410046844
    weight_decay: float = 8.0250963438986e-05
    num_points: int = 7168
    batch_size: int = 36
    num_augs: int = 10
    patience: int = 10
    ground_filter_height: float = 0.0
    activation_function: str = "ReLU"  # ReLU | LeakyReLU | ELU
    neuron_multiplier: int = 0  # 0 means "original architecture" (x1)
    dropout_probability: float = 0.5
    optimizer: str = "Adam"  # Adam | AdamW (reference hyperparameter_tuning.py:70)


@dataclass
class ModelConfig:
    """Architecture knobs beyond the reference constructor surface."""

    family: str = "pointnet2"  # pointnet2 | voxelnet (the reference's
    # MinkowskiEngine probe, rebuilt as a dense voxel CNN — models/voxelnet.py)
    voxel_grid: int = 32  # voxelnet: voxels per axis
    voxel_extent: float = 0.0  # voxelnet: cube half-width; 0 = per-cloud
    voxel_channels: List[int] = field(default_factory=lambda: [64, 128])
    # voxelnet conv widths (stride 2 each); (64, 128) is the probe's exact
    # stack (Minkowski_Main_V1.py:9-29) — deeper/wider stacks are the
    # round-4 capacity probe
    sa1_ratio: float = 0.2
    sa1_radius: float = 2.0
    sa2_ratio: float = 0.25
    sa2_radius: float = 8.0
    max_neighbors: int = 64  # torch_cluster radius() cap (pointnet2_regressor.py:15)
    # "doubled radius" variant seen in the reference run history
    # (runs/Jun23_..._w_doubled_radius): sa radii x2.
    doubled_radius: bool = False
    # multi-scale grouping variant (BASELINE.json configs[2])
    msg: bool = False
    # bfloat16 activations are the production default: ~25% faster steps with
    # equal-or-better convergence (validated on the synthetic corpus: R2 0.94
    # vs 0.89 f32); params, BN statistics and predictions stay float32.
    compute_dtype: str = "bfloat16"  # float32 | bfloat16
    use_pallas: str = "auto"  # auto (on for TPU) | on | off — fused kernels
    remat: bool = False  # rematerialize edge MLPs in backward (memory for FLOPs)
    fast_group: bool = True  # fused stratified SA1 grouping kernel (TPU only;
    # statistically equivalent stratified ball sampling — see ops/pallas_group.py)
    fast_fps: bool = True  # sectored multi-start FPS (ops/fps.py fps_sectored):
    # 8x fewer sequential argmax steps in the SA layers. Production default per
    # the 5-seed study (seed_study_r3.json / docs/BENCHMARKS.md): R2
    # 0.914+-0.032 vs parity's 0.912+-0.031, no diverged seeds, faster steps
    fused_sa: bool = False  # fused SA MLP+BN+max Pallas kernels with custom VJP
    # (ops/pallas_sa_train.py); same math as the unfused stack to fp tolerance.
    # Off by default: on this TPU stack Pallas HBM streaming runs ~10x below
    # XLA's (measured ~25 vs ~220 GB/s), so the kernel's 6 re-read passes lose
    # to XLA's fused unfused stack (46 vs 42 ms/step) — see docs/ROUNDLOG.md
    exact_selection: bool = False  # exact first-K ball query everywhere
    # (torch_cluster semantics, reference pointnet2_regressor.py:14-15);
    # normally set via apply_parity()
    split_first_layer: bool = True  # per-POINT first MLP layer on the SA2
    # MXU-gather path: layer 0 is linear in [x_j, p_j - p_i], so it computes
    # once per point before the gather; the gather then moves the
    # lane-aligned bf16 z-table (no rel-pos edge tensor, no concat, no f32
    # aux mantissa passes). Exact linear algebra — fp reassociation only
    # (models/pointnet2.py SAModule.split_first_layer)
    analytic_bn: bool = False  # folded-BN MLPs: derive train-mode BN stats
    # analytically from input moments (one MXU matmul) and fold the normalize
    # into the producing matmul — 3R+2W -> 2R+1W of edge-tensor HBM traffic
    # per hidden layer. Same algebra/precision envelope as the standard path
    # (f64-pinned, models/layers.py MLP._folded)


@dataclass
class DataConfig:
    train_dir: str = ""
    val_dir: str = ""
    test_dir: str = ""
    biomass_csv: str = ""
    glob: str = "*.las"
    use_columns: List[str] = field(default_factory=lambda: ["intensity_normalized"])
    use_datasets: List[str] = field(default_factory=lambda: ["BC", "RM", "PF"])
    use_presampled: bool = True
    presampled_suffix: str = "_fps_7168"  # stripped from PlotIDs (pointcloud_dataloader.py:184)


@dataclass
class MeshConfig:
    """Device-mesh axes. dp shards the batch; mp shards centroid/point compute."""

    dp: int = -1  # -1: all devices on the data axis
    mp: int = 1


@dataclass
class TrainConfig:
    hp: HyperParams = field(default_factory=HyperParams)
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    num_epochs: int = 100
    early_stopping: bool = True
    # Run each epoch as ONE device dispatch (lax.scan over the fused
    # assemble+augment+step body) instead of one dispatch per step. Same math
    # and key discipline as the per-step path (pinned by test); on a tunneled
    # backend this removes an epoch's worth of dispatch round-trips.
    scan_epochs: bool = True
    seed: int = 0
    model_dir: str = "models_out"
    log_every: int = 1

    # ---- serialization ------------------------------------------------------

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.to_dict(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        return _dataclass_from_dict(cls, d)

    @classmethod
    def from_json(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def apply_parity(self) -> "TrainConfig":
        """The parity preset: reference-exact numerics end to end.

        Production defaults trade exactness for speed in three places —
        bf16 activations, stratified SA1 grouping (fast_group) and
        approx_min_k ball query (recall 0.95). This preset restores the
        reference's exact semantics (torch_cluster first-K selection,
        ``pointnet2_regressor.py:14-15``; f32 activations) for prediction-
        parity verification against reference runs. Expect ~2-3x slower
        steps; see tests/test_parity_preset.py for the pinned default-vs-
        parity prediction deltas."""
        cfg = copy.deepcopy(self)
        cfg.model.compute_dtype = "float32"
        cfg.model.fast_group = False
        cfg.model.fast_fps = False
        cfg.model.fused_sa = False
        cfg.model.exact_selection = True
        cfg.model.analytic_bn = False  # keep the literal read-back BN form
        return cfg

    def with_overrides(self, overrides: Sequence[str]) -> "TrainConfig":
        """Apply dotted-path overrides like ``hp.lr=0.001`` or ``--hp.lr 0.001``."""
        d = self.to_dict()
        pairs = _parse_override_args(overrides)
        for key, raw in pairs:
            node = d
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"unknown config section: {key!r}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"unknown config key: {key!r}")
            node[leaf] = _coerce(raw, node[leaf])
        return TrainConfig.from_dict(d)


def _parse_override_args(args: Sequence[str]) -> List[tuple]:
    pairs = []
    i = 0
    args = list(args)
    while i < len(args):
        a = args[i]
        if a.startswith("--"):
            a = a[2:]
        if "=" in a:
            k, v = a.split("=", 1)
            pairs.append((k, v))
            i += 1
        else:
            if i + 1 >= len(args):
                raise ValueError(f"override {a!r} missing a value")
            pairs.append((a, args[i + 1]))
            i += 2
    return pairs


def _coerce(raw: str, old: Any) -> Any:
    if isinstance(old, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(old, int) and not isinstance(old, bool):
        return int(raw)
    if isinstance(old, float):
        return float(raw)
    if isinstance(old, list):
        items = [s for s in raw.split(",") if s]
        # coerce element type from the existing default (e.g. voxel_channels
        # is List[int]: "--model.voxel_channels 64,128,256" must not land as
        # strings); an empty default stays a string list
        if old and isinstance(old[0], bool):
            return [s.lower() in ("1", "true", "yes", "on") for s in items]
        if old and isinstance(old[0], int):
            return [int(s) for s in items]
        if old and isinstance(old[0], float):
            return [float(s) for s in items]
        return items
    return raw


def _dataclass_from_dict(cls, d: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
            kwargs[f.name] = _dataclass_from_dict(f.type, v)
        elif f.name in ("hp", "model", "data", "mesh") and isinstance(v, dict):
            sub = {"hp": HyperParams, "model": ModelConfig, "data": DataConfig, "mesh": MeshConfig}[f.name]
            kwargs[f.name] = _dataclass_from_dict(sub, v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)
