"""Core schema + config system edge cases."""

import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.core.cloud import CloudBatch, pad_points_axis, round_up
from dl_biomass_tpu.core.config import HyperParams, TrainConfig


class TestCloudBatch:
    def test_from_numpy_capacity_alignment(self, rng):
        pos = [rng.normal(size=(n, 3)).astype(np.float32) for n in (100, 130, 90)]
        feat = [rng.normal(size=(len(p), 2)).astype(np.float32) for p in pos]
        b = CloudBatch.from_numpy(pos, feat)
        assert b.num_points == 256  # max=130 rounded to 128-multiple
        np.testing.assert_array_equal(np.asarray(b.valid_counts()), [100, 130, 90])
        assert b.num_features == 2

    def test_explicit_capacity_truncates(self, rng):
        pos = [rng.normal(size=(50, 3)).astype(np.float32)]
        feat = [rng.normal(size=(50, 1)).astype(np.float32)]
        b = CloudBatch.from_numpy(pos, feat, capacity=32)
        assert b.num_points == 32
        assert int(b.valid_counts()[0]) == 32

    def test_slice_batch(self, rng):
        pos = [rng.normal(size=(10, 3)).astype(np.float32) for _ in range(4)]
        feat = [rng.normal(size=(10, 1)).astype(np.float32) for _ in range(4)]
        y = rng.normal(size=(4, 4)).astype(np.float32)
        b = CloudBatch.from_numpy(pos, feat, y=y)
        s = b.slice_batch(1, 2)
        assert s.batch_size == 2
        np.testing.assert_array_equal(np.asarray(s.y), y[1:3])

    def test_pad_points_axis(self):
        x = jnp.ones((2, 10, 3))
        out = pad_points_axis(x, 16)
        assert out.shape == (2, 16, 3)
        with pytest.raises(ValueError):
            pad_points_axis(x, 5)

    def test_round_up(self):
        assert round_up(1, 128) == 128
        assert round_up(128, 128) == 128
        assert round_up(129, 128) == 256


class TestConfig:
    def test_json_roundtrip(self, tmp_path):
        cfg = TrainConfig(hp=HyperParams(lr=0.123, batch_size=7))
        p = str(tmp_path / "cfg.json")
        cfg.to_json(p)
        back = TrainConfig.from_json(p)
        assert back.hp.lr == 0.123 and back.hp.batch_size == 7
        assert back.model.sa1_radius == cfg.model.sa1_radius

    def test_override_coercion(self):
        cfg = TrainConfig()
        out = cfg.with_overrides([
            "hp.lr=0.5", "--hp.batch_size", "12", "early_stopping=false",
            "data.use_datasets=BC,RM", "model.doubled_radius=true",
        ])
        assert out.hp.lr == 0.5
        assert out.hp.batch_size == 12
        assert out.early_stopping is False
        assert out.data.use_datasets == ["BC", "RM"]
        assert out.model.doubled_radius is True
        # original untouched
        assert cfg.hp.lr != 0.5

    def test_override_unknown_key_raises(self):
        with pytest.raises(KeyError):
            TrainConfig().with_overrides(["hp.bogus=1"])
        with pytest.raises(KeyError):
            TrainConfig().with_overrides(["nosection.lr=1"])

    def test_override_missing_value_raises(self):
        with pytest.raises(ValueError):
            TrainConfig().with_overrides(["--hp.lr"])


class TestProductionDefaults:
    """Pin the measured-optimal production knobs: every value below was chosen
    by on-hardware measurement (docs/BENCHMARKS.md) — a silent flip regresses
    the headline benchmark, so flips must be deliberate and update this test."""

    def test_tuned_defaults(self):
        from dl_biomass_tpu.core.config import TrainConfig

        cfg = TrainConfig()
        assert cfg.model.compute_dtype == "bfloat16"  # ~25% faster, equal R2
        assert cfg.model.fast_group is True  # fused stratified SA1 grouping
        assert cfg.model.fast_fps is True  # sectored FPS: parity-level R2
        # across 5 seeds (seed_study_r3.json), 8x fewer sequential iterations
        assert cfg.model.fused_sa is False  # loses under the Pallas-DMA cap
        assert cfg.model.exact_selection is False  # parity preset only
        assert cfg.model.use_pallas == "auto"
        # reference's committed best trial (main.py:38-48)
        assert cfg.hp.num_points == 7168 and cfg.hp.batch_size == 36
        assert cfg.hp.num_augs == 10 and cfg.hp.patience == 10


def test_list_overrides_coerce_element_type():
    """List-typed overrides inherit their element type from the default:
    voxel_channels (List[int]) must not land as strings."""
    from dl_biomass_tpu.core.config import TrainConfig

    cfg = TrainConfig().with_overrides(["--model.voxel_channels", "64,128,256"])
    assert cfg.model.voxel_channels == [64, 128, 256]
    cfg = TrainConfig().with_overrides(["--data.use_datasets", "BC,RM"])
    assert cfg.data.use_datasets == ["BC", "RM"]
    cfg = TrainConfig().with_overrides(["--data.use_columns", ""])
    assert cfg.data.use_columns == []
