"""LR finder, dataset splitter, V2 model variant, profiling utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.io.device_data import DeviceDataset
from dl_biomass_tpu.io.synthetic import synthetic_dataset
from dl_biomass_tpu.models import PointNet2Regressor


class TestLRFinder:
    def test_range_test_runs_and_suggests(self):
        from dl_biomass_tpu.train.lr_finder import lr_range_test

        pos, feat, y, ids = synthetic_dataset(8, 128, seed=0)
        ds = DeviceDataset.from_clouds(pos, feat, y, ids, base_n=128)
        model = PointNet2Regressor(num_features=1)
        out = lr_range_test(
            model, ds.batches(4), key=jax.random.key(0),
            start_lr=1e-6, end_lr=1.0, num_iter=20,
        )
        assert len(out["lr"]) == len(out["loss"]) > 3
        assert out["lr"][0] < out["lr"][-1]
        assert out["suggestion"] is None or 1e-6 <= out["suggestion"] <= 1.0

    def test_diverging_loss_stops_early(self):
        from dl_biomass_tpu.train.lr_finder import lr_range_test

        pos, feat, y, ids = synthetic_dataset(4, 128, seed=1)
        # gigantic targets -> divergence at high lr
        ds = DeviceDataset.from_clouds(pos, feat, y * 1e4, ids, base_n=128)
        model = PointNet2Regressor(num_features=1)
        out = lr_range_test(model, ds.batches(4), key=jax.random.key(0),
                            start_lr=1e-3, end_lr=100.0, num_iter=50)
        assert len(out["lr"]) < 50  # stopped before the full sweep


class TestSplitter:
    def test_split_fractions_and_stratification(self, tmp_path, rng):
        from dl_biomass_tpu.io.split import split_dataset

        src = tmp_path / "src"
        src.mkdir()
        for pfx in ("BC", "RM"):
            for i in range(10):
                (src / f"{pfx}_{i:03d}.las").write_bytes(b"x")
        out = split_dataset(str(src), str(tmp_path / "out"), seed=0)
        # per-source rounding: 10 -> 7 train / round(1.5)=2 val / 1 test
        assert len(out["train"]) == 14 and len(out["val"]) == 4 and len(out["test"]) == 2
        # stratified: each split has files from both sources
        for split in ("train",):
            names = [os.path.basename(p)[:2] for p in out[split]]
            assert set(names) == {"BC", "RM"}
        # copy (not move) by default
        assert len(list(src.glob("*.las"))) == 20

    def test_move_mode(self, tmp_path):
        from dl_biomass_tpu.io.split import split_dataset

        src = tmp_path / "src"
        src.mkdir()
        for i in range(10):
            (src / f"PF_{i:03d}.las").write_bytes(b"x")
        split_dataset(str(src), str(tmp_path / "out"), move=True, seed=1)
        assert len(list(src.glob("*.las"))) == 0


class TestV2Variant:
    def test_v2_widths_and_scalar_output(self):
        from dl_biomass_tpu.models.pointnet2 import pointnet2_v2
        from tests.test_model import init_model, make_batch

        batch = make_batch(n=128)
        model = pointnet2_v2(num_features=1)
        variables = init_model(model, batch)
        out = model.apply(variables, batch, train=False)
        assert out.shape == (2, 1)
        k = variables["params"]["sa3"]["mlp"]["lin2"]["kernel"]
        assert k.shape == (512, 2048)  # 1024*2 global width
        hk = variables["params"]["head"]["lin0"]["kernel"]
        assert hk.shape == (2048, 256)  # 128*2 hidden


class TestProfilingUtils:
    def test_step_timer(self):
        from dl_biomass_tpu.utils.profiling import StepTimer, hard_sync

        t = StepTimer()
        x = jnp.ones((8, 8))
        for _ in range(3):
            t.start()
            y = x * 2
            t.stop(sync_on=y)
        s = t.summary(items_per_step=4)
        assert s["steps"] == 3 and s["items_per_sec"] > 0
        hard_sync({"a": x})  # no crash
