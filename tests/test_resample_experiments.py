"""Offline resampler, experiments, tboard writer, CLI smoke tests."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from dl_biomass_tpu.io.resample import (
    farthest_point_sampling,
    resample_point_clouds,
    voxel_downsample,
)
from dl_biomass_tpu.io.reader import write_las
from dl_biomass_tpu.io.synthetic import synthetic_plot


@pytest.fixture
def las_dir(tmp_path, rng):
    for i in range(4):
        coords, intensity, _ = synthetic_plot(rng, 400)
        write_las(coords, str(tmp_path / f"RM_{i:03d}.las"),
                  {"intensity": intensity.astype(np.uint16)})
    return tmp_path


class TestFPSEngines:
    def test_engines_agree(self, rng):
        coords = rng.normal(size=(200, 3)) * 10
        a = farthest_point_sampling(coords, 32, engine="numpy")
        b = farthest_point_sampling(coords, 32, engine="tpu")
        np.testing.assert_array_equal(a, b)

    def test_seeded_at_zero(self, rng):
        coords = rng.normal(size=(50, 3))
        idx = farthest_point_sampling(coords, 10, engine="numpy")
        assert idx[0] == 0  # reference seeds at index 0

    def test_sectored_engine_valid(self, rng):
        coords = rng.normal(size=(512, 3)) * 10
        idx = farthest_point_sampling(coords, 64, engine="sectored")
        assert len(idx) == 64 and len(set(idx.tolist())) == 64
        assert idx.min() >= 0 and idx.max() < 512

    def test_voxel_downsample(self):
        coords = np.asarray([[0.0, 0, 0], [0.01, 0, 0], [5, 5, 5], [5.01, 5, 5]])
        idx = voxel_downsample(coords, 1.0)
        assert len(idx) == 2


class TestResampler:
    def test_parquet_output(self, las_dir, tmp_path):
        out = tmp_path / "out"
        written = resample_point_clouds(str(las_dir), str(out), 128,
                                        samp_meth="random", log_fn=lambda s: None)
        assert len(written) == 4
        df = pd.read_parquet(written[0])
        assert list(df.columns) == ["x", "y", "z", "i_norm"]
        assert len(df) == 128
        np.testing.assert_allclose(df[["x", "y", "z"]].mean(), 0, atol=1e-9)
        assert os.path.basename(written[0]).endswith("_random_128.parq")

    def test_las_output_roundtrip(self, las_dir, tmp_path):
        from dl_biomass_tpu.io.reader import read_las

        out = tmp_path / "out"
        written = resample_point_clouds(str(las_dir), str(out), 64, samp_meth="fps",
                                        use_parquet=False, engine="numpy",
                                        log_fn=lambda s: None)
        coords, attrs = read_las(written[0], get_attributes=True, filter_height=0)
        assert coords.shape == (64, 3)
        assert "intensity_normalized" in attrs

    def test_presampled_dataset_reads_parquet(self, las_dir, tmp_path):
        from dl_biomass_tpu.io.dataset import PointCloudsInFilesPreSampled

        out = tmp_path / "pre"
        resample_point_clouds(str(las_dir), str(out), 128, samp_meth="random",
                              log_fn=lambda s: None)
        rows = [dict(PlotID=f"RM_{i:03d}", bark_btphr=1, branch_btphr=2,
                     foliage_btphr=3, wood_btphr=4) for i in range(4)]
        csv = tmp_path / "b.csv"
        pd.DataFrame(rows).to_csv(csv, index=False)
        ds = PointCloudsInFilesPreSampled(str(out), "*.parq", biomass_csv=str(csv),
                                          presampled_suffix="_random_128")
        pos, feat, y, pid = ds.get(0)
        assert pos.shape == (128, 3) and pid == "RM_000"
        np.testing.assert_array_equal(y, [1, 2, 3, 4])


class TestTBoard:
    def test_roundtrip_and_reference_format(self, tmp_path):
        from dl_biomass_tpu.utils.tboard import SummaryWriter, read_scalars

        w = SummaryWriter(logdir=str(tmp_path / "run"))
        w.scalar("Training MSE", 1.25, 0)
        w.add_scalar("Validation MSE", 2.5, 0)
        w.close()
        f = glob.glob(str(tmp_path / "run" / "events.out.tfevents.*"))[0]
        scalars = read_scalars(f)
        assert (0, "Training MSE", 1.25) in scalars
        assert (0, "Validation MSE", 2.5) in scalars


class TestAugVis:
    def test_visualize_augmentation(self, tmp_path, rng):
        from dl_biomass_tpu.experiments.visualize_augmentation import visualize_augmentation

        coords, _, _ = synthetic_plot(rng, 200)
        out = tmp_path / "aug.png"
        aug = visualize_augmentation(coords - coords.mean(0), out_path=str(out))
        assert out.stat().st_size > 5000
        assert 180 <= len(aug) <= 221


class TestDensity:
    def test_point_density_effect_runs(self, tmp_path, rng):
        from dl_biomass_tpu.core.config import HyperParams, TrainConfig
        from dl_biomass_tpu.experiments.density import point_density_effect

        pos_list, feat_list = [], []
        for _ in range(4):
            coords, intensity, _ = synthetic_plot(rng, 400)
            pos_list.append(coords - coords.mean(0))
            feat_list.append(intensity[:, None].astype(np.float32))
        y = rng.uniform(1, 50, size=(4, 4)).astype(np.float32)
        cfg = TrainConfig(
            hp=HyperParams(batch_size=2, num_augs=1, patience=5), num_epochs=2,
        )
        out_csv = tmp_path / "density.csv"
        df = point_density_effect(
            pos_list, feat_list, y, [f"RM_{i:03d}" for i in range(4)],
            point_range=[100, 200], cfg=cfg, out_csv=str(out_csv),
            log_fn=lambda s: None,
        )
        assert list(df["point_num"]) == [100, 200]
        assert {"val_mse", "runtime", "clouds_per_sec", "epochs"} <= set(df.columns)
        assert np.isfinite(df["val_mse"]).all()
        on_disk = pd.read_csv(out_csv)
        assert len(on_disk) == 2

    def test_density_cli_hp_passthrough(self, las_dir, tmp_path, monkeypatch):
        """--hp.* overrides must reach the ablation's training config; without
        them the reference's alternate tuned set (cfg=None) is used."""
        import dl_biomass_tpu.experiments.density as density_mod
        from dl_biomass_tpu.__main__ import main

        rows = [dict(PlotID=f"RM_{i:03d}", bark_btphr=1, branch_btphr=2,
                     foliage_btphr=3, wood_btphr=4) for i in range(4)]
        csv = tmp_path / "b.csv"
        pd.DataFrame(rows).to_csv(csv, index=False)

        captured = {}

        def fake(pos_list, feat_list, y, ids, **kw):
            captured.update(kw)
            assert len(pos_list) == 4
            return pd.DataFrame()

        monkeypatch.setattr(density_mod, "point_density_effect", fake)
        base = ["density", "--data.train_dir", str(las_dir),
                "--data.biomass_csv", str(csv), "--range", "100:300:100",
                "--out-csv", str(tmp_path / "d.csv")]
        assert main(base) == 0
        assert captured["cfg"] is None  # reference alternate tuned set

        assert main(base + ["--hp.lr", "0.001"]) == 0
        assert captured["cfg"] is not None
        assert captured["cfg"].hp.lr == 0.001


class TestCLI:
    def test_resample_command(self, las_dir, tmp_path):
        from dl_biomass_tpu.__main__ import main

        rc = main(["resample", "--in-dir", str(las_dir), "--out-dir",
                   str(tmp_path / "o"), "--num-points", "64", "--method", "random"])
        assert rc == 0
        assert len(list((tmp_path / "o").glob("*.parq"))) == 4

    def test_unknown_command(self):
        from dl_biomass_tpu.__main__ import main

        assert main(["frobnicate"]) == 2

    def test_visualize_aug_command(self, las_dir, tmp_path):
        from dl_biomass_tpu.__main__ import main

        las = str(next(las_dir.glob("*.las")))
        out = str(tmp_path / "v.png")
        assert main(["visualize-aug", "--las", las, "--out", out]) == 0
        assert os.path.getsize(out) > 5000
