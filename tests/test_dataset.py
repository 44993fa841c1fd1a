"""File-based dataset tests: prefix filter, CSV join, quirk parity."""

import numpy as np
import pandas as pd
import pytest

from dl_biomass_tpu.io.dataset import (
    PointCloudsInFiles,
    PointCloudsInFilesPreSampled,
    load_biomass_table,
)
from dl_biomass_tpu.io.reader import write_las
from dl_biomass_tpu.io.synthetic import synthetic_plot


@pytest.fixture
def plot_dir(tmp_path, rng):
    """6 LAS plots (2 per source) + biomass CSV."""
    rows = []
    for i, src in enumerate(["BC", "BC", "RM", "RM", "PF", "PF"]):
        coords, intensity, biomass = synthetic_plot(rng, 600)
        pid = f"{src}_{i:03d}"
        write_las(coords, str(tmp_path / f"{pid}.las"), {"intensity": intensity.astype(np.uint16)})
        rows.append({"PlotID": pid, "bark_btphr": biomass[0], "branch_btphr": biomass[1],
                     "foliage_btphr": biomass[2], "wood_btphr": biomass[3]})
    csv = tmp_path / "biomass.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return tmp_path, str(csv), rows


class TestPointCloudsInFiles:
    def test_dataset_prefix_filter(self, plot_dir):
        d, csv, rows = plot_dir
        ds = PointCloudsInFiles(str(d), "*.las", dataset=["BC"], biomass_csv=csv)
        assert len(ds) == 2
        ds = PointCloudsInFiles(str(d), "*.las", dataset=["BC", "RM", "PF"], biomass_csv=csv)
        assert len(ds) == 6

    def test_get_shapes_and_csv_join(self, plot_dir):
        d, csv, rows = plot_dir
        ds = PointCloudsInFiles(
            str(d), "*.las", max_points=256, use_columns=["intensity_normalized"],
            filter_height=0.2, dataset=["BC", "RM", "PF"], biomass_csv=csv,
        )
        pos, feat, y, pid = ds.get(0, np.random.default_rng(0))
        assert pos.shape == (256, 3) and feat.shape == (256, 1)
        row = next(r for r in rows if r["PlotID"] == pid)
        np.testing.assert_allclose(
            y, [row["bark_btphr"], row["branch_btphr"], row["foliage_btphr"], row["wood_btphr"]],
            rtol=1e-6,
        )

    def test_upsamples_small_clouds_with_replacement(self, plot_dir):
        d, csv, _ = plot_dir
        ds = PointCloudsInFiles(str(d), "*.las", max_points=5000, biomass_csv=csv,
                                dataset=["BC"], use_columns=["intensity_normalized"])
        pos, feat, y, pid = ds.get(0, np.random.default_rng(0))
        assert pos.shape == (5000, 3)  # 600-pt cloud upsampled

    def test_full_cloud_mean_centering_quirk(self, plot_dir):
        """Raw path: pos is centered by the FULL cloud's mean, so the subset's
        own mean is NOT zero (pointcloud_dataloader.py:108)."""
        d, csv, _ = plot_dir
        ds = PointCloudsInFiles(str(d), "*.las", max_points=64, biomass_csv=csv,
                                dataset=["RM"], use_columns=["intensity_normalized"])
        pos, *_ = ds.get(0, np.random.default_rng(1))
        assert np.abs(pos.mean(axis=0)).max() > 1e-4
        ds2 = PointCloudsInFiles(str(d), "*.las", max_points=64, biomass_csv=csv,
                                 dataset=["RM"], use_columns=["intensity_normalized"],
                                 center_after_subset=True)
        pos2, *_ = ds2.get(0, np.random.default_rng(1))
        np.testing.assert_allclose(pos2.mean(axis=0), 0, atol=1e-4)

    def test_load_all_device_dataset(self, plot_dir):
        d, csv, _ = plot_dir
        ds = PointCloudsInFiles(str(d), "*.las", max_points=128, biomass_csv=csv,
                                dataset=["BC", "RM", "PF"],
                                use_columns=["intensity_normalized"])
        dd = ds.load_all(np.random.default_rng(0))
        assert len(dd) == 6 and dd.base_n == 128
        assert dd.y.shape == (6, 4)


class TestPreSampled:
    def test_plotid_suffix_stripped(self, plot_dir, tmp_path, rng):
        d, csv, rows = plot_dir
        coords, intensity, _ = synthetic_plot(rng, 300)
        from dl_biomass_tpu.io.reader import normalize_intensity

        pre = tmp_path / "pre"
        pre.mkdir()
        write_las(coords, str(pre / "BC_000_fps_7168.las"),
                  {"intensity": intensity.astype(np.uint16),
                   "intensity_normalized": normalize_intensity(intensity)})
        ds = PointCloudsInFilesPreSampled(str(pre), "*.las", biomass_csv=csv)
        assert ds.plot_id(0) == "BC_000"
        pos, feat, y, pid = ds.get(0)
        assert pid == "BC_000"
        assert pos.shape == (300, 3) and feat.shape == (300, 1)

    def test_missing_csv_columns_rejected(self, tmp_path):
        bad = tmp_path / "bad.csv"
        bad.write_text("PlotID,bark_btphr\nBC_1,2.0\n")
        with pytest.raises(ValueError, match="missing biomass columns"):
            load_biomass_table(str(bad))
