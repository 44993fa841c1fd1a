"""Eval metrics / results-frame / figure tests."""

import numpy as np
import pytest

from dl_biomass_tpu.eval.metrics import build_results_frame, mape, metrics_table, r2_score, rmse


@pytest.fixture
def obs_pred(rng):
    obs = rng.uniform(10, 200, size=(40, 4))
    pred = obs + rng.normal(0, 5, size=(40, 4))
    ids = [f"{src}_{i:03d}" for i, src in enumerate(["BC", "RM", "PF", "XX"] * 10)]
    return obs, pred, ids


class TestMetrics:
    def test_r2_rmse_mape_match_sklearn(self, rng):
        import sklearn.metrics as skm

        o = rng.uniform(1, 100, 50)
        p = o + rng.normal(0, 10, 50)
        assert abs(r2_score(o, p) - skm.r2_score(o, p)) < 1e-9
        assert abs(rmse(o, p) - np.sqrt(skm.mean_squared_error(o, p))) < 1e-9
        assert abs(mape(o, p) - skm.mean_absolute_percentage_error(o, p)) < 1e-9

    def test_perfect_prediction(self):
        o = np.asarray([1.0, 2.0, 3.0])
        assert r2_score(o, o) == 1.0
        assert rmse(o, o) == 0.0
        assert mape(o, o) == 0.0


class TestResultsFrame:
    def test_columns_and_totals(self, obs_pred):
        obs, pred, ids = obs_pred
        df = build_results_frame(obs, pred, ids)
        np.testing.assert_allclose(
            df["tree_btphr_obs"], obs.sum(axis=1), rtol=1e-6
        )
        np.testing.assert_allclose(
            df["tree_btphr_resid"], obs.sum(1) - pred.sum(1), rtol=1e-5
        )
        # dataset colouring: BC=red, PF=blue, everything else green
        assert (df.loc[df["dataset"] == "BC", "colour"] == "red").all()
        assert (df.loc[df["dataset"] == "PF", "colour"] == "blue").all()
        assert (df.loc[df["dataset"] == "XX", "colour"] == "green").all()

    def test_metrics_table_rows_and_rounding(self, obs_pred):
        obs, pred, ids = obs_pred
        mdf = metrics_table(build_results_frame(obs, pred, ids))
        assert list(mdf.index) == [
            "wood_btphr", "bark_btphr", "branch_btphr", "foliage_btphr", "tree_btphr"
        ]
        assert mdf.loc["tree_btphr", "r2"] == round(
            r2_score(obs.sum(1), pred.sum(1)), 2
        )


class TestTestModelPlumbing:
    def test_presampled_suffix_reaches_dataset(self, tmp_path, rng):
        """test_model must honor a non-default presampled suffix (regression:
        the resample->train->evaluate chain failed the CSV join without it)."""
        import pandas as pd

        from dl_biomass_tpu.eval import testing as tst
        from dl_biomass_tpu.io.reader import normalize_intensity, write_las
        from dl_biomass_tpu.io.synthetic import synthetic_plot

        coords, intensity, _ = synthetic_plot(rng, 200)
        write_las(coords, str(tmp_path / "RM_000_fps_2048.las"),
                  {"intensity": intensity.astype(np.uint16),
                   "intensity_normalized": normalize_intensity(intensity)})
        pd.DataFrame([dict(PlotID="RM_000", bark_btphr=1, branch_btphr=1,
                           foliage_btphr=1, wood_btphr=1)]).to_csv(
            tmp_path / "b.csv", index=False)
        from dl_biomass_tpu.io.dataset import PointCloudsInFilesPreSampled

        ds = PointCloudsInFilesPreSampled(
            str(tmp_path), "*.las", biomass_csv=str(tmp_path / "b.csv"),
            presampled_suffix="_fps_2048",
        )
        assert ds.plot_id(0) == "RM_000"
        assert ds.get(0) is not None
        # and the entry point exposes the knob
        import inspect

        assert "presampled_suffix" in inspect.signature(tst.test_model).parameters


class TestFigures:
    def test_figures_written(self, tmp_path, obs_pred):
        from dl_biomass_tpu.eval.plots import plot_mse_curves, save_all_eval_figures

        obs, pred, ids = obs_pred
        df = build_results_frame(obs, pred, ids)
        paths = save_all_eval_figures(df, metrics_table(df), str(tmp_path))
        assert len(paths) == 4
        import os

        for p in paths:
            assert os.path.getsize(p) > 5000  # real PNGs, not stubs

        csv = tmp_path / "log.csv"
        csv.write_text("0, 5.0, 6.0\n1, 4.0, 4.5\n")
        plot_mse_curves(str(csv), str(tmp_path / "curve.png"))
        assert (tmp_path / "curve.png").stat().st_size > 5000

    def test_param_importances_figure(self, tmp_path):
        """Tune-CLI bar chart (reference hyperparameter_tuning.py:276-286)."""
        from dl_biomass_tpu.eval.plots import plot_param_importances

        imp = {"lr": 0.61, "batch_size": 0.22, "num_augs": 0.12, "patience": 0.05}
        out = plot_param_importances(imp, str(tmp_path / "imp.png"))
        assert (tmp_path / "imp.png").stat().st_size > 5000
        assert out == str(tmp_path / "imp.png")
