"""Target-free `predict` deployment path: directory of clouds -> CSV."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from dl_biomass_tpu.core.config import HyperParams, TrainConfig
from dl_biomass_tpu.eval.predict import predict_directory
from dl_biomass_tpu.io.reader import write_las
from dl_biomass_tpu.io.synthetic import synthetic_plot
from dl_biomass_tpu.models.pointnet2 import build_model, model_to_dict
from dl_biomass_tpu.train.checkpoint import save_checkpoint
from dl_biomass_tpu.train.trainer import Trainer


@pytest.fixture
def checkpoint_and_plots(tmp_path, rng):
    """A saved (untrained) checkpoint + 5 presampled LAS plots, NO biomass CSV."""
    n = 256
    plot_dir = tmp_path / "plots"
    os.makedirs(plot_dir)
    for i in range(5):
        coords, intensity, _ = synthetic_plot(rng, n)
        inorm = (intensity - intensity.min()) / max(float(np.ptp(intensity)), 1) * 20
        write_las(coords, str(plot_dir / f"RM_{i:03d}_fps_7168.las"),
                  {"intensity_normalized": inorm.astype(np.float32)})

    cfg = TrainConfig(hp=HyperParams(batch_size=2, num_points=n))
    cfg.model.compute_dtype = "float32"
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    from dl_biomass_tpu.core.cloud import CloudBatch

    batch = CloudBatch(
        pos=jnp.asarray(rng.normal(size=(2, n, 3)), jnp.float32),
        feat=jnp.asarray(rng.normal(size=(2, n, 1)), jnp.float32),
        mask=jnp.ones((2, n), bool),
        y=jnp.zeros((2, 4), jnp.float32),
    )
    state = trainer.init_state(jax.random.key(0), batch)
    ckpt_dir = str(tmp_path / "model")
    save_checkpoint(ckpt_dir, state, epoch=0, val_mse=1.0)
    with open(os.path.join(ckpt_dir, "model_config.json"), "w") as f:
        json.dump({"model": model_to_dict(model), "train": cfg.to_dict()}, f)
    return ckpt_dir, str(plot_dir), tmp_path


def test_predict_directory_writes_csv(checkpoint_and_plots):
    ckpt_dir, plot_dir, tmp_path = checkpoint_and_plots
    out = str(tmp_path / "preds.csv")
    df = predict_directory(ckpt_dir, plot_dir, out, batch_size=2)
    assert len(df) == 5
    # presampled suffix stripped from PlotIDs
    assert sorted(df.index) == [f"RM_{i:03d}" for i in range(5)]
    got = pd.read_csv(out, index_col="PlotID")
    assert list(got.columns) == [
        "bark_btphr", "branch_btphr", "foliage_btphr", "wood_btphr", "tree_btphr"
    ]
    np.testing.assert_allclose(
        got["tree_btphr"],
        got[["bark_btphr", "branch_btphr", "foliage_btphr", "wood_btphr"]].sum(axis=1),
        rtol=1e-6,
    )
    assert np.isfinite(got.to_numpy()).all()


def test_predict_engine_matches_apply_path(checkpoint_and_plots):
    ckpt_dir, plot_dir, _ = checkpoint_and_plots
    a = predict_directory(ckpt_dir, plot_dir, None, engine=True)
    b = predict_directory(ckpt_dir, plot_dir, None, engine=False)
    rel = np.abs(a.to_numpy() - b.to_numpy()).max() / (
        np.abs(b.to_numpy()).max() + 1e-9
    )
    assert rel < 1e-4, rel


def test_predict_cli_subcommand(checkpoint_and_plots):
    ckpt_dir, plot_dir, tmp_path = checkpoint_and_plots
    from dl_biomass_tpu.__main__ import main

    out = str(tmp_path / "cli_preds.csv")
    main(["predict", "--model-dir", ckpt_dir, "--in-dir", plot_dir,
          "--out", out, "--batch-size", "2"])
    assert os.path.exists(out)
    assert len(pd.read_csv(out)) == 5


def test_predict_accepts_arbitrary_plot_names(checkpoint_and_plots, rng):
    """Deployment plots aren't named after the training corpora (BC/RM/PF);
    the default accepts every prefix present in the directory."""
    ckpt_dir, plot_dir, tmp_path = checkpoint_and_plots
    import tempfile

    other = tempfile.mkdtemp(dir=tmp_path)
    coords, intensity, _ = synthetic_plot(rng, 256)
    inorm = (intensity - intensity.min()) / max(float(np.ptp(intensity)), 1) * 20
    write_las(coords, os.path.join(other, "site_001.las"),
              {"intensity_normalized": inorm.astype(np.float32)})
    df = predict_directory(ckpt_dir, other, None, batch_size=2)
    assert list(df.index) == ["site_001"]


def test_predict_voxelnet_checkpoint_falls_back_to_apply(tmp_path, rng):
    """A non-PointNet2 family checkpoint serves through model.apply (the
    engine raises NotImplementedError, not AttributeError)."""
    n = 256
    plot_dir = tmp_path / "plots"
    os.makedirs(plot_dir)
    coords, intensity, _ = synthetic_plot(rng, n)
    inorm = (intensity - intensity.min()) / max(float(np.ptp(intensity)), 1) * 20
    write_las(coords, str(plot_dir / "RM_000_fps_7168.las"),
              {"intensity_normalized": inorm.astype(np.float32)})

    cfg = TrainConfig(hp=HyperParams(batch_size=2, num_points=n))
    cfg.model.family = "voxelnet"
    cfg.model.voxel_grid = 8
    cfg.model.compute_dtype = "float32"
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    from dl_biomass_tpu.core.cloud import CloudBatch

    batch = CloudBatch(
        pos=jnp.asarray(rng.normal(size=(2, n, 3)), jnp.float32),
        feat=jnp.asarray(rng.normal(size=(2, n, 1)), jnp.float32),
        mask=jnp.ones((2, n), bool),
        y=jnp.zeros((2, 4), jnp.float32),
    )
    state = trainer.init_state(jax.random.key(0), batch)
    ckpt_dir = str(tmp_path / "voxmodel")
    save_checkpoint(ckpt_dir, state, epoch=0, val_mse=1.0)
    with open(os.path.join(ckpt_dir, "model_config.json"), "w") as f:
        json.dump({"model": model_to_dict(model), "train": cfg.to_dict()}, f)

    df = predict_directory(ckpt_dir, str(plot_dir), None, batch_size=2)
    assert list(df.index) == ["RM_000"]
    assert np.isfinite(df.to_numpy()).all()


def test_predict_empty_dir_errors(checkpoint_and_plots, tmp_path):
    ckpt_dir, _, _ = checkpoint_and_plots
    empty = str(tmp_path / "empty")
    os.makedirs(empty, exist_ok=True)
    with pytest.raises(FileNotFoundError):
        predict_directory(ckpt_dir, empty, None)


def test_plot_bucket_same_predictions(checkpoint_and_plots):
    """plot_bucket pads the served plot count (and drops the padded rows) —
    predictions must be identical to the unbucketed run, and two directory
    sizes in one bucket must serve identical array shapes (one compile)."""
    ckpt_dir, plot_dir, tmp_path = checkpoint_and_plots
    df0 = predict_directory(ckpt_dir, plot_dir, None, batch_size=2, plot_bucket=0)
    df8 = predict_directory(ckpt_dir, plot_dir, None, batch_size=2, plot_bucket=8)
    assert list(df0.index) == list(df8.index)
    np.testing.assert_array_equal(df0.values, df8.values)


def test_pad_plots_shapes_and_guard(rng):
    from dl_biomass_tpu.io.device_data import DeviceDataset

    ds = DeviceDataset(
        rng.normal(size=(5, 64, 3)).astype(np.float32),
        rng.normal(size=(5, 64, 1)).astype(np.float32),
        np.ones((5, 64), bool), np.zeros((5, 4), np.float32),
        [f"BC_{i}" for i in range(5)], 64,
    )
    padded = ds.pad_plots(8)
    assert len(padded) == 8 and padded.plot_ids[5:] == ["__pad__"] * 3
    assert not bool(np.asarray(padded.mask[5:]).any())
    assert ds.pad_plots(5) is ds
    with pytest.raises(ValueError):
        ds.pad_plots(4)


def test_watch_directory_appends_new_plots(checkpoint_and_plots, rng):
    """watch mode: first poll predicts the existing plots; a restart after
    new files arrive appends ONLY the unseen ones (dedup from the CSV)."""
    from dl_biomass_tpu.eval.predict import watch_directory

    ckpt_dir, plot_dir, tmp_path = checkpoint_and_plots
    out = str(tmp_path / "watch.csv")
    n1 = watch_directory(ckpt_dir, plot_dir, out, max_polls=1,
                         poll_seconds=0, batch_size=2, plot_bucket=4,
                         log_fn=lambda s: None)
    assert n1 == 5
    df1 = pd.read_csv(out, index_col="PlotID")
    assert len(df1) == 5

    # two new plots arrive; a fresh watch (simulating a restart) must skip
    # the five already-served plots
    n = 256
    for i in (7, 8):
        coords, intensity, _ = synthetic_plot(np.random.default_rng(i), n)
        inorm = (intensity - intensity.min()) / max(float(np.ptp(intensity)), 1) * 20
        write_las(coords, os.path.join(plot_dir, f"RM_{i:03d}_fps_7168.las"),
                  {"intensity_normalized": inorm.astype(np.float32)})
    n2 = watch_directory(ckpt_dir, plot_dir, out, max_polls=1,
                         poll_seconds=0, batch_size=2, plot_bucket=4,
                         log_fn=lambda s: None)
    assert n2 == 2
    df2 = pd.read_csv(out, index_col="PlotID")
    assert len(df2) == 7
    # previously served rows are untouched
    np.testing.assert_array_equal(df2.loc[df1.index].values, df1.values)
    # appended predictions match a direct predict of the same plots
    direct = predict_directory(ckpt_dir, plot_dir, None, batch_size=2,
                               plot_bucket=4)
    np.testing.assert_allclose(
        df2.loc[[f"RM_{i:03d}" for i in (7, 8)]].values,
        direct.loc[[f"RM_{i:03d}" for i in (7, 8)]].values, rtol=1e-5)


def test_predict_cli_watch_wiring(checkpoint_and_plots, capsys):
    """`predict --watch --max-polls 1` through the real CLI entry."""
    from dl_biomass_tpu.__main__ import main

    ckpt_dir, plot_dir, tmp_path = checkpoint_and_plots
    out = str(tmp_path / "cli_watch.csv")
    main(["predict", "--model-dir", ckpt_dir, "--in-dir", plot_dir,
          "--out", out, "--watch", "--max-polls", "1", "--poll-seconds", "0",
          "--batch-size", "2", "--plot-bucket", "4"])
    assert "watch ended: 5 plots" in capsys.readouterr().out
    assert len(pd.read_csv(out)) == 5
