"""AOT serving export (models/export.py): roundtrip parity, envelope
handling, platform gating, and the CLI export-model -> predict --from-export
path. The artifact is the TPU-native replacement for the reference's
whole-module torch.save pickles (main.py:243-245, testing_model.py:30-37)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.core.cloud import CloudBatch
from dl_biomass_tpu.models import PointNet2Regressor
from dl_biomass_tpu.models.export import export_serving, load_serving
from dl_biomass_tpu.models.inference import compile_inference


@pytest.fixture
def exported(tmp_path, rng):
    b, n = 2, 384
    batch = CloudBatch(
        pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 3, jnp.float32),
        feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
        mask=jnp.asarray(np.arange(n)[None] < np.asarray([384, 300])[:, None]),
        y=None,
    )
    model = PointNet2Regressor(num_features=1, use_pallas=True, fast_group=True)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    path = str(tmp_path / "artifact")
    meta = export_serving(model, variables, batch_size=b, num_points=n, path=path)
    return model, variables, batch, path, meta


class TestExportRoundtrip:
    def test_artifact_files_and_meta(self, exported):
        _, _, _, path, meta = exported
        assert {"serving.stablehlo", "weights.npz", "meta.json"} <= set(os.listdir(path))
        assert meta["batch_size"] == 2 and meta["num_points"] == 384
        assert meta["num_features"] == 1 and meta["num_outputs"] == 4
        assert jax.default_backend() in meta["platforms"]

    def test_matches_engine_exactly(self, exported):
        model, variables, batch, path, _ = exported
        want = np.asarray(compile_inference(model, variables)(batch))
        loaded = load_serving(path)
        got = np.asarray(loaded(batch.pos, batch.feat, batch.mask))
        # same computation, same platform: the deserialized StableHLO must
        # reproduce the engine bit-exactly
        np.testing.assert_array_equal(got, want)

    def test_envelope_mismatch_raises(self, exported):
        *_, path, _ = exported
        loaded = load_serving(path)
        bad = np.zeros((3, 384, 3), np.float32)  # batch 3 != envelope 2
        with pytest.raises(ValueError, match="envelope"):
            loaded(bad, np.zeros((3, 384, 1), np.float32), np.zeros((3, 384), bool))

    def test_predict_chunks_and_pads(self, exported, rng):
        """predict() serves any plot count by chunking to the envelope batch
        and padding the tail with masked-out clouds; per-cloud forwards are
        batch-independent, so rows must match the strict-envelope outputs."""
        model, variables, _, path, _ = exported
        loaded = load_serving(path)
        p, n = 5, 384
        pos = rng.normal(size=(p, n, 3)).astype(np.float32) * 3
        feat = rng.normal(size=(p, n, 1)).astype(np.float32)
        mask = (np.arange(n)[None] < rng.integers(200, n + 1, size=(p, 1)))
        got = loaded.predict(pos, feat, mask)
        assert got.shape == (p, 4)
        serve = compile_inference(model, variables)
        for i in range(p):  # each plot served alone in a padded batch
            two = lambda a: np.concatenate([a[i : i + 1], np.zeros_like(a[:1])])
            want = np.asarray(serve(CloudBatch(
                pos=jnp.asarray(two(pos)), feat=jnp.asarray(two(feat)),
                mask=jnp.asarray(two(mask)), y=None)))[0]
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)

    def test_predict_wrong_point_count_raises(self, exported):
        *_, path, _ = exported
        loaded = load_serving(path)
        with pytest.raises(ValueError, match="num_points"):
            loaded.predict(np.zeros((2, 256, 3), np.float32),
                           np.zeros((2, 256, 1), np.float32),
                           np.zeros((2, 256), bool))

    def test_wrong_platform_refused(self, exported):
        *_, path, _ = exported
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["platforms"] = ["tpu"] if jax.default_backend() != "tpu" else ["cpu"]
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        with pytest.raises(RuntimeError, match="lowered for"):
            load_serving(path)

    def test_newer_format_refused(self, exported):
        *_, path, _ = exported
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["format"] = 999
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        with pytest.raises(ValueError, match="newer"):
            load_serving(path)


class TestExportCLI:
    def test_export_then_predict_from_export(self, tmp_path, rng):
        """Full deployment loop: checkpoint -> export-model -> predict
        --from-export, matching the checkpoint-served predictions."""
        from dl_biomass_tpu.__main__ import cmd_export_model, cmd_predict
        from dl_biomass_tpu.core.config import HyperParams, TrainConfig
        from dl_biomass_tpu.io.reader import write_las
        from dl_biomass_tpu.io.synthetic import synthetic_plot
        from dl_biomass_tpu.models.pointnet2 import build_model, model_to_dict
        from dl_biomass_tpu.train.checkpoint import save_checkpoint
        from dl_biomass_tpu.train.trainer import Trainer

        n = 256
        plot_dir = tmp_path / "plots"
        os.makedirs(plot_dir)
        for i in range(3):
            coords, intensity, _ = synthetic_plot(rng, n)
            inorm = (intensity - intensity.min()) / max(float(np.ptp(intensity)), 1) * 20
            write_las(coords, str(plot_dir / f"RM_{i:03d}_fps_7168.las"),
                      {"intensity_normalized": inorm.astype(np.float32)})
        cfg = TrainConfig(hp=HyperParams(batch_size=2, num_points=n))
        cfg.model.compute_dtype = "float32"
        model = build_model(cfg, num_features=1)
        trainer = Trainer(model, cfg)
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

        art = str(tmp_path / "artifact")
        cmd_export_model(["--model-dir", ckpt_dir, "--out", art,
                          "--batch-size", "2", "--num-points", str(n)])
        assert os.path.isdir(art)

        import pandas as pd

        ref_csv = str(tmp_path / "ref.csv")
        exp_csv = str(tmp_path / "exp.csv")
        cmd_predict(["--model-dir", ckpt_dir, "--in-dir", str(plot_dir),
                     "--out", ref_csv, "--batch-size", "2"])
        cmd_predict(["--in-dir", str(plot_dir), "--out", exp_csv,
                     "--from-export", art, "--batch-size", "2"])
        ref = pd.read_csv(ref_csv, index_col="PlotID")
        got = pd.read_csv(exp_csv, index_col="PlotID")
        assert list(got.index) == list(ref.index)
        np.testing.assert_allclose(got.to_numpy(), ref.to_numpy(),
                                   rtol=1e-4, atol=1e-4)

        # watch mode from the artifact: one poll predicts all plots, matching
        # the direct --from-export predictions (daemon needs no model code)
        from dl_biomass_tpu.eval.predict import watch_directory

        watch_csv = str(tmp_path / "watch.csv")
        n_served = watch_directory(
            "unused_model_dir", str(plot_dir), watch_csv, max_polls=1,
            batch_size=2, export_path=art, log_fn=lambda *_: None,
        )
        assert n_served == 3
        wdf = pd.read_csv(watch_csv, index_col="PlotID").loc[got.index]
        np.testing.assert_allclose(wdf.to_numpy(), got.to_numpy(),
                                   rtol=1e-5, atol=1e-5)
