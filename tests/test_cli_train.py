"""CLI train subcommand end-to-end on the test mesh (tiny corpus)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from dl_biomass_tpu.io.reader import write_las
from dl_biomass_tpu.io.synthetic import synthetic_plot


@pytest.fixture
def corpus(tmp_path, rng):
    rows = []
    for split, count in (("train", 6), ("val", 3), ("test", 3)):
        os.makedirs(tmp_path / split)
        for j in range(count):
            i = len(rows)
            coords, intensity, biomass = synthetic_plot(rng, 300)
            pid = f"RM_{i:03d}"
            write_las(coords, str(tmp_path / split / f"{pid}.las"),
                      {"intensity": intensity.astype(np.uint16)})
            rows.append(dict(PlotID=pid, bark_btphr=biomass[0], branch_btphr=biomass[1],
                             foliage_btphr=biomass[2], wood_btphr=biomass[3]))
    pd.DataFrame(rows).to_csv(tmp_path / "biomass.csv", index=False)
    return tmp_path


@pytest.mark.slow  # ~1 min: full CLI train subprocess on a tiny corpus
def test_cli_train_end_to_end(corpus, tmp_path):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_comp_cache",
    )
    model_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "dl_biomass_tpu", "train",
         "--data.train_dir", str(corpus / "train"),
         "--data.val_dir", str(corpus / "val"),
         "--data.test_dir", str(corpus / "test"),
         "--data.biomass_csv", str(corpus / "biomass.csv"),
         "--data.use_presampled", "false",
         "--hp.num_points", "128", "--hp.batch_size", "3", "--hp.num_augs", "1",
         "--hp.ground_filter_height", "0.2", "--num_epochs", "2",
         "--model.compute_dtype", "float32",
         "--model_dir", model_dir],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Best val MSE" in r.stdout
    # artifacts: CSV log, checkpoint + sidecar, MSE curves, eval figures
    assert os.path.exists(os.path.join(model_dir, "training_log.csv"))
    assert os.path.exists(os.path.join(model_dir, "model_config.json"))
    assert os.path.exists(os.path.join(model_dir, "mse_curves.png"))
    assert any(d.startswith("epoch_") for d in os.listdir(model_dir))
    assert os.path.exists(os.path.join(model_dir, "figures", "tree_btphr_obs_vs_pred.png"))
    lines = open(os.path.join(model_dir, "training_log.csv")).read().strip().splitlines()
    assert len(lines) == 2  # epoch, train_mse, val_mse per epoch
