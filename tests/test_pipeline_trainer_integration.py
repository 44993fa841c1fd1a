"""PrefetchingLoader <-> Trainer integration: host-streamed training works."""

import jax
import numpy as np
import pandas as pd
import pytest

from dl_biomass_tpu.core.config import HyperParams, TrainConfig
from dl_biomass_tpu.io.reader import write_las
from dl_biomass_tpu.io.synthetic import synthetic_plot
from dl_biomass_tpu.models import PointNet2Regressor
from dl_biomass_tpu.train.trainer import Trainer


@pytest.fixture
def fileset(tmp_path, rng):
    from dl_biomass_tpu.io.dataset import PointCloudsInFiles

    rows = []
    for i in range(6):
        coords, intensity, biomass = synthetic_plot(rng, 300)
        pid = f"PF_{i:03d}"
        write_las(coords, str(tmp_path / f"{pid}.las"),
                  {"intensity": intensity.astype(np.uint16)})
        rows.append(dict(PlotID=pid, bark_btphr=biomass[0], branch_btphr=biomass[1],
                         foliage_btphr=biomass[2], wood_btphr=biomass[3]))
    csv = tmp_path / "b.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return PointCloudsInFiles(str(tmp_path), "*.las", max_points=128,
                              use_columns=["intensity_normalized"],
                              filter_height=0.2, dataset=["PF"], biomass_csv=str(csv))


def test_trainer_fit_with_prefetching_loader(fileset):
    from dl_biomass_tpu.io.pipeline import PrefetchingLoader

    cfg = TrainConfig(hp=HyperParams(batch_size=2, num_augs=1, patience=3, lr=3e-3))
    loader = PrefetchingLoader(fileset, batch_size=2, base_n=128, num_augs=1)
    model = PointNet2Regressor(num_features=1)
    trainer = Trainer(model, cfg)
    example = next(loader.epoch(jax.random.key(0)))
    state = trainer.init_state(jax.random.key(0), example)
    hist = trainer.fit(
        state,
        train_batches_fn=lambda k: loader.epoch(k),
        val_batches_fn=lambda: loader.epoch(jax.random.key(9), shuffle=False),
        key=jax.random.key(1),
        num_epochs=2,
        log_fn=lambda s: None,
    )
    assert len(hist["train_mse"]) == 2
    assert np.isfinite(hist["train_mse"]).all()
