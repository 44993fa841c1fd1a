"""Sequential training objective: study integration, pruning, search space."""

import numpy as np
import pytest

from dl_biomass_tpu.core.config import HyperParams, TrainConfig
from dl_biomass_tpu.io.device_data import DeviceDataset
from dl_biomass_tpu.io.synthetic import synthetic_dataset
from dl_biomass_tpu.sweep import RandomSampler, TrialState, create_study
from dl_biomass_tpu.sweep.objective import make_training_objective


@pytest.mark.slow  # ~1 min: multi-trial studies with real training loops
def test_training_objective_runs_trials():
    pos, feat, y, ids = synthetic_dataset(8, 128, seed=0)
    ds = DeviceDataset.from_clouds(pos, feat, y, ids, base_n=128)
    cfg = TrainConfig(hp=HyperParams(num_points=128))
    study = create_study(sampler=RandomSampler(0), pruner=None)
    objective = make_training_objective(
        ds, ds, base_cfg=cfg, max_num_epochs=2,
        search_batch_and_augs=False, log_fn=lambda s: None,
    )
    study.optimize(objective, n_trials=2)
    done = study.get_trials(states=[TrialState.COMPLETE])
    assert len(done) == 2
    for t in done:
        assert np.isfinite(t.value)
        assert 1e-6 <= t.params["lr"] <= 1e-1
        assert t.params["patience"] % 5 == 0
        assert len(t.intermediate_values) == 2  # reported each epoch
