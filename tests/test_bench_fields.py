"""bench.py standing-field tests (VERDICT r4 item 3: MFU / %-roofline).

The official bench record must carry machine-relative fields so perf progress
is visible against the hardware, not only the reference estimate. These run
the helper at toy shapes on CPU — the fields' presence and sanity are the
contract; the real magnitudes come from the driver's TPU run.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


@pytest.fixture(scope="module")
def tiny_setup():
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    batch = bench._make_batch(rng, 2, 256)
    cfg = TrainConfig(hp=HyperParams(batch_size=2))
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    return trainer, state, batch


class TestRooflineFields:
    def test_fields_present_and_sane(self, tiny_setup):
        trainer, state, batch = tiny_setup
        out = bench._roofline_fields(trainer, state, batch,
                                     train_dt=0.05, eval_dt=0.02)
        assert "train_mfu_pct" in out
        assert "train_hbm_roofline_pct" in out
        assert "eval_mfu_pct" in out
        assert "eval_hbm_roofline_pct" in out
        assert "roofline_note" in out
        for k, v in out.items():
            if k.endswith("_pct"):
                assert v > 0.0

    def test_scales_inversely_with_step_time(self, tiny_setup):
        # same program, doubled step time -> half the roofline fraction
        trainer, state, batch = tiny_setup
        fast = bench._roofline_fields(trainer, state, batch, 1e-4, 1e-4)
        slow = bench._roofline_fields(trainer, state, batch, 2e-4, 2e-4)
        assert slow["train_hbm_roofline_pct"] == pytest.approx(
            fast["train_hbm_roofline_pct"] / 2, rel=0.05)
        assert slow["eval_mfu_pct"] == pytest.approx(
            fast["eval_mfu_pct"] / 2, rel=0.05)
