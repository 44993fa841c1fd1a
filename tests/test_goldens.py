"""Golden-value tests pinning the reference's numerics and committed constants."""

import numpy as np

from dl_biomass_tpu.core.config import HyperParams, ModelConfig
from dl_biomass_tpu.models import PointNet2Regressor
from dl_biomass_tpu.train.loss import COMPONENT_WEIGHTS


class TestReferenceConstants:
    def test_loss_weights(self):
        # main.py:163-166
        assert COMPONENT_WEIGHTS == (1 / 11, 1 / 12, 1 / 5, 1 / 72)

    def test_tuned_hyperparameters(self):
        # main.py:38-48 (committed best trial)
        hp = HyperParams()
        assert hp.lr == 0.00179966410046844
        assert hp.weight_decay == 8.0250963438986e-05
        assert hp.num_points == 7168
        assert hp.batch_size == 36
        assert hp.num_augs == 10
        assert hp.patience == 10
        assert hp.activation_function == "ReLU"
        assert hp.neuron_multiplier == 0
        assert hp.dropout_probability == 0.5
        assert hp.optimizer == "Adam"

    def test_sa_layer_spec(self):
        # pointnet2_regressor.py:46-48
        m = PointNet2Regressor(num_features=1)
        assert (m.sa1_ratio, m.sa1_radius) == (0.2, 2.0)
        assert (m.sa2_ratio, m.sa2_radius) == (0.25, 8.0)
        assert m.max_neighbors == 64  # radius(..., max_num_neighbors=64)
        assert m.num_outputs == 4
        mc = ModelConfig()
        assert (mc.sa1_ratio, mc.sa1_radius, mc.sa2_ratio, mc.sa2_radius) == (0.2, 2.0, 0.25, 8.0)

    def test_intensity_normalization_x20(self):
        # pointcloud_dataloader.py:42-44
        from dl_biomass_tpu.io.reader import normalize_intensity

        out = normalize_intensity(np.asarray([100.0, 150.0, 200.0]))
        np.testing.assert_allclose(out, [0.0, 10.0, 20.0])

    def test_reference_best_run_parseable(self):
        """The framework's tfevents reader reproduces the baseline 0.697 val MSE
        from the reference's committed run history (BASELINE.md row 1)."""
        import glob

        from dl_biomass_tpu.utils.tboard import read_scalars

        runs = glob.glob("/root/reference/runs/Jul22_10-55-14*/events*")
        if not runs:  # reference tree not mounted
            import pytest

            pytest.skip("reference runs/ not available")
        vals = [v for _, t, v in read_scalars(runs[0]) if "Validation" in t]
        assert round(min(vals), 3) == 0.697
