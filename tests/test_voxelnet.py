"""Voxel model family: the TPU-native rebuild of the reference's
MinkowskiEngine probe (``Misc/Minkowski_Engine/Minkowski_Main_V1.py:4-35``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.core.cloud import CloudBatch
from dl_biomass_tpu.core.config import HyperParams, TrainConfig
from dl_biomass_tpu.models.pointnet2 import build_model, model_from_dict, model_to_dict
from dl_biomass_tpu.models.voxelnet import VoxelNet
from dl_biomass_tpu.ops.voxelize import voxelize, voxelize_reference


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _batch(rng, b=3, n=256, f=1):
    return CloudBatch(
        pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 5, jnp.float32),
        feat=jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32),
        mask=jnp.asarray(rng.random((b, n)) > 0.2),
        y=jnp.asarray(rng.normal(size=(b, 4)), jnp.float32),
    )


class TestVoxelize:
    @pytest.mark.parametrize("extent", [None, 12.0])
    def test_matches_numpy_oracle(self, rng, extent):
        b, n, f, g = 2, 300, 2, 8
        pos = rng.normal(size=(b, n, 3)).astype(np.float32) * 4
        feat = rng.normal(size=(b, n, f)).astype(np.float32)
        mask = rng.random((b, n)) > 0.3
        counts, fs, os_ = voxelize(
            jnp.asarray(pos), jnp.asarray(feat), jnp.asarray(mask),
            grid=g, extent=extent,
        )
        rc, rf, ro = voxelize_reference(pos, feat, mask, grid=g, extent=extent)
        np.testing.assert_array_equal(np.asarray(counts), rc)
        np.testing.assert_allclose(np.asarray(fs), rf, atol=1e-5)
        np.testing.assert_allclose(np.asarray(os_), ro, atol=1e-5)
        assert float(jnp.sum(counts[0])) == float(mask[0].sum())

    def test_no_features(self, rng):
        pos = jnp.asarray(rng.normal(size=(1, 64, 3)), jnp.float32)
        mask = jnp.ones((1, 64), bool)
        counts, fs, os_ = voxelize(pos, None, mask, grid=4)
        assert fs.shape == (1, 4, 4, 4, 0)
        assert float(jnp.sum(counts)) == 64

    def test_feature_gradient_flows(self, rng):
        """Scatter-add is differentiable w.r.t. features (VJP = gather)."""
        pos = jnp.asarray(rng.normal(size=(1, 32, 3)), jnp.float32)
        feat = jnp.asarray(rng.normal(size=(1, 32, 2)), jnp.float32)
        mask = jnp.asarray(rng.random((1, 32)) > 0.2)

        g = jax.grad(lambda f: jnp.sum(voxelize(pos, f, mask, grid=4)[1] ** 2))(feat)
        # every valid point's feature contributes; every padded one doesn't
        norms = np.asarray(jnp.abs(g).sum(-1))[0]
        m = np.asarray(mask)[0]
        assert (norms[~m] == 0).all()
        assert (norms[m] > 0).any()


class TestVoxelNet:
    def test_probe_parity_param_count(self, rng):
        """Kernel shapes match the Minkowski probe (27 x Cin x Cout; conv1 no
        bias, conv2 bias; BN affine; 128->out linear)."""
        model = VoxelNet(num_features=1, grid=8)
        batch = _batch(rng, n=128)
        variables = model.init(jax.random.key(0), batch, train=True)
        got = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        assert got == model.param_count()
        k1 = variables["params"]["conv1"]["kernel"]
        assert k1.shape == (3, 3, 3, model.voxel_channels, 64)
        assert "bias" not in variables["params"]["conv1"]  # probe: bias=False
        assert variables["params"]["conv2"]["kernel"].shape == (3, 3, 3, 64, 128)
        assert variables["params"]["head"]["kernel"].shape == (128, 4)

    def test_forward_shapes_and_finite(self, rng):
        model = VoxelNet(num_features=1, grid=16)
        batch = _batch(rng)
        variables = model.init(jax.random.key(0), batch, train=True)
        out = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            batch, train=False,
        )
        assert out.shape == (3, 4) and out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_pad_invariance(self, rng):
        """Garbage in masked slots must not change predictions."""
        model = VoxelNet(num_features=1, grid=8)
        batch = _batch(rng)
        variables = model.init(jax.random.key(0), batch, train=True)
        vs = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        out1 = model.apply(vs, batch, train=False)
        garbage = jnp.where(batch.mask[..., None], batch.pos, 1e6)
        gfeat = jnp.where(batch.mask[..., None], batch.feat, -333.0)
        out2 = model.apply(
            vs, CloudBatch(pos=garbage, feat=gfeat, mask=batch.mask, y=batch.y),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_odd_grid_compiles(self, rng):
        """SAME conv + SAME mask pool keep shapes aligned for non-power-of-2."""
        model = VoxelNet(num_features=1, grid=9)
        batch = _batch(rng, b=1, n=64)
        variables = model.init(jax.random.key(0), batch, train=True)
        out = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            batch, train=False,
        )
        assert out.shape == (1, 4)

    def test_trainer_loss_decreases(self, rng):
        """The family drops into the unchanged Trainer (family='voxelnet')."""
        from dl_biomass_tpu.train.trainer import Trainer

        cfg = TrainConfig(hp=HyperParams(batch_size=4, lr=3e-3))
        cfg.model.family = "voxelnet"
        cfg.model.voxel_grid = 8
        cfg.model.compute_dtype = "float32"
        model = build_model(cfg, num_features=1)
        assert isinstance(model, VoxelNet)
        batch = _batch(rng, b=4, n=256)
        trainer = Trainer(model, cfg)
        state = trainer.init_state(jax.random.key(0), batch)
        key = jax.random.key(1)
        first = last = None
        for i in range(30):
            state, loss = trainer._train_step(state, batch, jax.random.fold_in(key, i))
            if i == 0:
                first = float(loss)
        last = float(loss)
        assert last < first * 0.7, (first, last)

    def test_sidecar_roundtrip(self, rng):
        model = VoxelNet(num_features=2, grid=12, extent=10.0,
                         compute_dtype=jnp.bfloat16)
        d = model_to_dict(model)
        assert d["family"] == "voxelnet"
        m2 = model_from_dict(d)
        assert isinstance(m2, VoxelNet)
        assert (m2.grid, m2.extent, m2.num_features) == (12, 10.0, 2)
        assert m2.compute_dtype == jnp.bfloat16
        batch = _batch(rng, f=2)
        v1 = model.init(jax.random.key(0), batch, train=True)
        out1 = model.apply(v1, batch, train=False)
        out2 = m2.apply(v1, batch, train=False)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


class TestVoxelSelectFirst:
    """On-device voxel downsample vs the host io/resample.voxel_downsample
    oracle (first-per-voxel, ascending original index)."""

    def test_matches_host_voxel_downsample(self):
        import numpy as np

        from dl_biomass_tpu.io.resample import voxel_downsample
        from dl_biomass_tpu.ops.voxelize import voxel_select_first

        rng = np.random.default_rng(0)
        n, n_keep = 2048, 512
        pos = (rng.normal(size=(2, n, 3)) * 5).astype(np.float32)
        mask = np.ones((2, n), bool)
        mask[1, 1500:] = False
        idx, omask = voxel_select_first(
            jnp.asarray(pos), jnp.asarray(mask), voxel_size=0.35, n_keep=n_keep)
        idx, omask = np.asarray(idx), np.asarray(omask)
        for i in range(2):
            want = voxel_downsample(
                pos[i][mask[i]].astype(np.float64), 0.35)[:n_keep]
            got = idx[i][omask[i]]
            assert len(got) == len(want)
            np.testing.assert_array_equal(got, want)

    def test_truncation_matches_host_prefix(self):
        import numpy as np

        from dl_biomass_tpu.io.resample import voxel_downsample
        from dl_biomass_tpu.ops.voxelize import voxel_select_first

        rng = np.random.default_rng(1)
        n, n_keep = 4096, 64  # far fewer slots than occupied voxels
        pos = (rng.normal(size=(1, n, 3)) * 5).astype(np.float32)
        mask = np.ones((1, n), bool)
        idx, omask = voxel_select_first(
            jnp.asarray(pos), jnp.asarray(mask), voxel_size=0.35, n_keep=n_keep)
        assert np.asarray(omask).all()
        want = voxel_downsample(pos[0].astype(np.float64), 0.35)[:n_keep]
        np.testing.assert_array_equal(np.asarray(idx)[0], want)

    def test_all_invalid_row_yields_empty_mask(self):
        import numpy as np

        from dl_biomass_tpu.ops.voxelize import voxel_select_first

        rng = np.random.default_rng(2)
        pos = (rng.normal(size=(1, 256, 3)) * 5).astype(np.float32)
        mask = np.zeros((1, 256), bool)
        idx, omask = voxel_select_first(
            jnp.asarray(pos), jnp.asarray(mask), voxel_size=0.35, n_keep=64)
        assert not np.asarray(omask).any()
