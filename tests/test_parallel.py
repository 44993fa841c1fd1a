"""Multi-device tests on the virtual 8-device CPU mesh: DP training parity,
point-axis (mp) sharding, and the graft dry-run path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.core.cloud import CloudBatch
from dl_biomass_tpu.core.config import HyperParams, TrainConfig
from dl_biomass_tpu.io.device_data import DeviceDataset
from dl_biomass_tpu.io.synthetic import synthetic_dataset
from dl_biomass_tpu.models import PointNet2Regressor
from dl_biomass_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from dl_biomass_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def data():
    pos, feat, y, ids = synthetic_dataset(8, 128, seed=0)
    return DeviceDataset.from_clouds(pos, feat, y, ids, base_n=128)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestDataParallel:
    def test_mesh_construction(self):
        mesh = make_mesh(dp=-1, mp=1)
        assert mesh.shape == {"dp": 8, "mp": 1}
        mesh = make_mesh(dp=4, mp=2)
        assert mesh.shape == {"dp": 4, "mp": 2}
        with pytest.raises(ValueError):
            make_mesh(dp=16, mp=1)

    def test_dp_gradients_match_single_device(self, data):
        """Loss + gradients on an 8-way dp mesh must match the unsharded
        computation — XLA's inserted psum is a mean-preserving reduction of
        per-shard grads. (Post-optimizer params are NOT compared: Adam
        normalizes every element to a +-lr step, amplifying benign f32
        reduction-order differences to full-step size.)"""
        from dl_biomass_tpu.parallel.mesh import shard_batch
        from dl_biomass_tpu.train.loss import weighted_component_mse

        model = PointNet2Regressor(num_features=1)
        batch = next(data.batches(8))
        variables = model.init({"params": jax.random.key(0)}, batch, train=False)

        def loss_fn(params, b):
            out = model.apply({"params": params, **variables}, b, train=False)
            return weighted_component_mse(out, b.y, jnp.any(b.mask, axis=1))

        grad_fn = jax.jit(jax.value_and_grad(lambda p, b: loss_fn(p, b)))
        l1, g1 = grad_fn(variables["params"], batch)

        mesh = make_mesh(dp=8, mp=1)
        repl = replicated_sharding(mesh)
        params_r = jax.tree.map(lambda x: jax.device_put(x, repl), variables["params"])
        l2, g2 = grad_fn(params_r, shard_batch(batch, mesh))

        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)

    def test_dp_epoch_runs(self, data):
        cfg = TrainConfig(hp=HyperParams(batch_size=8, num_augs=0))
        model = PointNet2Regressor(num_features=1)
        mesh = make_mesh(dp=8, mp=1)
        trainer = Trainer(model, cfg, mesh=mesh)
        state = trainer.init_state(jax.random.key(0), next(data.batches(8)))
        state, mse, n = trainer.train_epoch(state, data.batches(8), jax.random.key(1))
        assert np.isfinite(mse) and n == 8

    def test_dp_fused_epoch_matches_unfused(self, data):
        """train_epoch_fused under the mesh (in-step dp sharding constraint)
        matches the shard_batch + train_epoch path."""
        cfg = TrainConfig(hp=HyperParams(batch_size=8, num_augs=0))
        model = PointNet2Regressor(num_features=1)
        mesh = make_mesh(dp=8, mp=1)
        trainer = Trainer(model, cfg, mesh=mesh)
        s0 = trainer.init_state(jax.random.key(0), next(data.batches(8)))
        s0b = jax.tree.map(jnp.copy, s0)  # steps donate their input state
        key = jax.random.key(1)
        _, mse_a, _ = trainer.train_epoch(s0, data.batches(8, key=key, shuffle=True), key)
        _, mse_b, n = trainer.train_epoch_fused(s0b, data, key, batch_size=8)
        assert n == 8
        np.testing.assert_allclose(mse_a, mse_b, rtol=1e-5)

    def test_dp_scan_epoch_matches_fused(self, data):
        """train_epoch_scan under the mesh (one dispatch per epoch, in-body dp
        sharding constraint) matches the per-step fused path."""
        cfg = TrainConfig(hp=HyperParams(batch_size=8, num_augs=0))
        model = PointNet2Regressor(num_features=1)
        mesh = make_mesh(dp=8, mp=1)
        trainer = Trainer(model, cfg, mesh=mesh)
        s0 = trainer.init_state(jax.random.key(0), next(data.batches(8)))
        s0b = jax.tree.map(jnp.copy, s0)  # steps donate their input state
        key = jax.random.key(1)
        _, mse_a, _ = trainer.train_epoch_fused(s0, data, key, batch_size=8)
        sb, mse_b, n = trainer.train_epoch_scan(s0b, data, key, batch_size=8)
        assert n == 8
        np.testing.assert_allclose(mse_a, mse_b, rtol=1e-5)
        ev = trainer.evaluate_scan(sb, data, batch_size=8)
        assert np.isfinite(ev)


class TestModelParallel:
    def test_point_axis_sharding_compiles_and_matches(self, data):
        """Sharding the N (point) axis over mp must not change results."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(dp=4, mp=2)
        model = PointNet2Regressor(num_features=1)
        batch = next(data.batches(8))
        variables = model.init({"params": jax.random.key(0)}, batch, train=False)

        out_plain = model.apply(variables, batch, train=False)

        sharded = CloudBatch(
            pos=jax.device_put(batch.pos, NamedSharding(mesh, P("dp", "mp", None))),
            feat=jax.device_put(batch.feat, NamedSharding(mesh, P("dp", "mp", None))),
            mask=jax.device_put(batch.mask, NamedSharding(mesh, P("dp", "mp"))),
            y=jax.device_put(batch.y, NamedSharding(mesh, P("dp", None))),
        )
        repl = replicated_sharding(mesh)
        variables_r = jax.tree.map(lambda x: jax.device_put(x, repl), variables)
        out_sharded = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables_r, sharded)
        np.testing.assert_allclose(
            np.asarray(out_plain), np.asarray(out_sharded), rtol=2e-4, atol=2e-4
        )


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 4)

    @pytest.mark.slow  # ~3 min: 20 train steps on the dp x mp virtual mesh
    def test_dryrun_multichip(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out
