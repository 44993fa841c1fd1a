"""Fused inference engine: parity with model.apply, folding correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.core.cloud import CloudBatch
from dl_biomass_tpu.models import PointNet2Regressor
from dl_biomass_tpu.models.inference import _folded_mlp, compile_inference, fold_bn


@pytest.fixture
def setup(rng):
    b, n = 2, 384
    batch = CloudBatch(
        pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 3, jnp.float32),
        feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
        mask=jnp.asarray(np.arange(n)[None] < np.asarray([384, 300])[:, None]),
        y=None,
    )
    model = PointNet2Regressor(num_features=1, use_pallas=True, fast_group=True)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    return model, variables, batch


class TestFoldBN:
    def test_affine_equivalence(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 2, 16), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
        mean = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
        var = jnp.asarray(rng.uniform(0.5, 2, 16), jnp.float32)
        x = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
        want = ((x @ w + b) - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        wf, bf = fold_bn(w, b, scale, bias, mean, var)
        np.testing.assert_allclose(np.asarray(x @ wf + bf), np.asarray(want), rtol=2e-5, atol=1e-5)


class TestInferenceEngine:
    def test_matches_model_apply(self, setup):
        model, variables, batch = setup
        want = np.asarray(model.apply(variables, batch, train=False))
        infer = compile_inference(model, variables)
        got = np.asarray(infer(batch))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 1e-4, rel

    def test_fused_eval_matches_model_apply(self, setup):
        """fused_eval=True routes SA1 through the single fused kernel
        (ops/pallas_sa_eval.py, interpret mode here) — same predictions."""
        model, variables, batch = setup
        want = np.asarray(model.apply(variables, batch, train=False))
        infer = compile_inference(model, variables, fused_eval=True)
        got = np.asarray(infer(batch))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 1e-4, rel

    def test_rejects_unsupported_variants(self, setup):
        _, variables, _ = setup
        with pytest.raises(NotImplementedError):
            compile_inference(PointNet2Regressor(num_features=1, msg=True), variables)
        with pytest.raises(NotImplementedError):
            compile_inference(
                PointNet2Regressor(num_features=1, activation_function="ELU"), variables
            )

    def test_fused_eval_requires_production_path(self, setup):
        """fused_eval=True must refuse configs that would silently fall back
        to the non-fused branch (bogus fused-vs-folded comparisons)."""
        _, variables, _ = setup
        bad = PointNet2Regressor(num_features=1, use_pallas=False)
        with pytest.raises(NotImplementedError, match="fused_eval"):
            compile_inference(bad, variables, fused_eval=True)

    def test_missing_batch_stats_clear_error(self, setup):
        model, variables, _ = setup
        with pytest.raises(ValueError, match="batch_stats"):
            compile_inference(model, {"params": variables["params"]})

    def test_folded_layer_count(self, setup):
        _, variables, _ = setup
        layers = _folded_mlp(variables["params"]["head"], variables["batch_stats"]["head"])
        assert len(layers) == 3  # 1024->128->128->4
        assert layers[-1][0].shape == (128, 4)

    def test_dataset_inference_matches_per_batch(self, rng):
        """compile_dataset_inference (whole dataset in ONE scanned dispatch)
        must reproduce the per-batch engine, including the padded partial
        final batch (10 plots, batch 4) and per-plot mask variation."""
        from dl_biomass_tpu.io.device_data import DeviceDataset
        from dl_biomass_tpu.models.inference import compile_dataset_inference

        p, n = 10, 256
        pos_list = [np.asarray(rng.normal(size=(n - 7 * i, 3)) * 3, np.float32)
                    for i in range(p)]
        feat_list = [np.asarray(rng.normal(size=(len(q), 1)), np.float32)
                     for q in pos_list]
        y = np.zeros((p, 4), np.float32)
        ds = DeviceDataset.from_clouds(pos_list, feat_list, y,
                                       [f"BC_{i}" for i in range(p)],
                                       base_n=n, for_augmentation=False)
        model = PointNet2Regressor(num_features=1, use_pallas=False)
        variables = model.init(
            {"params": jax.random.key(0)}, next(iter(ds.batches(4))), train=False
        )
        infer = compile_inference(model, variables)
        want = np.concatenate([
            np.asarray(infer(b))[np.asarray(jnp.any(b.mask, axis=1))]
            for b in ds.batches(4)
        ])
        got = compile_dataset_inference(model, variables)(ds, 4)
        assert got.shape == (p, 4)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_mesh_dataset_serving_matches_single_device(self, rng):
        """compile_dataset_inference(mesh=...) — the scanned bulk path under
        dp sharding must reproduce the unsharded scan."""
        from dl_biomass_tpu.io.device_data import DeviceDataset
        from dl_biomass_tpu.models.inference import compile_dataset_inference
        from dl_biomass_tpu.parallel.mesh import make_mesh

        p, n = 16, 256
        ds = DeviceDataset(
            rng.normal(size=(p, n, 3)).astype(np.float32) * 3,
            rng.normal(size=(p, n, 1)).astype(np.float32),
            np.ones((p, n), bool), np.zeros((p, 4), np.float32),
            [f"BC_{i}" for i in range(p)], n,
        )
        model = PointNet2Regressor(num_features=1, use_pallas=False)
        variables = model.init(
            {"params": jax.random.key(0)}, next(iter(ds.batches(8))), train=False
        )
        want = compile_dataset_inference(model, variables)(ds, 8)
        mesh = make_mesh(dp=-1, mp=1)
        got = compile_dataset_inference(model, variables, mesh=mesh)(ds, 8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_mesh_serving_matches_single_device(self, rng):
        """compile_inference(mesh=...) — data-parallel serving over the
        8-device virtual mesh must reproduce the unsharded engine (weights
        replicated, cloud axis dp-sharded; XLA SPMD inserts the collectives)."""
        from dl_biomass_tpu.parallel.mesh import make_mesh

        b, n = 8, 256
        batch = CloudBatch(
            pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 3, jnp.float32),
            feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
            mask=jnp.asarray(np.arange(n)[None] < rng.integers(200, n + 1, size=(b, 1))),
            y=None,
        )
        model = PointNet2Regressor(num_features=1, use_pallas=False)
        variables = model.init({"params": jax.random.key(0)}, batch, train=False)
        want = np.asarray(compile_inference(model, variables)(batch))
        mesh = make_mesh(dp=-1, mp=1)
        got = np.asarray(compile_inference(model, variables, mesh=mesh)(batch))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
