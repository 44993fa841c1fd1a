"""Folded/analytic-BN MLP path (models/layers.py MLP._folded) equivalence.

The analytic path derives train-mode BN statistics of ``y = x @ W + b`` from
input moments and folds the normalize into the producing matmul. In real
arithmetic it is the SAME function as the standard Linear->BN->act stack
(reference semantics: torch_geometric MLP, ``pointnet2_regressor.py:46-50``);
these tests pin that equivalence under f64 where rounding vanishes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.models.layers import MLP


def _mk(rng, shape, dtype):
    return jnp.asarray(rng.normal(size=shape), dtype)


def _run_pair(x, mask, train, channels=(5, 8, 8, 6), dropout=0.0, act="ReLU",
              dtype=jnp.float64):
    std = MLP(channels, act=act, dropout=dropout, compute_dtype=dtype, analytic_bn=False)
    ana = MLP(channels, act=act, dropout=dropout, compute_dtype=dtype, analytic_bn=True)
    vs = std.init(jax.random.key(0), x, mask, True)
    outs = {}
    for name, mod in (("std", std), ("ana", ana)):
        out, upd = mod.apply(
            vs, x, mask, train,
            mutable=["batch_stats"] if train else [],
            rngs={"dropout": jax.random.key(7)} if dropout else {},
        ) if train else (mod.apply(vs, x, mask, train), {})
        outs[name] = (out, upd)
    return outs


@pytest.mark.parametrize("train", [True, False])
def test_masked_equivalence_f64(train):
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(0)
        x = _mk(rng, (2, 6, 4, 5), jnp.float64) * 3.0 + 1.0
        mask = jnp.asarray(rng.random((2, 6, 4)) < 0.8)
        # garbage in invalid slots must not leak into stats on either path
        x = jnp.where(mask[..., None], x, 1e6)
        # the analytic path zeroes invalid slots; the standard path carries
        # them through (they are masked downstream) — compare valid slots only
        x_z = x * mask[..., None]
        outs = _run_pair(x_z, mask, train)
        (o_std, u_std), (o_ana, u_ana) = outs["std"], outs["ana"]
        np.testing.assert_allclose(
            np.where(mask[..., None], o_std, 0.0),
            np.where(mask[..., None], o_ana, 0.0), rtol=1e-9, atol=1e-9,
        )
        if train:
            for (ks, vs_), (ka, va) in zip(
                jax.tree_util.tree_leaves_with_path(u_std["batch_stats"]),
                jax.tree_util.tree_leaves_with_path(u_ana["batch_stats"]),
            ):
                np.testing.assert_allclose(vs_, va, rtol=1e-9, atol=1e-12,
                                           err_msg=str(ks))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_unmasked_equivalence_f64():
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(1)
        x = _mk(rng, (16, 5), jnp.float64)
        outs = _run_pair(x, None, True)
        np.testing.assert_allclose(outs["std"][0], outs["ana"][0], rtol=1e-9, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_gradients_match_f64():
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(2)
        x = _mk(rng, (2, 6, 4, 5), jnp.float64)
        mask = jnp.asarray(rng.random((2, 6, 4)) < 0.8)
        x = x * mask[..., None]
        std = MLP((5, 8, 8, 6), compute_dtype=jnp.float64, analytic_bn=False)
        ana = MLP((5, 8, 8, 6), compute_dtype=jnp.float64, analytic_bn=True)
        vs = std.init(jax.random.key(0), x, mask, True)

        def loss(params, mod):
            out, _ = mod.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, mask, True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

        g_std = jax.grad(loss)(vs["params"], std)
        g_ana = jax.grad(loss)(vs["params"], ana)
        for (ks, a), (ka, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_std),
            jax.tree_util.tree_leaves_with_path(g_ana),
        ):
            # grads are cast to the f32 param dtype at the boundary, so two
            # equal-in-f64 pipelines may differ by a few f32 ulps
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=str(ks))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_model_level_production_delta_small():
    """Full regressor, f32: analytic vs standard predictions agree to fp noise."""
    from dl_biomass_tpu.core.cloud import CloudBatch
    from dl_biomass_tpu.models.pointnet2 import PointNet2Regressor

    rng = np.random.default_rng(3)
    b, n = 2, 256
    batch = CloudBatch(
        pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 5, jnp.float32),
        feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
        mask=jnp.asarray(rng.random((b, n)) < 0.9),
        y=jnp.zeros((b, 4), jnp.float32),
    )
    kw = dict(num_features=1, dropout_probability=0.0)
    m_std = PointNet2Regressor(analytic_bn=False, **kw)
    m_ana = PointNet2Regressor(analytic_bn=True, **kw)
    vs = m_std.init({"params": jax.random.key(0), "fps": jax.random.key(1)},
                    batch, train=False)
    o_std = m_std.apply(vs, batch, train=False)
    o_ana = m_ana.apply(vs, batch, train=False)
    np.testing.assert_allclose(o_std, o_ana, rtol=2e-4, atol=2e-4)
