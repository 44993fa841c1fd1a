"""Fused train-mode SA MLP kernels (ops/pallas_sa_train.py): oracle parity in
interpret mode — forward, batch statistics, custom-VJP gradients, eval path —
plus flax integration (FusedSAMLP) parameter-tree compatibility with MLP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.models.layers import MLP, FusedSAMLP
from dl_biomass_tpu.ops.pallas_sa_train import fused_sa_mlp
from dl_biomass_tpu.ops.pooling import masked_max

EPS = 1e-5


def _make_case(rng, B=2, M=12, K=64, C0=4, C1=8, C2=8, C3=16, dtype=np.float32):
    grouped = rng.normal(size=(B, M, K, C0)).astype(dtype)
    nbr_mask = rng.random((B, M, K)) > 0.25
    nbr_mask[0, 3] = False  # one fully-invalid centroid
    grouped = np.where(nbr_mask[..., None], grouped, 0.0).astype(dtype)
    params = {
        "w1": (rng.normal(size=(C0, C1)) * 0.5).astype(dtype),
        "b1": (rng.normal(size=(C1,)) * 0.1).astype(dtype),
        "gamma1": (rng.normal(size=(C1,)) * 0.2 + 1).astype(dtype),
        "beta1": (rng.normal(size=(C1,)) * 0.1).astype(dtype),
        "w2": (rng.normal(size=(C1, C2)) * 0.5).astype(dtype),
        "b2": (rng.normal(size=(C2,)) * 0.1).astype(dtype),
        "gamma2": (rng.normal(size=(C2,)) * 0.2 + 1).astype(dtype),
        "beta2": (rng.normal(size=(C2,)) * 0.1).astype(dtype),
        "w3": (rng.normal(size=(C2, C3)) * 0.5).astype(dtype),
        "b3": (rng.normal(size=(C3,)) * 0.1).astype(dtype),
    }
    return jnp.asarray(grouped), jnp.asarray(nbr_mask), {k: jnp.asarray(v) for k, v in params.items()}


def _oracle(grouped, nbr_mask, params, act=jax.nn.relu):
    """Plain-jnp MLP->BN->act stack + masked max, sum/sumsq statistics."""
    m = nbr_mask[..., None].astype(grouped.dtype)
    cnt = jnp.maximum(nbr_mask.astype(grouped.dtype).sum(), 1.0)
    x = jnp.where(nbr_mask[..., None], grouped, 0.0)

    def bn(h, gamma, beta):
        mean = (h * m).sum((0, 1, 2)) / cnt
        var = jnp.maximum((h * h * m).sum((0, 1, 2)) / cnt - mean**2, 0.0)
        return (h - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta, mean, var

    h1 = x @ params["w1"] + params["b1"]
    z1, mean1, var1 = bn(h1, params["gamma1"], params["beta1"])
    h2 = act(z1) @ params["w2"] + params["b2"]
    z2, mean2, var2 = bn(h2, params["gamma2"], params["beta2"])
    h3 = act(z2) @ params["w3"] + params["b3"]
    h3 = jnp.where(nbr_mask[..., None], h3, -jnp.inf)
    out = jnp.where(nbr_mask.any(axis=2)[..., None], jnp.max(h3, axis=2), 0.0)
    return out, (mean1, var1, mean2, var2)


class TestFusedSAKernel:
    def test_forward_matches_oracle(self, rng):
        grouped, nbr_mask, params = _make_case(rng)
        out_o, stats_o = _oracle(grouped, nbr_mask, params)
        out_f, stats_f = fused_sa_mlp(grouped, [], nbr_mask, params, act="ReLU", interpret=True)
        np.testing.assert_allclose(out_f, out_o, atol=2e-5)
        for a, b in zip(stats_f, stats_o):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_gradients_match_oracle(self, rng):
        grouped, nbr_mask, params = _make_case(rng)
        r = jnp.asarray(rng.normal(size=(2, 12, 16)), jnp.float32)

        def loss_f(g, p):
            out, _ = fused_sa_mlp(g, [], nbr_mask, p, act="ReLU", interpret=True)
            return jnp.sum(out * r)

        def loss_o(g, p):
            out, _ = _oracle(g, nbr_mask, p)
            return jnp.sum(out * r)

        gg_f, gp_f = jax.grad(loss_f, argnums=(0, 1))(grouped, params)
        gg_o, gp_o = jax.grad(loss_o, argnums=(0, 1))(grouped, params)
        np.testing.assert_allclose(gg_f, gg_o, atol=1e-4)
        for k in params:
            scale = max(float(jnp.abs(gp_o[k]).max()), 1.0)
            np.testing.assert_allclose(gp_f[k] / scale, gp_o[k] / scale, atol=3e-5, err_msg=k)

    @pytest.mark.parametrize("act", ["LeakyReLU", "ELU", None])
    def test_other_activations(self, rng, act):
        from dl_biomass_tpu.models.layers import resolve_activation

        grouped, nbr_mask, params = _make_case(rng)
        fn = resolve_activation(act) or (lambda z: z)
        out_o, _ = _oracle(grouped, nbr_mask, params, act=fn)
        out_f, _ = fused_sa_mlp(grouped, [], nbr_mask, params, act=act, interpret=True)
        np.testing.assert_allclose(out_f, out_o, atol=3e-5)

    def test_eval_path_uses_given_stats(self, rng):
        grouped, nbr_mask, params = _make_case(rng)
        running = tuple(jnp.asarray(rng.random(8) + 0.5, jnp.float32) for _ in range(4))
        out_e = fused_sa_mlp(grouped, [], nbr_mask, params, running, act="ReLU",
                             train=False, interpret=True)
        mean1, var1, mean2, var2 = running

        x = jnp.where(nbr_mask[..., None], grouped, 0.0)
        a1 = jax.nn.relu((x @ params["w1"] + params["b1"] - mean1)
                         * jax.lax.rsqrt(var1 + EPS) * params["gamma1"] + params["beta1"])
        a2 = jax.nn.relu((a1 @ params["w2"] + params["b2"] - mean2)
                         * jax.lax.rsqrt(var2 + EPS) * params["gamma2"] + params["beta2"])
        h3 = jnp.where(nbr_mask[..., None], a2 @ params["w3"] + params["b3"], -jnp.inf)
        out_o = jnp.where(nbr_mask.any(2)[..., None], jnp.max(h3, axis=2), 0.0)
        np.testing.assert_allclose(out_e, out_o, atol=2e-5)

    def test_f64_exactness(self, rng):
        """Under x64 the fused op and the oracle agree to machine precision —
        the semantics are identical, not merely statistically close."""
        jax.config.update("jax_enable_x64", True)
        try:
            grouped, nbr_mask, params = _make_case(rng, dtype=np.float64)
            out_o, stats_o = _oracle(grouped, nbr_mask, params)
            out_f, stats_f = fused_sa_mlp(grouped, [], nbr_mask, params, act="ReLU", interpret=True)
            np.testing.assert_allclose(out_f, out_o, atol=1e-12)
            for a, b in zip(stats_f, stats_o):
                np.testing.assert_allclose(a, b, atol=1e-12)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_bf16_compute(self, rng):
        grouped, nbr_mask, params = _make_case(rng)
        out_o, _ = _oracle(grouped, nbr_mask, params)
        out_f, _ = fused_sa_mlp(grouped.astype(jnp.bfloat16), [], nbr_mask, params,
                                act="ReLU", bf16=True, interpret=True)
        np.testing.assert_allclose(out_f, out_o, atol=0.15)  # bf16 matmul noise


class TestFusedSAKernelPlanes:
    def test_planes_equal_dense(self, rng):
        """Splitting channels into dense + planes changes the layout only."""
        grouped, nbr_mask, params = _make_case(rng)
        out_d, stats_d = fused_sa_mlp(grouped, [], nbr_mask, params, act="ReLU", interpret=True)
        dense = grouped[..., :2]
        planes = [grouped[..., 2], grouped[..., 3]]
        out_p, stats_p = fused_sa_mlp(dense, planes, nbr_mask, params, act="ReLU", interpret=True)
        np.testing.assert_allclose(out_p, out_d, atol=2e-5)
        for a, b in zip(stats_p, stats_d):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_planes_only(self, rng):
        grouped, nbr_mask, params = _make_case(rng)
        out_d, _ = fused_sa_mlp(grouped, [], nbr_mask, params, act="ReLU", interpret=True)
        planes = [grouped[..., c] for c in range(4)]
        out_p, _ = fused_sa_mlp(None, planes, nbr_mask, params, act="ReLU", interpret=True)
        np.testing.assert_allclose(out_p, out_d, atol=2e-5)

    def test_dense_gradient_flows_planes_do_not(self, rng):
        grouped, nbr_mask, params = _make_case(rng)
        dense = grouped[..., :2]
        planes = [grouped[..., 2], grouped[..., 3]]

        def loss(d, ps):
            out, _ = fused_sa_mlp(d, ps, nbr_mask, params, act="ReLU", interpret=True)
            return jnp.sum(out ** 2)

        gd, gp = jax.grad(loss, argnums=(0, 1))(dense, planes)
        assert float(jnp.abs(gd).max()) > 0  # dense cotangent is real
        assert all(float(jnp.abs(g).max()) == 0 for g in gp)  # data-only

        def loss_o(g):
            out, _ = _oracle(g, nbr_mask, params)
            return jnp.sum(out ** 2)

        gg = jax.grad(loss_o)(grouped)
        np.testing.assert_allclose(gd, gg[..., :2], atol=1e-4)


class TestFusedSAMLPModule:
    def test_param_tree_matches_mlp(self, rng):
        chans = [4, 8, 8, 16]
        grouped, nbr_mask, _ = _make_case(rng)
        vf = FusedSAMLP(chans).init(jax.random.key(0), grouped, [], nbr_mask, True)
        vu = MLP(chans).init(jax.random.key(0), grouped, nbr_mask, True)
        sf = jax.tree.map(lambda a: (a.shape, str(a.dtype)), vf)
        su = jax.tree.map(lambda a: (a.shape, str(a.dtype)), vu)
        assert sf == su  # checkpoints interchange between fused/unfused paths

    def test_module_matches_unfused(self, rng):
        chans = [4, 8, 8, 16]
        grouped, nbr_mask, _ = _make_case(rng)
        mf = FusedSAMLP(chans)
        mu = MLP(chans)
        v = mf.init(jax.random.key(0), grouped, [], nbr_mask, True)
        of, uf = mf.apply(v, grouped, [], nbr_mask, True, mutable=["batch_stats"])
        hu, uu = mu.apply(v, grouped, nbr_mask, True, mutable=["batch_stats"])
        ou = masked_max(hu, nbr_mask, axis=2)
        np.testing.assert_allclose(of, ou, atol=2e-4)
        for a, b in zip(jax.tree.leaves(uf), jax.tree.leaves(uu)):
            np.testing.assert_allclose(a, b, atol=1e-4)
        # eval identical
        oef = mf.apply(v, grouped, [], nbr_mask, False)
        oeu = masked_max(mu.apply(v, grouped, nbr_mask, False), nbr_mask, axis=2)
        np.testing.assert_allclose(oef, oeu, atol=2e-5)

    def test_model_level_fused_flag(self, rng):
        """PointNet2Regressor(fused_sa=True) runs and matches the unfused model
        at eval with shared params."""
        from dl_biomass_tpu.core.cloud import CloudBatch
        from dl_biomass_tpu.models.pointnet2 import PointNet2Regressor

        B, N = 2, 128
        cloud = CloudBatch(
            pos=jnp.asarray(rng.normal(size=(B, N, 3)) * 3, jnp.float32),
            feat=jnp.asarray(rng.normal(size=(B, N, 1)), jnp.float32),
            mask=jnp.ones((B, N), bool),
            y=jnp.zeros((B, 4)),
        )
        mf = PointNet2Regressor(num_features=1, fused_sa=True, use_pallas=True, fast_group=False)
        mu = PointNet2Regressor(num_features=1, fused_sa=False, use_pallas=False)
        v = mf.init({"params": jax.random.key(0)}, cloud, train=False)
        o1 = mf.apply(v, cloud, train=False)
        o2 = mu.apply(v, cloud, train=False)
        np.testing.assert_allclose(o1, o2, atol=2e-3)
        # train step produces finite outputs + updated stats
        o1t, u1 = mf.apply(v, cloud, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.key(1)})
        assert np.isfinite(np.asarray(o1t)).all()
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(u1))
