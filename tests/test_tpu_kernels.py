"""On-device TPU kernel assertions (VERDICT round-1 item: compiled Mosaic
behavior is exactly where interpret-mode tests can't see).

Run with:  DL_BIOMASS_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_kernels.py

Every Pallas kernel is compiled on the real chip and asserted against an
accurate oracle computed on the host CPU backend (CPU f32 dots are f32-grade;
the TPU XLA default lowers f32 matmuls to single-pass bf16, so the CPU oracle
— not an on-TPU jnp path — is the correctness standard)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() == "cpu",
        reason="needs the real TPU chip (DL_BIOMASS_TPU_TESTS=1)",
    ),
]

_CPU = jax.devices("cpu")[0] if jax.default_backend() != "cpu" else None


def _sa_case(rng, cd, cp, c1, c2, c3, B=2, M=96, K=64):
    dense = None
    if cd:
        dense = jnp.asarray(rng.normal(size=(B, M, K, cd)), jnp.float32)
    planes = [jnp.asarray(rng.normal(size=(B, M, K)), jnp.float32) for _ in range(cp)]
    nbr_mask = jnp.asarray(rng.random((B, M, K)) > 0.3)
    nbr_mask = nbr_mask.at[0, 5].set(False)
    if dense is not None:
        dense = jnp.where(nbr_mask[..., None], dense, 0.0)
    c0 = cd + cp
    params = {
        "w1": jnp.asarray(rng.normal(size=(c0, c1)) * 0.3, jnp.float32),
        "b1": jnp.asarray(rng.normal(size=(c1,)) * 0.1, jnp.float32),
        "gamma1": jnp.asarray(rng.normal(size=(c1,)) * 0.2 + 1, jnp.float32),
        "beta1": jnp.asarray(rng.normal(size=(c1,)) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(c1, c2)) * 0.3, jnp.float32),
        "b2": jnp.asarray(rng.normal(size=(c2,)) * 0.1, jnp.float32),
        "gamma2": jnp.asarray(rng.normal(size=(c2,)) * 0.2 + 1, jnp.float32),
        "beta2": jnp.asarray(rng.normal(size=(c2,)) * 0.1, jnp.float32),
        "w3": jnp.asarray(rng.normal(size=(c2, c3)) * 0.3, jnp.float32),
        "b3": jnp.asarray(rng.normal(size=(c3,)) * 0.1, jnp.float32),
    }
    return dense, planes, nbr_mask, params


def _sa_oracle(dense, planes, nbr_mask, params, running=None):
    """Accurate f32 oracle on the host CPU backend."""

    def compute(dense, planes, nbr_mask, params):
        parts = ([dense] if dense is not None else []) + [p[..., None] for p in planes]
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        x = jnp.where(nbr_mask[..., None], x, 0.0)
        m = nbr_mask[..., None].astype(jnp.float32)
        cnt = jnp.maximum(nbr_mask.astype(jnp.float32).sum(), 1.0)

        def bn(h, gamma, beta, rm=None, rv=None):
            if rm is None:
                mean = (h * m).sum((0, 1, 2)) / cnt
                var = jnp.maximum((h * h * m).sum((0, 1, 2)) / cnt - mean**2, 0.0)
            else:
                mean, var = rm, rv
            return (h - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta, mean, var

        r = running or (None,) * 4
        h1 = x @ params["w1"] + params["b1"]
        z1, m1, v1 = bn(h1, params["gamma1"], params["beta1"], r[0], r[1])
        h2 = jax.nn.relu(z1) @ params["w2"] + params["b2"]
        z2, m2, v2 = bn(h2, params["gamma2"], params["beta2"], r[2], r[3])
        h3 = jax.nn.relu(z2) @ params["w3"] + params["b3"]
        h3 = jnp.where(nbr_mask[..., None], h3, -jnp.inf)
        out = jnp.where(nbr_mask.any(axis=2)[..., None], jnp.max(h3, axis=2), 0.0)
        return out, (m1, v1, m2, v2)

    with jax.default_device(_CPU):
        return compute(dense, planes, nbr_mask, params)


@pytest.mark.parametrize(
    "dims", [(0, 4, 64, 64, 128), (128, 3, 128, 128, 256)],
    ids=["sa1-planes", "sa2-dense"])
class TestFusedSAOnTPU:
    def test_train_forward_and_stats(self, rng, dims):
        from dl_biomass_tpu.ops.pallas_sa_train import fused_sa_mlp

        dense, planes, nbr_mask, params = _sa_case(rng, *dims)
        out_f, stats_f = fused_sa_mlp(dense, planes, nbr_mask, params,
                                      act="ReLU", interpret=False)
        out_o, stats_o = _sa_oracle(dense, planes, nbr_mask, params)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_o), atol=1e-3)
        for a, b in zip(stats_f, stats_o):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_gradients(self, rng, dims):
        """VJP vs an oracle that uses the KERNEL's own argmax selection.

        The max-pool subgradient is selection-dependent: the kernel's h3
        (bf16x3, ~1e-4) and an f32 oracle's h3 occasionally crown different —
        equally valid — argmax edges, which scatters the cotangent down a
        different path with O(1) elementwise effect (torch's scatter_max has
        the same property). So the oracle reconstructs the kernel's selection
        from its forward output (nearest h3 along K) and pulls the cotangent
        back through that fixed selection; everything else must then match
        tightly."""
        from dl_biomass_tpu.ops.pallas_sa_train import fused_sa_mlp

        dense, planes, nbr_mask, params = _sa_case(rng, *dims)
        b, m = nbr_mask.shape[:2]
        r = jnp.asarray(rng.normal(size=(b, m, dims[4])), jnp.float32)

        def loss_f(d, p):
            o, _ = fused_sa_mlp(d, planes, nbr_mask, p, act="ReLU", interpret=False)
            return jnp.sum(o * r)

        if dims[0]:
            gd_f, gp_f = jax.grad(loss_f, argnums=(0, 1))(dense, params)
        else:
            gd_f = None
            gp_f = jax.grad(lambda p: loss_f(None, p))(params)
        _, _, am_f = fused_sa_mlp(dense, planes, nbr_mask, params,
                                  act="ReLU", interpret=False, return_argmax=True)

        def h3_of(d, p):
            parts = ([d] if d is not None else []) + [pp[..., None] for pp in planes_c]
            x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
            x = jnp.where(nm_c[..., None], x, 0.0)
            mm = nm_c[..., None].astype(jnp.float32)
            cnt = jnp.maximum(nm_c.astype(jnp.float32).sum(), 1.0)

            def bn(h, gamma, beta):
                mean = (h * mm).sum((0, 1, 2)) / cnt
                var = jnp.maximum((h * h * mm).sum((0, 1, 2)) / cnt - mean**2, 0.0)
                return (h - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta

            h = jax.nn.relu(bn(x @ p["w1"] + p["b1"], p["gamma1"], p["beta1"]))
            h = jax.nn.relu(bn(h @ p["w2"] + p["b2"], p["gamma2"], p["beta2"]))
            return h @ p["w3"] + p["b3"]  # (B, M, K, C3) pre-max

        with jax.default_device(_CPU):
            planes_c = [jax.device_put(p, _CPU) for p in planes]
            nm_c = jax.device_put(nbr_mask, _CPU)
            d_c = jax.device_put(dense, _CPU) if dims[0] else None
            p_c = jax.device_put(params, _CPU)
            if dims[0]:
                h3_o, vjp = jax.vjp(h3_of, d_c, p_c)
            else:
                h3_o, vjp = jax.vjp(lambda p: h3_of(None, p), p_c)
            # pull the cotangent back through the KERNEL's exact selection
            am = jax.device_put(jnp.asarray(am_f), _CPU)  # (B, M, C3), -1=none
            kidx = jnp.arange(h3_o.shape[2])[None, None, :, None]
            gs = jnp.where(kidx == am[:, :, None, :],
                           jax.device_put(r, _CPU)[:, :, None, :], 0.0)
            grads_o = vjp(gs)
        # Residual deviations are argmax flips the value-matching could not
        # disambiguate (top-2 gap below the kernel's ~1e-4 forward noise), so:
        # gross bound everywhere + tight bound on the bulk. Exact VJP
        # *semantics* are pinned separately by the f64 interpret-mode test
        # (test_pallas_sa_train.py::test_f64_exactness).
        # One residual noise class survives exact-selection matching: ReLU
        # gate flips — edges whose pre-activation sits within the kernel's
        # ~1e-4 forward noise of zero flip their act-derivative, a sparse
        # full-magnitude per-edge effect. Per-edge tensors therefore get an
        # rms bound; parameter gradients (sums over all edges) stay tight.
        def assert_grad(a, b, name, per_edge=False):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            d = np.abs(a - b) / max(np.abs(b).max(), 1.0)
            if per_edge:
                rms = float(np.sqrt((d**2).mean()))
                assert rms < 3e-4, f"{name}: rms scaled dev {rms:.2e}"
                assert d.max() < 5e-2, f"{name}: max scaled dev {d.max():.2e}"
            else:
                # gate flips also reach parameter sums as sparse rank-1
                # perturbations (one flipped edge moves a |a|*|dh| ~ O(1)
                # contribution), so the elementwise bound is the flip scale
                # and the rms bound is the systematic-error discriminator
                rms = float(np.sqrt((d**2).mean()))
                assert rms < 1e-3, f"{name}: rms scaled dev {rms:.2e}"
                assert d.max() < 2e-2, f"{name}: max scaled dev {d.max():.2e}"

        if dims[0]:
            gd_o, gp_o = grads_o
            assert_grad(gd_f, gd_o, "d(dense)", per_edge=True)
        else:
            (gp_o,) = grads_o
        for k in params:
            assert_grad(gp_f[k], gp_o[k], k)

    def test_eval_running_stats(self, rng, dims):
        from dl_biomass_tpu.ops.pallas_sa_train import fused_sa_mlp

        dense, planes, nbr_mask, params = _sa_case(rng, *dims)
        c1, c2 = dims[2], dims[3]
        running = tuple(jnp.asarray(rng.random(c) + 0.5, jnp.float32)
                        for c in (c1, c1, c2, c2))
        out_f = fused_sa_mlp(dense, planes, nbr_mask, params, running,
                             act="ReLU", train=False, interpret=False)
        out_o, _ = _sa_oracle(dense, planes, nbr_mask, params, running=running)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_o), atol=1e-3)


class TestGatherOnTPU:
    def test_mxu_gather_f32_near_exact(self, rng):
        from dl_biomass_tpu.ops.pallas_mxu_gather import mxu_gather

        b, n, c, m = 2, 512, 128, 64
        vals = jnp.asarray(rng.normal(size=(b, n, c)) * 10, jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, size=(b, m, 64)), jnp.int32)
        out = mxu_gather(vals, idx, interpret=False)
        want = np.take_along_axis(
            np.asarray(vals)[:, None], np.asarray(idx)[..., None], axis=2
        ).reshape(b, m, 64, c)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-5)

    def test_mxu_gather_bf16_exact(self, rng):
        from dl_biomass_tpu.ops.pallas_mxu_gather import mxu_gather

        b, n, c, m = 2, 512, 128, 64
        vals = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, n, size=(b, m, 64)), jnp.int32)
        out = mxu_gather(vals, idx, interpret=False)
        want = np.take_along_axis(
            np.asarray(vals, np.float32)[:, None], np.asarray(idx)[..., None], axis=2
        ).reshape(b, m, 64, c)
        np.testing.assert_array_equal(np.asarray(out, np.float32), want)

    def test_mxu_gather_grad_scatter_add(self, rng):
        from dl_biomass_tpu.ops.pallas_mxu_gather import mxu_gather

        b, n, c, m = 2, 512, 128, 64
        vals = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, size=(b, m, 64)), jnp.int32)
        r = jnp.asarray(rng.normal(size=(b, m, 64, c)), jnp.float32)
        g = jax.grad(lambda v: jnp.sum(mxu_gather(v, idx, interpret=False) * r))(vals)
        want = np.zeros((b, n, c), np.float32)
        for bi in range(b):
            np.add.at(want, (bi, np.asarray(idx)[bi].ravel()),
                      np.asarray(r)[bi].reshape(-1, c))
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-4)


class TestSelectionKernelsOnTPU:
    def test_fps_matches_jnp(self, rng):
        from dl_biomass_tpu.ops import farthest_point_sample

        b, n, k = 2, 512, 128
        pos = jnp.asarray(rng.normal(size=(b, n, 3)) * 5, jnp.float32)
        mask = jnp.asarray(rng.random((b, n)) > 0.1)
        got = farthest_point_sample(pos, mask, k, start_idx=0, use_pallas=True)
        with jax.default_device(_CPU):
            want = farthest_point_sample(
                jax.device_put(pos, _CPU), jax.device_put(mask, _CPU), k,
                start_idx=0, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_exact_ball_query_matches_first_k(self, rng):
        from dl_biomass_tpu.ops import ball_query
        from dl_biomass_tpu.ops.pallas_ballquery import ball_query_pallas

        b, n, m = 2, 512, 64
        pos = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
        mask = jnp.asarray(rng.random((b, n)) > 0.1)
        centers = pos[:, :m]
        cmask = mask[:, :m]
        gi, gm = ball_query_pallas(centers, cmask, pos, mask, radius=0.7,
                                   interpret=False)
        with jax.default_device(_CPU):
            wi, wm = ball_query(
                jax.device_put(centers, _CPU), jax.device_put(cmask, _CPU),
                jax.device_put(pos, _CPU), jax.device_put(mask, _CPU),
                radius=0.7, method="exact")
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(wm))
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))

    def test_ball_group_compiled_matches_interpret(self, rng):
        from dl_biomass_tpu.ops.pallas_group import ball_group_pallas

        b, n, m = 2, 512, 64
        pos = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
        mask = jnp.asarray(rng.random((b, n)) > 0.1)
        feat = jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32)
        centers = pos[:, :m]
        cmask = mask[:, :m]
        got = ball_group_pallas(centers, cmask, pos, mask, feat, radius=0.7,
                                interpret=False)
        want = ball_group_pallas(centers, cmask, pos, mask, feat, radius=0.7,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got[3]), np.asarray(want[3]),
                                   rtol=1e-6, atol=1e-6)

    def test_sa1_fused_eval_compiled_matches_interpret(self, rng):
        """The fused eval SA1 kernel (ops/pallas_sa_eval.py) compiled on the
        chip vs interpret mode — selection identical, MLP to f32 tolerance."""
        from dl_biomass_tpu.ops.pallas_sa_eval import sa1_fused_eval

        b, n, m = 2, 512, 64
        pos = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
        mask = jnp.asarray(rng.random((b, n)) > 0.1)
        feat = jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32)
        centers, cmask = pos[:, :m], mask[:, :m]
        mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
        ws = [mk(4, 64), mk(64), mk(64, 64), mk(64), mk(64, 128), mk(128)]
        got = sa1_fused_eval(centers, cmask, pos, mask, feat, ws, radius=0.7,
                             interpret=False)
        want = sa1_fused_eval(centers, cmask, pos, mask, feat, ws, radius=0.7,
                              interpret=True)
        # compiled TPU f32 dots lower to bf16 passes; bound the deviation
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)
