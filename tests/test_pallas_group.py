"""Fused stratified ball-query+gather kernel: oracle parity (interpret mode)
and model integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.ops.pallas_group import ball_group_pallas


def oracle(centers, cmask, pos, mask, r):
    """slot j = smallest in-radius index with index % 128 in {j, j+64}."""
    m, n = len(centers), len(pos)
    idx = np.zeros((m, 64), np.int32)
    ok = np.zeros((m, 64), bool)
    for i in range(m):
        if not cmask[i]:
            continue
        d2 = ((pos - centers[i]) ** 2).sum(1)
        inball = (d2 <= r * r) & mask
        for j in range(64):
            cand = [p for p in range(n) if inball[p] and (p % 128) in (j, j + 64)]
            if cand:
                idx[i, j] = min(cand)
                ok[i, j] = True
    return idx, ok


class TestBallGroupPallas:
    def test_selection_matches_oracle(self, rng):
        b, n, m = 2, 384, 24
        pos = rng.normal(size=(b, n, 3)).astype(np.float32) * 4
        mask = np.arange(n)[None] < np.asarray([384, 300])[:, None]
        centers = pos[:, :m]
        cmask = np.arange(m)[None] < np.asarray([24, 20])[:, None]
        feat = rng.normal(size=(b, n, 1)).astype(np.float32)
        idx, nm, rel, gf = ball_group_pallas(
            jnp.asarray(centers), jnp.asarray(cmask), jnp.asarray(pos),
            jnp.asarray(mask), jnp.asarray(feat), radius=3.0, interpret=True,
        )
        idx, nm, rel, gf = map(np.asarray, (idx, nm, rel, gf))
        for i in range(b):
            wi, wok = oracle(centers[i], cmask[i], pos[i], mask[i], 3.0)
            np.testing.assert_array_equal(nm[i], wok)
            np.testing.assert_array_equal(idx[i][wok], wi[wok])
        # captured values == gathered values
        want_rel = pos[np.arange(b)[:, None, None], idx] - centers[:, :, None, :]
        want_rel[~nm] = 0
        np.testing.assert_allclose(rel, want_rel, atol=1e-5)
        want_f = feat[np.arange(b)[:, None, None], idx][..., 0]
        want_f[~nm] = 0
        np.testing.assert_allclose(gf[..., 0], want_f, atol=1e-6)

    def test_need_idx_false_matches(self, rng):
        """need_idx=False (validity-plane store) returns identical mask/planes
        with idx=None — the production model/engine path."""
        b, m, n = 2, 64, 256
        pos = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
        mask = jnp.asarray(rng.random((b, n)) > 0.1)
        centers, cmask = pos[:, :m], mask[:, :m]
        feat = jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32)
        for dt in (jnp.float32, jnp.bfloat16):
            ref = ball_group_pallas(centers, cmask, pos, mask, feat,
                                    radius=0.9, interpret=True, compute_dtype=dt)
            got = ball_group_pallas(centers, cmask, pos, mask, feat, radius=0.9,
                                    interpret=True, compute_dtype=dt,
                                    need_idx=False)
            assert got[0] is None
            for a, b_ in zip(ref[1:], got[1:]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_no_feature_planes(self, rng):
        pos = jnp.asarray(rng.normal(size=(1, 256, 3)), jnp.float32)
        mask = jnp.ones((1, 256), bool)
        idx, nm, rel, gf = ball_group_pallas(
            pos[:, :8], mask[:, :8], pos, mask, None, radius=2.0, interpret=True
        )
        assert gf.shape == (1, 8, 64, 0)
        assert rel.shape == (1, 8, 64, 3)

    def test_every_neighbor_in_radius(self, rng):
        pos = jnp.asarray(rng.normal(size=(1, 512, 3)) * 5, jnp.float32)
        mask = jnp.ones((1, 512), bool)
        centers = pos[:, :16]
        idx, nm, rel, _ = ball_group_pallas(
            centers, mask[:, :16], pos, mask, None, radius=2.0, interpret=True
        )
        d = np.linalg.norm(np.asarray(rel)[np.asarray(nm)], axis=-1)
        assert (d <= 2.0 + 1e-5).all()

    def test_model_integration_fast_group(self, rng):
        """fast_group SA1 trains (grads flow to params, kernel stop-gradient'ed)."""
        from dl_biomass_tpu.core.cloud import CloudBatch
        from dl_biomass_tpu.models import PointNet2Regressor
        from dl_biomass_tpu.train.loss import weighted_component_mse

        b, n = 2, 256
        batch = CloudBatch(
            pos=jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32),
            feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
            mask=jnp.ones((b, n), bool),
            y=jnp.asarray(rng.normal(size=(b, 4)), jnp.float32),
        )
        model = PointNet2Regressor(num_features=1, use_pallas=True, fast_group=True)
        variables = model.init({"params": jax.random.key(0)}, batch, train=False)

        def loss(p):
            out = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                batch, train=False,
            )
            return weighted_component_mse(out, batch.y)

        g = jax.grad(loss)(variables["params"])
        gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
        assert np.isfinite(gn) and gn > 0

    def test_fast_vs_exact_statistically_close(self, rng):
        """Predictions with stratified vs exact grouping agree closely (same
        params; both are ~uniform ball subsets feeding a max-pool)."""
        from dl_biomass_tpu.core.cloud import CloudBatch
        from dl_biomass_tpu.models import PointNet2Regressor

        b, n = 2, 512
        batch = CloudBatch(
            pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 3, jnp.float32),
            feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
            mask=jnp.ones((b, n), bool),
            y=None,
        )
        fast = PointNet2Regressor(num_features=1, use_pallas=True, fast_group=True)
        exact = PointNet2Regressor(num_features=1, use_pallas=True, fast_group=False)
        # (identical param structure: fast_group changes only the grouping op)
        variables = exact.init({"params": jax.random.key(0)}, batch, train=False)
        o_fast = np.asarray(fast.apply(variables, batch, train=False))
        o_exact = np.asarray(exact.apply(variables, batch, train=False))
        # same order of magnitude, high agreement (not bitwise)
        denom = np.abs(o_exact).mean() + 1e-6
        assert np.abs(o_fast - o_exact).mean() / denom < 0.35


class TestStratifiedCaptureStatistics:
    def test_capture_rate_matches_documented_claims(self, rng):
        """Quantify the documented selection-rule properties: for balls >= 64
        points the kernel fills ~64 slots; for m < 64 expected capture is
        ~m*(1 - m/256) (same-residue-pair shadowing)."""
        import jax.numpy as jnp

        n = 1024
        pos = np.zeros((1, n, 3), np.float32)
        mask = np.ones((1, n), bool)
        # place m in-ball points at random indices; the rest far away
        # thresholds leave headroom for slot-collision variance at n=1024
        # (64 residue-pair slots of 16 indices each)
        for m, min_frac in ((200, 0.85), (40, 0.70), (10, 0.80)):
            coords = rng.normal(size=(n, 3)).astype(np.float32) * 100 + 50
            inball = rng.choice(n, m, replace=False)
            coords[inball] = rng.normal(size=(m, 3)).astype(np.float32) * 0.3
            pos[0] = coords
            center = np.zeros((1, 1, 3), np.float32)
            _, nm, _, _ = ball_group_pallas(
                jnp.asarray(center), jnp.ones((1, 1), bool),
                jnp.asarray(pos), jnp.asarray(mask), None,
                radius=2.0, interpret=True,
            )
            captured = int(np.asarray(nm).sum())
            expected = min(m, 64)
            assert captured >= min_frac * expected * (1 - m / 256 if m < 64 else 1), (
                m, captured)
            assert captured <= expected
