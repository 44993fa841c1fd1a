"""Kernel parity tests: jnp ops vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.ops import (
    ball_query,
    farthest_point_sample,
    gather_points,
    group_neighborhoods,
    masked_max,
)
from dl_biomass_tpu.ops.reference import ball_query_numpy, fps_numpy, masked_max_numpy


def make_clouds(rng, b=3, n=200, f=2, n_valid=None):
    pos = rng.normal(size=(b, n, 3)).astype(np.float32) * 5
    feat = rng.normal(size=(b, n, f)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    for i in range(b):
        nv = n if n_valid is None else n_valid[i]
        mask[i, :nv] = True
    return pos, feat, mask


class TestFPS:
    def test_matches_numpy_oracle(self, rng):
        pos, _, mask = make_clouds(rng, b=4, n=120, n_valid=[120, 100, 90, 111])
        k = 24
        got = np.asarray(farthest_point_sample(jnp.asarray(pos), jnp.asarray(mask), k, start_idx=0))
        for i in range(4):
            want = fps_numpy(pos[i], mask[i], k, start=0)
            np.testing.assert_array_equal(got[i], want)

    def test_never_selects_padding(self, rng):
        pos, _, mask = make_clouds(rng, b=2, n=64, n_valid=[40, 50])
        idx = np.asarray(farthest_point_sample(jnp.asarray(pos), jnp.asarray(mask), 30, start_idx=0))
        assert (idx[0] < 40).all()
        assert (idx[1] < 50).all()

    def test_unique_indices(self, rng):
        pos, _, mask = make_clouds(rng, b=1, n=100)
        idx = np.asarray(farthest_point_sample(jnp.asarray(pos), jnp.asarray(mask), 50, start_idx=0))[0]
        assert len(set(idx.tolist())) == 50

    def test_random_start_valid_and_varied(self, rng):
        pos, _, mask = make_clouds(rng, b=8, n=64, n_valid=[32] * 8)
        idx = np.asarray(
            farthest_point_sample(jnp.asarray(pos), jnp.asarray(mask), 4, key=jax.random.key(0))
        )
        assert (idx[:, 0] < 32).all()
        assert len(set(idx[:, 0].tolist())) > 1  # starts differ across clouds

    def test_covers_spread_points(self):
        # 4 far-apart anchors + dense blob near the first anchor: FPS must pick
        # every anchor before any blob point.
        anchors = np.array([[0, 0, 0], [100, 0, 0], [0, 100, 0], [0, 0, 100]], np.float32)
        blob = np.random.default_rng(1).normal(size=(60, 3)).astype(np.float32) * 0.01
        pos = np.concatenate([anchors, blob])[None]
        mask = np.ones((1, 64), bool)
        idx = np.asarray(farthest_point_sample(jnp.asarray(pos), jnp.asarray(mask), 4, start_idx=0))[0]
        assert set(idx.tolist()) == {0, 1, 2, 3}


class TestBallQuery:
    @pytest.mark.parametrize("r,k", [(2.0, 8), (5.0, 16), (0.5, 4)])
    def test_matches_numpy_oracle(self, rng, r, k):
        pos, _, mask = make_clouds(rng, b=2, n=100, n_valid=[100, 80])
        centers = pos[:, :20]
        cmask = mask[:, :20]
        idx, ok = ball_query(
            jnp.asarray(centers), jnp.asarray(cmask), jnp.asarray(pos), jnp.asarray(mask),
            radius=r, k=k, chunk=16,
        )
        for i in range(2):
            widx, wok = ball_query_numpy(centers[i], cmask[i], pos[i], mask[i], r, k)
            # skip centroids with a point numerically at the ball boundary:
            # the TPU op computes d2 in f32 matmul form, the oracle in f64, and a
            # flipped boundary point shifts the whole first-K-by-index row.
            d2 = np.sum((centers[i][:, None].astype(np.float64) - pos[i][None]) ** 2, -1)
            safe = ~np.any(np.abs(d2 - r * r) < 1e-3 * r * r, axis=1)
            np.testing.assert_array_equal(np.asarray(ok[i])[safe], wok[safe])
            np.testing.assert_array_equal(np.asarray(idx[i])[safe][wok[safe]], widx[safe][wok[safe]])

    def test_self_always_included(self, rng):
        pos, _, mask = make_clouds(rng, b=1, n=50)
        centers, cmask = pos[:, :10], mask[:, :10]
        idx, ok = ball_query(
            jnp.asarray(centers), jnp.asarray(cmask), jnp.asarray(pos), jnp.asarray(mask),
            radius=1e-6, k=4,
        )
        # centroid j is point j: distance 0 <= r, must appear first
        np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), np.arange(10))
        assert np.asarray(ok[0, :, 0]).all()

    def test_excludes_padding_and_invalid_centers(self, rng):
        pos, _, mask = make_clouds(rng, b=1, n=60, n_valid=[30])
        centers = pos[:, :40]
        cmask = mask[:, :40]  # centers 30..39 invalid
        idx, ok = ball_query(
            jnp.asarray(centers), jnp.asarray(cmask), jnp.asarray(pos), jnp.asarray(mask),
            radius=100.0, k=64,
        )
        ok = np.asarray(ok[0])
        idx = np.asarray(idx[0])
        assert not ok[30:].any()
        assert (idx[ok] < 30).all()

    def test_cap_first_k_by_index(self):
        pos = np.zeros((1, 32, 3), np.float32)  # all coincident
        mask = np.ones((1, 32), bool)
        idx, ok = ball_query(
            jnp.asarray(pos[:, :1]), jnp.ones((1, 1), bool), jnp.asarray(pos), jnp.asarray(mask),
            radius=1.0, k=8,
        )
        np.testing.assert_array_equal(np.asarray(idx[0, 0]), np.arange(8))
        assert np.asarray(ok).all()


class TestGroupingPooling:
    def test_gather_points(self, rng):
        pos, feat, mask = make_clouds(rng, b=2, n=30)
        idx = rng.integers(0, 30, size=(2, 5, 3)).astype(np.int32)
        out = np.asarray(gather_points(jnp.asarray(feat), jnp.asarray(idx)))
        for b in range(2):
            for i in range(5):
                for j in range(3):
                    np.testing.assert_array_equal(out[b, i, j], feat[b, idx[b, i, j]])

    def test_group_neighborhoods_relative_pos(self, rng):
        pos, feat, mask = make_clouds(rng, b=1, n=20, f=2)
        centers = pos[:, :4]
        idx = np.tile(np.arange(6, dtype=np.int32), (1, 4, 1))
        ok = np.ones((1, 4, 6), bool)
        g = np.asarray(
            group_neighborhoods(jnp.asarray(pos), jnp.asarray(feat), jnp.asarray(centers),
                                jnp.asarray(idx), jnp.asarray(ok))
        )
        assert g.shape == (1, 4, 6, 5)  # F + 3
        np.testing.assert_allclose(g[0, 2, 3, :2], feat[0, 3], rtol=1e-6)
        np.testing.assert_allclose(g[0, 2, 3, 2:], pos[0, 3] - pos[0, 2], rtol=1e-5)

    def test_masked_max_matches_numpy(self, rng):
        x = rng.normal(size=(3, 10, 4)).astype(np.float32)
        mask = rng.random((3, 10)) > 0.3
        mask[0] = False  # empty segment -> 0
        got = np.asarray(masked_max(jnp.asarray(x), jnp.asarray(mask), axis=1))
        want = masked_max_numpy(x, mask, axis=1)
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)
