"""Native C++ pointops: build, parity vs numpy oracles, fallback behavior."""

import numpy as np
import pytest

from dl_biomass_tpu.native import pointops
from dl_biomass_tpu.ops.reference import ball_query_numpy, fps_numpy


@pytest.fixture(scope="module")
def coords():
    return np.random.default_rng(0).normal(size=(3000, 3)) * 10


class TestNativePointOps:
    def test_builds_or_falls_back(self):
        # either the .so built (preferred) or the numpy fallback engages;
        # both paths must serve every op below.
        assert pointops.available() in (True, False)

    def test_fps_parity(self, coords):
        want = fps_numpy(coords, np.ones(len(coords), bool), 128, 0)
        got = pointops.fps(coords, 128)
        np.testing.assert_array_equal(got, want)

    def test_fps_custom_start(self, coords):
        got = pointops.fps(coords, 16, start=7)
        assert got[0] == 7
        assert len(set(got.tolist())) == 16

    def test_ball_query_parity(self, coords):
        centers, pos = coords[:64], coords[:1000]
        i1, m1 = pointops.ball_query(centers, pos, 3.0, 16)
        i2, m2 = ball_query_numpy(
            centers, np.ones(64, bool), pos, np.ones(1000, bool), 3.0, 16
        )
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(i1[m1], i2[m2])

    def test_knn_exact(self, coords):
        q, pos = coords[:20], coords[:500]
        idx, dist = pointops.knn(q, pos, 5)
        d = np.linalg.norm(q[:, None] - pos[None], axis=-1)
        np.testing.assert_array_equal(idx, np.argsort(d, axis=1)[:, :5])
        np.testing.assert_allclose(dist, np.sort(d, axis=1)[:, :5], rtol=1e-9)

    def test_voxel_parity(self, coords):
        from dl_biomass_tpu.io.resample import voxel_downsample as vd_np

        got = pointops.voxel_downsample(coords, 2.5)
        want = vd_np(coords, 2.5)
        np.testing.assert_array_equal(got, want)
