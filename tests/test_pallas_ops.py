"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from dl_biomass_tpu.ops import farthest_point_sample
from dl_biomass_tpu.ops.pallas_fps import fps_pallas


def clouds(rng, b, n, n_valid=None):
    pos = rng.normal(size=(b, n, 3)).astype(np.float32) * 5
    mask = np.zeros((b, n), bool)
    for i in range(b):
        mask[i, : (n if n_valid is None else n_valid[i])] = True
    return jnp.asarray(pos), jnp.asarray(mask)


class TestFPSPallas:
    def test_matches_jnp_fps(self, rng):
        pos, mask = clouds(rng, b=3, n=256, n_valid=[256, 200, 180])
        k = 32
        starts = jnp.zeros((3,), jnp.int32)
        got = np.asarray(fps_pallas(pos, mask, k, starts, interpret=True))
        want = np.asarray(farthest_point_sample(pos, mask, k, start_idx=0))
        np.testing.assert_array_equal(got, want)

    def test_unaligned_shapes_padded(self, rng):
        # B not multiple of 8, N not multiple of 128
        pos, mask = clouds(rng, b=5, n=200, n_valid=[200, 150, 120, 199, 100])
        k = 16
        starts = jnp.asarray([0, 3, 5, 0, 1], jnp.int32)
        got = np.asarray(fps_pallas(pos, mask, k, starts, interpret=True))
        # compare per-cloud against the jnp path with explicit starts
        from dl_biomass_tpu.ops.fps import _fps_one

        for i in range(5):
            w = np.asarray(_fps_one(pos[i], mask[i], k, starts[i]))
            np.testing.assert_array_equal(got[i], w)

    def test_never_selects_padding(self, rng):
        pos, mask = clouds(rng, b=2, n=128, n_valid=[100, 90])
        got = np.asarray(fps_pallas(pos, mask, 64, jnp.zeros((2,), jnp.int32), interpret=True))
        assert (got[0] < 100).all() and (got[1] < 90).all()

    def test_model_route_use_pallas(self, rng):
        """farthest_point_sample(use_pallas=True) routes through the kernel."""
        pos, mask = clouds(rng, b=2, n=128)
        a = np.asarray(farthest_point_sample(pos, mask, 16, start_idx=0, use_pallas=True))
        b = np.asarray(farthest_point_sample(pos, mask, 16, start_idx=0))
        np.testing.assert_array_equal(a, b)
