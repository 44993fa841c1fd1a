"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.ops import ball_query, farthest_point_sample
from dl_biomass_tpu.ops.pallas_ballquery import ball_query_pallas
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


class TestBallQueryPallas:
    @pytest.mark.parametrize("r,k", [(2.0, 8), (4.0, 16), (1.0, 64)])
    def test_matches_exact_jnp(self, rng, r, k):
        pos, mask = clouds(rng, b=2, n=512, n_valid=[512, 400])
        centers = pos[:, :40]
        cmask = jnp.asarray(np.arange(40)[None, :] < np.asarray([40, 30])[:, None])
        gi, gm = ball_query_pallas(centers, cmask, pos, mask, radius=r, k=k, interpret=True)
        wi, wm = ball_query(centers, cmask, pos, mask, radius=r, k=k, method="exact")
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(wm))
        gm_ = np.asarray(gm)
        np.testing.assert_array_equal(np.asarray(gi)[gm_], np.asarray(wi)[gm_])

    def test_unaligned_m_and_n(self, rng):
        pos, mask = clouds(rng, b=1, n=300)  # N not multiple of 128
        centers = pos[:, :37]  # M not multiple of 8
        cmask = mask[:, :37]
        gi, gm = ball_query_pallas(centers, cmask, pos, mask, radius=2.0, k=8, interpret=True)
        wi, wm = ball_query(centers, cmask, pos, mask, radius=2.0, k=8, method="exact")
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(wm))
        gm_ = np.asarray(gm)
        np.testing.assert_array_equal(np.asarray(gi)[gm_], np.asarray(wi)[gm_])

    def test_k_128_rejected(self, rng):
        """k=128 would overflow the min(rank,k)<<24 int32 packing (over-rank
        entries go negative and win every extraction round) — hard error."""
        pos, mask = clouds(rng, b=1, n=256)
        with pytest.raises(ValueError, match="128"):
            ball_query_pallas(pos[:, :16], mask[:, :16], pos, mask,
                              radius=2.0, k=128, interpret=True)
        # k=127 stays in budget: 127<<24 < 2^31
        gi, gm = ball_query_pallas(pos[:, :16], mask[:, :16], pos, mask,
                                   radius=50.0, k=127, interpret=True)
        wi, wm = ball_query(pos[:, :16], mask[:, :16], pos, mask,
                            radius=50.0, k=127, method="exact")
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(wm))
        gm_ = np.asarray(gm)
        np.testing.assert_array_equal(np.asarray(gi)[gm_], np.asarray(wi)[gm_])

    def test_pad_points_never_returned(self, rng):
        pos, mask = clouds(rng, b=1, n=256, n_valid=[100])
        gi, gm = ball_query_pallas(pos[:, :16], mask[:, :16], pos, mask,
                                   radius=50.0, k=64, interpret=True)
        gi, gm = np.asarray(gi), np.asarray(gm)
        assert (gi[gm] < 100).all()
