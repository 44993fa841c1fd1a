"""Fused eval SA kernels (ops/pallas_sa_eval.py): parity with the unfused
engine composition in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.ops.pallas_group import ball_group_pallas
from dl_biomass_tpu.ops.pallas_sa_eval import sa1_fused_eval
from dl_biomass_tpu.ops.pooling import masked_max


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _mk(rng, b=2, n=512, m=128, f=1):
    pos = jnp.asarray(rng.normal(size=(b, n, 3)) * 2, jnp.float32)
    mask = jnp.asarray(rng.random((b, n)) > 0.1)
    feat = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    centers, cmask = pos[:, :m], mask[:, :m]
    return pos, mask, feat, centers, cmask


def _weights(rng, cin, h1, h2, cout):
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    return [mk(cin, h1), mk(h1), mk(h1, h2), mk(h2), mk(h2, cout), mk(cout)]


def _unfused(pos, mask, feat, centers, cmask, ws, radius, ct):
    """The engine's pre-fused SA1 path: group kernel + folded-XLA MLP + max."""
    from dl_biomass_tpu.models.inference import _run_folded

    _, nm, rel, g = ball_group_pallas(centers, cmask, pos, mask, feat,
                                      radius=radius, interpret=True,
                                      compute_dtype=ct, need_idx=False)
    e = jnp.concatenate([g, rel], axis=-1)
    layers = [(ws[0], ws[1]), (ws[2], ws[3]), (ws[4], ws[5])]
    return masked_max(_run_folded(e, layers, compute_dtype=ct), nm, axis=2)


class TestSA1FusedEval:
    @pytest.mark.parametrize("ct", [jnp.float32, jnp.bfloat16])
    def test_matches_unfused_engine_path(self, rng, ct):
        pos, mask, feat, centers, cmask = _mk(rng)
        ws = _weights(rng, 4, 16, 16, 32)
        want = _unfused(pos, mask, feat, centers, cmask, ws, 0.9, ct)
        got = sa1_fused_eval(centers, cmask, pos, mask, feat, ws, radius=0.9,
                             interpret=True,
                             bf16=(ct == jnp.bfloat16), out_dtype=ct)
        tol = 2e-2 if ct == jnp.bfloat16 else 1e-5
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=tol, rtol=tol,
        )

    def test_no_neighbor_centroid_zero(self, rng):
        """A centroid with no in-radius neighbor pools to exactly 0."""
        pos = jnp.asarray(rng.normal(size=(1, 128, 3)) * 0.1, jnp.float32)
        mask = jnp.ones((1, 128), bool)
        feat = jnp.asarray(rng.normal(size=(1, 128, 1)), jnp.float32)
        # centers are their own points EXCEPT center 0, moved far away
        # (a ball-query target set disjoint from the cloud at that slot)
        centers = pos[:, :32].at[0, 0].set(jnp.asarray([50.0, 50.0, 50.0]))
        cmask = mask[:, :32]
        ws = _weights(rng, 4, 8, 8, 16)
        out = sa1_fused_eval(centers, cmask, pos, mask, feat, ws, radius=0.5,
                             interpret=True)
        assert np.asarray(out)[0, 0].max() == 0.0  # isolated centroid
        assert np.abs(np.asarray(out)[0, 1:]).max() > 0

    def test_masked_centers_zero(self, rng):
        pos, mask, feat, centers, cmask = _mk(rng, m=64)
        cmask = cmask & (jnp.arange(64)[None, :] < 40)
        ws = _weights(rng, 4, 8, 8, 16)
        out = np.asarray(sa1_fused_eval(centers, cmask, pos, mask, feat, ws,
                                        radius=0.9, interpret=True))
        assert (out[:, 40:] == 0).all()

    def test_unpadded_shapes(self, rng):
        """m not a multiple of the centroid tile; n not a multiple of 128."""
        pos, mask, feat, centers, cmask = _mk(rng, n=300, m=50)
        ws = _weights(rng, 4, 8, 8, 16)
        want = _unfused(pos, mask, feat, centers, cmask, ws, 0.9, jnp.float32)
        got = sa1_fused_eval(centers, cmask, pos, mask, feat, ws, radius=0.9,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
