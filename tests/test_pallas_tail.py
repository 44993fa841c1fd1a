"""fused_tail: fused last-edge-layer matmul + masked K-max (ops/pallas_tail).

Parity oracle: models/layers.Dense (bfloat16 compute) + ops/pooling.masked_max
— the exact pair the kernel replaces in SAModule. Reference semantics:
PointConv max aggregation (pointnet2_regressor.py:10,18).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.ops.pallas_tail import fused_tail
from dl_biomass_tpu.ops.pooling import masked_max


def _oracle(a2, mask, w3, b3):
    """The unfused pair with Dense's exact bf16 numerics."""
    y = jnp.dot(a2.astype(jnp.bfloat16), w3.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    z = (y + b3).astype(jnp.bfloat16)
    return masked_max(z, mask, axis=2)


@pytest.fixture
def data(rng):
    b, m, k, c2, c3 = 2, 32, 64, 64, 128
    a2 = jnp.asarray(rng.normal(size=(b, m, k, c2)), jnp.bfloat16)
    mask = jnp.asarray(rng.random(size=(b, m, k)) > 0.3)
    # at least one all-invalid row exercises the empty-slot fill
    mask = mask.at[0, 3].set(False)
    w3 = jnp.asarray(rng.normal(size=(c2, c3)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(c3,)) * 0.1, jnp.float32)
    return a2, mask, w3, b3


class TestFusedTailForward:
    def test_matches_unfused_exactly(self, data):
        a2, mask, w3, b3 = data
        out = fused_tail(a2, mask, w3, b3, True)
        want = _oracle(a2, mask, w3, b3)
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(want, np.float32))

    def test_junk_at_invalid_slots_is_ignored(self, data):
        a2, mask, w3, b3 = data
        junk = jnp.where(mask[..., None], a2, jnp.bfloat16(1e4))
        out = fused_tail(junk, mask, w3, b3, True)
        want = fused_tail(a2, mask, w3, b3, True)
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(want, np.float32))

    def test_all_invalid_row_yields_zero(self, data):
        a2, mask, w3, b3 = data
        out = np.asarray(fused_tail(a2, mask, w3, b3, True), np.float32)
        np.testing.assert_array_equal(out[0, 3], 0.0)

    def test_unaligned_m(self, rng):
        b, m, k, c2, c3 = 2, 20, 64, 64, 128  # m not a multiple of 8
        a2 = jnp.asarray(rng.normal(size=(b, m, k, c2)), jnp.bfloat16)
        mask = jnp.asarray(rng.random(size=(b, m, k)) > 0.3)
        w3 = jnp.asarray(rng.normal(size=(c2, c3)) * 0.1, jnp.float32)
        b3 = jnp.asarray(rng.normal(size=(c3,)) * 0.1, jnp.float32)
        out = fused_tail(a2, mask, w3, b3, True)
        want = _oracle(a2, mask, w3, b3)
        assert out.shape == (b, m, c3)
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(want, np.float32))


class TestFusedTailBackward:
    def test_grads_match_unfused(self, data):
        a2, mask, w3, b3 = data
        ct = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 32, 128)), jnp.float32)

        def loss_fused(a2, w3, b3):
            return jnp.sum(fused_tail(a2, mask, w3, b3, True) * ct)

        def loss_ref(a2, w3, b3):
            return jnp.sum(_oracle(a2, mask, w3, b3) * ct)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(a2, w3, b3)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(a2, w3, b3)
        # da2: bf16 grads routed to identical argmax slots -> exact match
        np.testing.assert_allclose(
            np.asarray(gf[0], np.float32), np.asarray(gr[0], np.float32),
            rtol=0.02, atol=1e-3)
        # dW3/db3: f32 accumulations over different contraction orders
        np.testing.assert_allclose(
            np.asarray(gf[1]), np.asarray(gr[1]), rtol=0.02, atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(gf[2]), np.asarray(gr[2]), rtol=0.02, atol=1e-2)

    def test_no_gradient_to_invalid_slots(self, data):
        a2, mask, w3, b3 = data

        def loss(a2):
            return jnp.sum(fused_tail(a2, mask, w3, b3, True))

        g = np.asarray(jax.grad(loss)(a2), np.float32)
        inv = ~np.asarray(mask)
        assert np.all(g[inv] == 0.0)


class TestFusedTailJunkRobustness:
    def test_nan_inf_at_invalid_slots_ignored(self, data):
        """masked_max semantics: NaN/Inf junk at masked slots must not leak
        (the round-5 review caught the additive-mask form propagating NaN)."""
        a2, mask, w3, b3 = data
        junk = jnp.where(mask[..., None], a2, jnp.bfloat16(jnp.nan))
        out = fused_tail(junk, mask, w3, b3, True)
        want = fused_tail(a2, mask, w3, b3, True)
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(want, np.float32))
        junk_inf = jnp.where(mask[..., None], a2, jnp.bfloat16(jnp.inf))
        out2 = fused_tail(junk_inf, mask, w3, b3, True)
        np.testing.assert_array_equal(
            np.asarray(out2, np.float32), np.asarray(want, np.float32))
