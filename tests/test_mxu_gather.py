"""MXU one-hot gather: exactness, scatter-add VJP, dtype preservation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_biomass_tpu.ops.pallas_mxu_gather import mxu_gather


@pytest.fixture
def data(rng):
    b, n, m, k, c = 2, 256, 20, 64, 96
    vals = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, size=(b, m, k)), jnp.int32)
    return vals, idx


class TestMXUGather:
    def test_forward_exact(self, data):
        vals, idx = data
        out = np.asarray(mxu_gather(vals, idx, interpret=True))
        want = np.asarray(vals)[np.arange(2)[:, None, None], np.asarray(idx)]
        np.testing.assert_array_equal(out, want)

    def test_backward_is_scatter_add(self, data, rng):
        vals, idx = data
        b, n, c = vals.shape
        ct = rng.normal(size=(b, 20, 64, c)).astype(np.float32)

        def loss(v):
            return jnp.sum(mxu_gather(v, idx, interpret=True) * ct)

        g = np.asarray(jax.grad(loss)(vals))
        want = np.zeros((b, n, c), np.float32)
        for i in range(b):
            np.add.at(want[i], np.asarray(idx)[i].reshape(-1), ct[i].reshape(-1, c))
        np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-5)

    def test_bf16_forward_exact(self, data):
        vals, idx = data
        vals16 = vals.astype(jnp.bfloat16)
        out = mxu_gather(vals16, idx, interpret=True)
        assert out.dtype == jnp.bfloat16
        want = np.asarray(vals16)[np.arange(2)[:, None, None], np.asarray(idx)]
        np.testing.assert_array_equal(np.asarray(out), want)

    def test_unaligned_m(self, rng):
        vals = jnp.asarray(rng.normal(size=(1, 128, 32)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 128, size=(1, 5, 64)), jnp.int32)  # M=5
        out = np.asarray(mxu_gather(vals, idx, interpret=True))
        want = np.asarray(vals)[0][np.asarray(idx)[0]]
        np.testing.assert_array_equal(out[0], want)

    def test_aux_table_rides_along(self, data, rng):
        vals, idx = data
        aux = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
        out, out_aux = mxu_gather(vals, idx, aux=aux, interpret=True)
        want_aux = np.asarray(aux)[np.arange(2)[:, None, None], np.asarray(idx)]
        np.testing.assert_array_equal(np.asarray(out_aux), want_aux)
        # grads still flow to values (and only to values)
        ct = rng.normal(size=out.shape).astype(np.float32)

        def loss(v):
            o, _ = mxu_gather(v, idx, aux=aux, interpret=True)
            return jnp.sum(o * ct)

        g = np.asarray(jax.grad(loss)(vals))
        want = np.zeros(vals.shape, np.float32)
        for i in range(2):
            np.add.at(want[i], np.asarray(idx)[i].reshape(-1), ct[i].reshape(-1, vals.shape[-1]))
        np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-5)

    def test_rejects_wrong_k(self, rng):
        vals = jnp.zeros((1, 64, 8))
        idx = jnp.zeros((1, 4, 32), jnp.int32)
        with pytest.raises(ValueError, match="K=64"):
            mxu_gather(vals, idx, interpret=True)


class TestPadRowFiniteness:
    """Pins the split-path invariant (models/inference.py, SAModule split):
    rows gathered at ball-query PAD slots must be FINITE — the consumers
    skip the jnp.where zeroing and rely on masked_max exclusion alone."""

    def test_index_zero_pad_rows_are_finite(self, rng):
        b, n, m, k, c = 2, 256, 20, 64, 96
        vals = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
        # ball_query pads masked slots with index 0 (ops/pallas_ballquery
        # returns where(nbr_mask, out, 0)) — every row must be point 0's row
        idx = jnp.zeros((b, m, k), jnp.int32)
        out = np.asarray(mxu_gather(vals, idx, interpret=True))
        assert np.isfinite(out).all()
        want = np.broadcast_to(
            np.asarray(vals)[:, 0][:, None, None, :], (b, m, k, c))
        np.testing.assert_array_equal(out, want)

    def test_out_of_range_indices_gather_finite_zeros(self, rng):
        # defensive half of the invariant: if padding semantics ever change
        # to out-of-range sentinels, the one-hot gather must yield 0.0 rows
        # (no valid one-hot column), which is still finite
        b, n, m, k, c = 2, 256, 4, 64, 96
        vals = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
        idx = jnp.full((b, m, k), n, jnp.int32)  # one past the end
        out = np.asarray(mxu_gather(vals, idx, interpret=True))
        assert np.isfinite(out).all()
        np.testing.assert_array_equal(out, np.zeros((b, m, k, c), np.float32))


class TestLargeMSplit:
    """Whole-item blocks scale with M since the round-5 grid rework; the
    _m_split grid factor must keep VMEM bounded without changing results."""

    def test_large_m_forward_and_backward(self, rng):
        from dl_biomass_tpu.ops.pallas_mxu_gather import _m_split

        b, n, m, k, c = 1, 256, 4096, 64, 96
        assert _m_split(m // 32, max(512, c * 4)) > 1  # exercises ns > 1
        vals = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, size=(b, m, k)), jnp.int32)
        out = np.asarray(mxu_gather(vals, idx, interpret=True))
        want = np.asarray(vals)[np.zeros(1, int)[:, None, None], np.asarray(idx)]
        np.testing.assert_array_equal(out, want)

        ct = rng.normal(size=(b, m, k, c)).astype(np.float32)

        def loss(v):
            return jnp.sum(mxu_gather(v, idx, interpret=True) * ct)

        g = np.asarray(jax.grad(loss)(vals))
        wantg = np.zeros((b, n, c), np.float32)
        np.add.at(wantg[0], np.asarray(idx)[0].reshape(-1), ct[0].reshape(-1, c))
        np.testing.assert_allclose(g, wantg, rtol=1e-5, atol=1e-4)
