"""Sectored multi-start FPS (ops/fps.py fps_sectored) — the production
approximation of exact FPS (reference semantics: torch_cluster ``fps``,
``pointnet2_regressor.py:13``). Pins validity invariants and coverage quality.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dl_biomass_tpu.ops.fps import farthest_point_sample, fps_sectored


def _coverage_radius(pos, picks):
    """max over points of distance to nearest pick (the FPS objective)."""
    d = np.linalg.norm(pos[:, None, :] - pos[picks][None, :, :], axis=-1)
    return float(d.min(axis=1).max())


def test_valid_unique_and_masked():
    rng = np.random.default_rng(0)
    b, n, k = 3, 1024, 128
    pos = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    mask = jnp.asarray(rng.random((b, n)) < 0.9)
    idx = fps_sectored(pos, mask, k, key=jax.random.key(0), sectors=8)
    assert idx.shape == (b, k)
    for r in range(b):
        row = np.asarray(idx[r])
        assert len(set(row.tolist())) == k, "picks must be unique"
        assert bool(np.asarray(mask)[r][row].all()), "picks must be valid points"


def test_coverage_close_to_exact():
    """Sectored FPS is an approximation; its coverage radius should be within
    2x of exact FPS's (multi-start FPS theory; typically ~1.1-1.3x)."""
    rng = np.random.default_rng(1)
    n, k = 2048, 256
    pos_np = rng.normal(size=(n, 3)).astype(np.float32) * 5
    pos = jnp.asarray(pos_np)[None]
    mask = jnp.ones((1, n), bool)
    exact = np.asarray(farthest_point_sample(pos, mask, k, key=jax.random.key(0))[0])
    sect = np.asarray(fps_sectored(pos, mask, k, key=jax.random.key(0), sectors=8)[0])
    r_exact = _coverage_radius(pos_np, exact)
    r_sect = _coverage_radius(pos_np, sect)
    assert r_sect <= 2.0 * r_exact, (r_sect, r_exact)


def test_fallback_when_not_sectorable():
    """Shapes that don't sector cleanly fall back to exact FPS."""
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.normal(size=(2, 100, 3)), jnp.float32)
    mask = jnp.ones((2, 100), bool)
    a = fps_sectored(pos, mask, 11, sectors=8)  # odd k: no sector split works
    b = farthest_point_sample(pos, mask, 11)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_runs_with_fast_fps():
    from dl_biomass_tpu.core.cloud import CloudBatch
    from dl_biomass_tpu.models.pointnet2 import PointNet2Regressor

    rng = np.random.default_rng(3)
    b, n = 2, 512
    batch = CloudBatch(
        pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 5, jnp.float32),
        feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
        mask=jnp.asarray(rng.random((b, n)) < 0.95),
        y=jnp.zeros((b, 4), jnp.float32),
    )
    m = PointNet2Regressor(num_features=1, fast_fps=True, dropout_probability=0.0)
    vs = m.init({"params": jax.random.key(0), "fps": jax.random.key(1)}, batch, train=False)
    out = m.apply(vs, batch, train=False)
    assert out.shape == (b, 4)
    assert bool(jnp.all(jnp.isfinite(out)))
