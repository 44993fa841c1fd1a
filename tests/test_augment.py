"""Augmentation distribution/semantics tests under fixed PRNG keys."""

import jax
import jax.numpy as jnp
import numpy as np

from dl_biomass_tpu.core.cloud import CloudBatch
from dl_biomass_tpu.transforms import augment_batch, point_removal, random_noise, rotate_points
from dl_biomass_tpu.transforms.augment import aug_capacity


def base_cloud(n=100, cap=None, f=1, seed=0):
    cap = cap or aug_capacity(n)
    rng = np.random.default_rng(seed)
    pos = np.zeros((cap, 3), np.float32)
    pos[:n] = rng.normal(size=(n, 3)) * 5
    feat = np.zeros((cap, f), np.float32)
    feat[:n] = rng.normal(size=(n, f))
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return jnp.asarray(pos), jnp.asarray(feat), jnp.asarray(mask), n


class TestRotate:
    def test_preserves_z_and_norms(self):
        pos, _, _, n = base_cloud()
        out = np.asarray(rotate_points(jax.random.key(0), pos))
        np.testing.assert_allclose(out[:, 2], np.asarray(pos)[:, 2], rtol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(out[:, :2], axis=1),
            np.linalg.norm(np.asarray(pos)[:, :2], axis=1),
            rtol=1e-4, atol=1e-4,
        )

    def test_angle_distribution_uniform(self):
        # many keys -> angles should cover (-pi, pi) broadly
        pos = jnp.asarray([[1.0, 0.0, 0.0]])
        angs = []
        for i in range(200):
            out = rotate_points(jax.random.key(i), pos)
            angs.append(float(jnp.arctan2(out[0, 1], out[0, 0])))
        angs = np.asarray(angs)
        assert angs.min() < -2.5 and angs.max() > 2.5
        assert abs(np.mean(angs)) < 0.3


class TestPointRemoval:
    def test_keep_count_in_reference_envelope(self):
        _, _, mask, n = base_cloud(n=100)
        counts = []
        for i in range(100):
            kept = point_removal(jax.random.key(i), mask)
            counts.append(int(jnp.sum(kept)))
        counts = np.asarray(counts)
        # reference: randint(round(0.9n), n) inclusive
        assert counts.min() >= 90 and counts.max() <= 100
        assert len(np.unique(counts)) > 5  # actually varies

    def test_only_removes_valid(self):
        _, _, mask, n = base_cloud(n=50)
        kept = np.asarray(point_removal(jax.random.key(1), mask))
        assert not kept[n:].any()


class TestRandomNoise:
    def test_append_count_and_slots(self):
        pos, feat, mask, n = base_cloud(n=100)
        cap = pos.shape[0]
        for i in range(20):
            p2, f2, m2 = random_noise(jax.random.key(i), pos, feat, mask, n)
            m2 = np.asarray(m2)
            n_app = int(m2[n:].sum())
            assert 0 <= n_app <= 10  # up to 10% of 100
            np.testing.assert_array_equal(m2[:n], np.asarray(mask)[:n])

    def test_base_points_stay_clean(self):
        # reference augmentation.py:113-120: noisy duplicates are APPENDED to
        # the original cloud — the base points themselves are never jittered
        pos, feat, mask, n = base_cloud(n=100)
        p2, f2, _ = random_noise(jax.random.key(3), pos, feat, mask, n)
        np.testing.assert_array_equal(np.asarray(p2[:n]), np.asarray(pos[:n]))
        np.testing.assert_array_equal(np.asarray(f2[:n]), np.asarray(feat[:n]))

    def test_appended_points_are_noisy_copies(self):
        found = 0
        for key in range(20):
            pos, feat, mask, n = base_cloud(n=100)
            p2, f2, m2 = random_noise(jax.random.key(key), pos, feat, mask, n)
            m2 = np.asarray(m2)
            app = np.asarray(p2)[n:][m2[n:]]
            if not len(app):
                continue
            found += len(app)
            # every appended point is a noisy copy: close to some original
            # (sigma <= 0.025, 3 dims => ~0.05 is already >5 sigma) but NOT
            # bit-identical to it
            d = np.linalg.norm(app[:, None] - np.asarray(pos[:n])[None], axis=-1).min(1)
            assert d.max() < 0.5
            assert d.min() > 0.0
        assert found > 0


class TestRandomScale:
    def test_scale_envelope_and_isotropy(self):
        from dl_biomass_tpu.transforms import random_scale

        pos = jnp.asarray([[2.0, 0.0, 1.0], [0.0, 4.0, -1.0]])
        for i in range(20):
            out = np.asarray(random_scale(jax.random.key(i), pos))
            s = out[0, 0] / 2.0
            assert 0.9 <= s <= 1.1
            np.testing.assert_allclose(out, np.asarray(pos) * s, rtol=1e-6)

    def test_chain_with_scale(self):
        from dl_biomass_tpu.transforms.augment import augment_cloud

        pos, feat, mask, n = base_cloud(n=100)
        p2, f2, m2 = augment_cloud(jax.random.key(0), pos, feat, mask, n, with_scale=True)
        assert np.isfinite(np.asarray(p2)).all()

    def test_appended_sources_survive_removal(self):
        """The chain shares ONE permutation between removal and append (a
        shorter prefix of the keep-prefix); every appended point must be a
        copy of a point that SURVIVED removal (reference augmentation.py:
        113-120 samples from the post-removal cloud)."""
        from dl_biomass_tpu.transforms.augment import augment_cloud, rotate_points

        checked = 0
        for key in range(30):
            pos, feat, mask, n = base_cloud(n=100)
            k = jax.random.key(key)
            p2, f2, m2 = augment_cloud(k, pos, feat, mask, n)
            m2 = np.asarray(m2)
            app_feat = np.asarray(f2)[n:][m2[n:]]  # features aren't rotated
            if not len(app_feat):
                continue
            kept_feat = np.asarray(f2)[:n][m2[:n]]
            checked += len(app_feat)
            # each appended feature = kept feature + noise (sigma <= 0.025):
            # nearest kept feature must be well within 0.2
            d = np.abs(app_feat[:, None, 0] - kept_feat[None, :, 0]).min(1)
            assert d.max() < 0.2, d.max()
        assert checked > 0


class TestAugmentBatch:
    def test_batch_shapes_and_y_passthrough(self):
        n = 100
        cap = aug_capacity(n)
        pos, feat, mask, _ = base_cloud(n=n, cap=cap)
        batch = CloudBatch(
            pos=jnp.stack([pos, pos]), feat=jnp.stack([feat, feat]),
            mask=jnp.stack([mask, mask]), y=jnp.ones((2, 4)),
        )
        out = augment_batch(jax.random.key(0), batch, n)
        assert out.pos.shape == batch.pos.shape
        np.testing.assert_array_equal(np.asarray(out.y), np.ones((2, 4)))
        # clouds augmented independently
        assert not np.allclose(np.asarray(out.pos[0]), np.asarray(out.pos[1]))

    def test_valid_counts_in_envelope(self):
        n = 200
        cap = aug_capacity(n)
        pos, feat, mask, _ = base_cloud(n=n, cap=cap)
        b = 8
        batch = CloudBatch(
            pos=jnp.tile(pos[None], (b, 1, 1)), feat=jnp.tile(feat[None], (b, 1, 1)),
            mask=jnp.tile(mask[None], (b, 1)), y=jnp.zeros((b, 4)),
        )
        out = augment_batch(jax.random.key(5), batch, n)
        counts = np.asarray(jnp.sum(out.mask, axis=1))
        # removal keeps 0.9n..n, append adds 0..10% of kept
        assert counts.min() >= int(0.9 * n)
        assert counts.max() <= int(1.1 * n) + 1
