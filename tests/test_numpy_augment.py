"""Host-side numpy augmentation + Augment* dataset classes (reference parity)."""

import numpy as np
import pandas as pd
import pytest

from dl_biomass_tpu.transforms.numpy_augment import augment, point_removal, random_noise, rotate_points


@pytest.fixture
def cloud(rng):
    return rng.normal(size=(200, 3)) * 5, rng.normal(size=(200, 1))


class TestNumpyTransforms:
    def test_rotation_preserves_z(self, rng, cloud):
        coords, _ = cloud
        out = rotate_points(rng, coords)
        np.testing.assert_allclose(out[:, 2], coords[:, 2])
        np.testing.assert_allclose(
            np.linalg.norm(out[:, :2], axis=1), np.linalg.norm(coords[:, :2], axis=1),
            rtol=1e-9,
        )

    def test_removal_envelope_and_alignment(self, rng, cloud):
        coords, x = cloud
        for _ in range(20):
            c2, x2 = point_removal(rng, coords, x)
            assert 180 <= len(c2) <= 200
            assert len(c2) == len(x2)
            # rows remain aligned pairs from the original
            joined = {(round(float(a[0]), 6), round(float(b[0]), 6))
                      for a, b in zip(coords, x)}
            assert (round(float(c2[0][0]), 6), round(float(x2[0][0]), 6)) in joined

    def test_noise_appends_up_to_ten_percent(self, rng, cloud):
        coords, x = cloud
        sizes = [len(random_noise(rng, coords, 1, x)[0]) for _ in range(30)]
        assert min(sizes) >= 200 and max(sizes) <= 220

    def test_full_chain_size_envelope(self, rng, cloud):
        coords, x = cloud
        sizes = [len(augment(rng, coords, x)[0]) for _ in range(30)]
        # removal to [180, 200], then append up to 10%
        assert min(sizes) >= 180 and max(sizes) <= 220

    def test_device_and_numpy_distributions_agree(self, rng, cloud):
        """The on-device masked transforms and the host numpy transforms draw
        from the same distributions (kept-count envelopes, noise scale)."""
        import jax
        import jax.numpy as jnp

        from dl_biomass_tpu.transforms.augment import aug_capacity, augment_cloud

        coords, x = cloud
        n = len(coords)
        cap = aug_capacity(n)
        pos = np.zeros((cap, 3), np.float32)
        pos[:n] = coords
        feat = np.zeros((cap, 1), np.float32)
        feat[:n] = x
        mask = np.zeros(cap, bool)
        mask[:n] = True
        dev_sizes, np_sizes = [], []
        for i in range(25):
            _, _, m2 = augment_cloud(jax.random.key(i), jnp.asarray(pos),
                                     jnp.asarray(feat), jnp.asarray(mask), n)
            dev_sizes.append(int(np.asarray(m2).sum()))
            np_sizes.append(len(augment(rng, coords, x)[0]))
        # same support and similar means
        assert abs(np.mean(dev_sizes) - np.mean(np_sizes)) < 8


class TestAugmentDatasets:
    def test_augment_classes(self, tmp_path, rng):
        from dl_biomass_tpu.io.dataset import AugmentPointCloudsInFiles, AugmentPreSampledPoints
        from dl_biomass_tpu.io.reader import normalize_intensity, write_las
        from dl_biomass_tpu.io.synthetic import synthetic_plot

        coords, intensity, biomass = synthetic_plot(rng, 400)
        write_las(coords, str(tmp_path / "RM_000.las"),
                  {"intensity": intensity.astype(np.uint16),
                   "intensity_normalized": normalize_intensity(intensity)})
        pd.DataFrame([dict(PlotID="RM_000", bark_btphr=1, branch_btphr=2,
                           foliage_btphr=3, wood_btphr=4)]).to_csv(
            tmp_path / "b.csv", index=False)

        ds = AugmentPointCloudsInFiles(
            str(tmp_path), "*.las", max_points=256,
            use_columns=["intensity_normalized"], filter_height=0.2,
            dataset=["RM"], biomass_csv=str(tmp_path / "b.csv"),
        )
        pos, feat, y, pid = ds.get(0, np.random.default_rng(0))
        assert 230 <= len(pos) <= 282  # 0.9*256..1.1*256
        assert len(pos) == len(feat) and pid == "RM_000"

        pre = AugmentPreSampledPoints(
            str(tmp_path), "*.las", biomass_csv=str(tmp_path / "b.csv"),
            presampled_suffix="",
        )
        pos2, feat2, y2, pid2 = pre.get(0, np.random.default_rng(1))
        assert 360 <= len(pos2) <= 440
        np.testing.assert_array_equal(y2, [1, 2, 3, 4])
