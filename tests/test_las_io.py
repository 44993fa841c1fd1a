"""LAS codec round-trip + reference-helper parity tests (pure numpy, no jax)."""

import numpy as np
import pytest

from dl_biomass_tpu.io import las as lascodec
from dl_biomass_tpu.io.reader import normalize_intensity, read_las, write_las


@pytest.fixture
def cloud(rng):
    n = 500
    coords = np.stack(
        [rng.uniform(-12, 12, n), rng.uniform(-12, 12, n), rng.uniform(0, 30, n)], 1
    )
    intensity = rng.integers(0, 40000, n).astype(np.uint16)
    return coords, intensity


class TestCodecRoundtrip:
    def test_pf6_with_extra_dim(self, tmp_path, cloud):
        coords, intensity = cloud
        i_norm = normalize_intensity(intensity)
        path = str(tmp_path / "a.las")
        write_las(coords, path, {"intensity": intensity, "intensity_normalized": i_norm})
        f = lascodec.read(path)
        assert f.header.point_format == 6
        assert f.header.version == (1, 4)
        assert len(f) == 500
        # scale 0.00025 quantization
        np.testing.assert_allclose(f.xyz, coords, atol=0.000126)
        np.testing.assert_array_equal(f["intensity"], intensity)
        np.testing.assert_allclose(f["intensity_normalized"], i_norm, rtol=1e-12)
        assert "intensity_normalized" in f.dimension_names

    def test_pf0_roundtrip(self, tmp_path, cloud):
        coords, intensity = cloud
        hdr = lascodec.LasHeader(version=(1, 2), point_format=0)
        hdr.scales = np.asarray([0.001] * 3)
        path = str(tmp_path / "b.las")
        lascodec.write(path, coords, header=hdr, attributes={"intensity": intensity})
        f = lascodec.read(path)
        assert f.header.point_format == 0
        np.testing.assert_allclose(f.xyz, coords, atol=0.00051)
        np.testing.assert_array_equal(f["intensity"], intensity)

    def test_bitfields_decode(self, tmp_path, cloud):
        coords, intensity = cloud
        path = str(tmp_path / "c.las")
        write_las(coords, path, {"intensity": intensity})
        f = lascodec.read(path)
        np.testing.assert_array_equal(f["return_number"], np.ones(len(f)))
        np.testing.assert_array_equal(f["number_of_returns"], np.ones(len(f)))

    def test_pf1_gps_time_roundtrip(self, tmp_path, cloud):
        coords, intensity = cloud
        hdr = lascodec.LasHeader(version=(1, 2), point_format=1)
        hdr.scales = np.asarray([0.001] * 3)
        t = np.linspace(1e5, 2e5, len(coords))
        path = str(tmp_path / "pf1.las")
        lascodec.write(path, coords, header=hdr,
                       attributes={"intensity": intensity, "gps_time": t})
        f = lascodec.read(path)
        assert f.header.point_format == 1
        np.testing.assert_allclose(f["gps_time"], t, rtol=1e-12)

    def test_pf7_rgb_roundtrip(self, tmp_path, cloud):
        coords, intensity = cloud
        hdr = lascodec.LasHeader(version=(1, 4), point_format=7)
        hdr.scales = np.asarray([0.001] * 3)
        rgb = {c: np.random.default_rng(1).integers(0, 65535, len(coords)).astype(np.uint16)
               for c in ("red", "green", "blue")}
        path = str(tmp_path / "pf7.las")
        lascodec.write(path, coords, header=hdr, attributes={"intensity": intensity, **rgb})
        f = lascodec.read(path)
        for c in ("red", "green", "blue"):
            np.testing.assert_array_equal(f[c], rgb[c])

    def test_useevery_and_filter_combined(self, tmp_path, cloud):
        coords, intensity = cloud
        path = str(tmp_path / "uf.las")
        write_las(coords, path, {"intensity": intensity})
        out, attrs = read_las(path, get_attributes=True, useevery=3, filter_height=10.0)
        strided = coords[::3]
        keep = strided[:, 2] > 10.0
        assert len(out) == keep.sum()
        np.testing.assert_array_equal(attrs["intensity"], intensity[::3][keep])

    def test_rejects_non_las(self, tmp_path):
        p = tmp_path / "junk.las"
        p.write_bytes(b"NOPE" + b"\0" * 400)
        with pytest.raises(ValueError, match="signature"):
            lascodec.read(str(p))


class TestReferenceHelpers:
    def test_read_las_filter_height(self, tmp_path, cloud):
        coords, intensity = cloud
        path = str(tmp_path / "d.las")
        write_las(coords, path, {"intensity": intensity})
        out = read_las(path, filter_height=10.0)
        assert (out[:, 2] > 10.0).all()
        assert len(out) == (coords[:, 2] > 10.0).sum()

    def test_read_las_useevery(self, tmp_path, cloud):
        coords, intensity = cloud
        path = str(tmp_path / "e.las")
        write_las(coords, path, {"intensity": intensity})
        out = read_las(path, useevery=5, filter_height=0)
        assert len(out) == 100

    def test_read_las_attrs_aligned(self, tmp_path, cloud):
        coords, intensity = cloud
        path = str(tmp_path / "f.las")
        write_las(coords, path, {"intensity": intensity})
        out, attrs = read_las(path, get_attributes=True, filter_height=5.0)
        assert len(attrs["intensity"]) == len(out)
        keep = coords[:, 2] > 5.0
        # quantization reorders nothing: intensity rows must match the filter
        np.testing.assert_array_equal(attrs["intensity"], intensity[keep])

    def test_normalize_intensity_x20(self):
        v = np.asarray([0, 50, 100])
        out = normalize_intensity(v)
        np.testing.assert_allclose(out, [0.0, 10.0, 20.0])


class TestLazGate:
    """LAZ path: optional laspy[lazrs] delegation (reference reads whatever
    laspy supports, pointcloud_dataloader.py:22)."""

    def _make_laz_stub(self, tmp_path, cloud):
        coords, intensity = cloud
        path = str(tmp_path / "c.las")
        write_las(coords, path, {"intensity": intensity})
        raw = bytearray(open(path, "rb").read())
        raw[104] |= 0x80  # set the LAZ compression bit
        lazp = str(tmp_path / "c.laz")
        open(lazp, "wb").write(bytes(raw))
        return lazp, coords, intensity

    def test_informative_error_without_laspy(self, tmp_path, cloud):
        import pytest

        lazp, _, _ = self._make_laz_stub(tmp_path, cloud)
        with pytest.raises(ValueError, match="laspy"):
            read_las(lazp)

    def test_delegates_to_laspy_when_available(self, tmp_path, cloud, monkeypatch):
        import sys
        import types

        lazp, coords, intensity = self._make_laz_stub(tmp_path, cloud)

        class FakePointFormat:
            dimension_names = ["X", "Y", "Z", "intensity"]

        class FakeLas:
            x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
            points = np.zeros(len(coords))
            point_format = FakePointFormat()

            def __getitem__(self, name):
                # laspy exposes raw integer X/Y/Z plus named dims
                table = {
                    "X": (coords[:, 0] * 1000).astype(np.int64),
                    "Y": (coords[:, 1] * 1000).astype(np.int64),
                    "Z": (coords[:, 2] * 1000).astype(np.int64),
                    "intensity": intensity,
                }
                return table[name]

        fake = types.ModuleType("laspy")
        fake.read = lambda p: FakeLas()
        monkeypatch.setitem(sys.modules, "laspy", fake)
        out, attrs = read_las(lazp, get_attributes=True, filter_height=0)
        np.testing.assert_allclose(out, coords)
        np.testing.assert_array_equal(attrs["intensity"], intensity)
