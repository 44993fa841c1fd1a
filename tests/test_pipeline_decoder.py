"""Host prefetch pipeline + FP-decoder model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from dl_biomass_tpu.io.reader import write_las
from dl_biomass_tpu.io.synthetic import synthetic_plot


@pytest.fixture
def fileset(tmp_path, rng):
    from dl_biomass_tpu.io.dataset import PointCloudsInFiles

    rows = []
    for i in range(5):
        coords, intensity, biomass = synthetic_plot(rng, 300)
        pid = f"RM_{i:03d}"
        write_las(coords, str(tmp_path / f"{pid}.las"),
                  {"intensity": intensity.astype(np.uint16)})
        rows.append(dict(PlotID=pid, bark_btphr=biomass[0], branch_btphr=biomass[1],
                         foliage_btphr=biomass[2], wood_btphr=biomass[3]))
    csv = tmp_path / "b.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return PointCloudsInFiles(str(tmp_path), "*.las", max_points=128,
                              use_columns=["intensity_normalized"],
                              filter_height=0.2, dataset=["RM"], biomass_csv=str(csv))


class TestPrefetchingLoader:
    def test_epoch_batches(self, fileset):
        from dl_biomass_tpu.io.pipeline import PrefetchingLoader

        loader = PrefetchingLoader(fileset, batch_size=2, base_n=128, num_augs=1)
        batches = list(loader.epoch(jax.random.key(0)))
        # 5 plots x 2 copies = 10 samples -> 5 batches of 2
        assert len(batches) == 5
        for b in batches:
            assert b.pos.shape[0] == 2
            assert np.asarray(jnp.any(b.mask, axis=1)).all()
            assert np.isfinite(np.asarray(b.y)).all()

    def test_no_augs_plain_stream(self, fileset):
        from dl_biomass_tpu.io.pipeline import PrefetchingLoader

        loader = PrefetchingLoader(fileset, batch_size=2, base_n=128, num_augs=0)
        batches = list(loader.epoch(jax.random.key(1), shuffle=False))
        assert len(batches) == 3  # ceil(5/2)
        counts = np.asarray(jnp.sum(batches[0].mask, axis=1))
        np.testing.assert_array_equal(counts, [128, 128])

    def test_producer_error_propagates(self, fileset):
        """A decode failure mid-epoch must raise in the consumer — a silently
        truncated epoch would train on random subsets with no error."""
        from dl_biomass_tpu.io.pipeline import PrefetchingLoader

        orig_get = fileset.get
        calls = {"n": 0}

        def bad_get(idx, rng):
            calls["n"] += 1
            if calls["n"] == 4:
                raise ValueError("corrupt LAS record")
            return orig_get(idx, rng)

        fileset.get = bad_get
        loader = PrefetchingLoader(fileset, batch_size=2, base_n=128, num_augs=0)
        with pytest.raises(RuntimeError, match="producer failed"):
            list(loader.epoch(jax.random.key(1), shuffle=False))

    def test_consumer_abandon_does_not_hang(self, fileset):
        """Breaking out of the epoch mid-stream must terminate the producer
        thread (a bounded q.put would otherwise block it forever)."""
        import threading
        import time

        from dl_biomass_tpu.io.pipeline import PrefetchingLoader

        before = set(threading.enumerate())
        loader = PrefetchingLoader(fileset, batch_size=1, base_n=128,
                                   num_augs=2, prefetch=1)
        gen = loader.epoch(jax.random.key(2))
        next(gen)
        produced = [t for t in threading.enumerate() if t not in before]
        gen.close()  # abandon: runs the generator's finally -> stop.set()
        deadline = time.time() + 5.0  # producer exits within the put timeout
        for t in produced:
            t.join(max(0.0, deadline - time.time()))
        assert not any(t.is_alive() for t in produced)


class TestFPDecoder:
    def test_knn_interpolate_exactness(self):
        from dl_biomass_tpu.models.decoder import knn_interpolate

        # dst exactly at a src point -> its feature dominates (w -> inf)
        pos_src = jnp.asarray([[[0.0, 0, 0], [10, 0, 0], [0, 10, 0]]])
        feat_src = jnp.asarray([[[1.0], [2.0], [3.0]]])
        src_mask = jnp.ones((1, 3), bool)
        pos_dst = jnp.asarray([[[0.0, 0, 0], [9.9, 0, 0]]])
        dst_mask = jnp.ones((1, 2), bool)
        out = np.asarray(knn_interpolate(feat_src, pos_src, src_mask, pos_dst, dst_mask, k=2))
        assert abs(out[0, 0, 0] - 1.0) < 1e-3
        assert abs(out[0, 1, 0] - 2.0) < 0.05

    def test_segmentor_per_point_output(self, rng):
        from dl_biomass_tpu.core.cloud import CloudBatch
        from dl_biomass_tpu.models.decoder import PointNet2Segmentor

        b, n = 1, 128
        batch = CloudBatch(
            pos=jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32),
            feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
            mask=jnp.asarray(np.arange(n) < 100),
            y=None,
        )
        batch = CloudBatch(pos=batch.pos, feat=batch.feat,
                           mask=batch.mask[None].repeat(b, 0), y=None)
        model = PointNet2Segmentor(num_features=1)
        variables = model.init({"params": jax.random.key(0)}, batch, train=False)
        out = np.asarray(model.apply(variables, batch, train=False))
        assert out.shape == (b, n, 1)
        assert np.isfinite(out).all()
        np.testing.assert_array_equal(out[0, 100:], 0)  # masked points -> 0


class TestPredictedLasDump:
    def test_roundtrip(self, rng, tmp_path):
        """dump_predicted_las writes masked points + ref/pred Extra Bytes dims
        (the historical per-epoch artifact, Misc/Lukas_OG_Scripts/main.py:92-100)
        readable back through the codec."""
        from dl_biomass_tpu.io.reader import read_las
        from dl_biomass_tpu.models.decoder import dump_predicted_las

        n = 200
        pos = rng.normal(size=(n, 3)) * 10 + 50
        mask = np.arange(n) < 150
        ref = rng.uniform(0, 5, size=n)
        pred = ref + rng.normal(size=n) * 0.1
        path = str(tmp_path / "ep3_0.las")
        dump_predicted_las(path, pos, mask, ref, pred)

        coords, attrs = read_las(path, get_attributes=True)
        assert coords.shape == (150, 3)
        np.testing.assert_allclose(coords, pos[mask], atol=2e-3)  # 0.00025 scale
        np.testing.assert_allclose(attrs["ref"], ref[mask], rtol=1e-12)
        np.testing.assert_allclose(attrs["pred"], pred[mask], rtol=1e-12)
