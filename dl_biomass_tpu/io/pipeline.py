"""Host->device prefetching input pipeline.

For datasets that don't fit in HBM (the on-device ``DeviceDataset`` covers the
reference-scale corpus), this pipeline keeps the MXU fed: a background thread
decodes LAS files and assembles padded numpy batches (fresh random subsets each
epoch — matching the reference's per-``__getitem__`` resampling,
``pointcloud_dataloader.py:98-101``) while the device trains on the previous
batches; transfers are issued ahead through a bounded queue (double buffering).

Augmentation still happens on device (``transforms/augment.py``) after the
transfer, so the host thread does IO + packing only.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from dl_biomass_tpu.core.cloud import CloudBatch
from dl_biomass_tpu.transforms.augment import aug_capacity, augment_batch


class PrefetchingLoader:
    """Streams shuffled, augmented CloudBatches from a file-based dataset.

    Args:
      fileset: a ``PointCloudsInFiles``-style object with ``__len__`` and
        ``get(idx, rng) -> (pos, feat, y, plot_id) | None``.
      batch_size: clouds per batch (fixed; final partial batch is padded).
      num_augs: augmented copies per plot per epoch (reference ``main.py:96``).
      prefetch: queue depth of decoded batches (2 = double buffering).
    """

    def __init__(self, fileset, batch_size: int, base_n: int,
                 num_augs: int = 0, prefetch: int = 2):
        self.fileset = fileset
        self.batch_size = batch_size
        self.base_n = base_n
        self.num_augs = num_augs
        self.prefetch = prefetch
        self.capacity = aug_capacity(base_n) if num_augs > 0 else base_n

    def _produce(self, q: queue.Queue, seed: int, shuffle: bool,
                 stop: threading.Event):
        rng = np.random.default_rng(seed)
        p = len(self.fileset)
        order = np.tile(np.arange(p), 1 + self.num_augs)
        flags = np.repeat(np.arange(1 + self.num_augs) > 0, p)
        if shuffle:
            perm = rng.permutation(len(order))
            order, flags = order[perm], flags[perm]
        bs, cap = self.batch_size, self.capacity

        def put(item) -> bool:
            # bounded-queue put that gives up when the consumer abandons the
            # epoch (otherwise a consumer that breaks mid-epoch would leave
            # this thread blocked on a full queue forever, holding batches)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        try:
            for b0 in range(0, len(order), bs):
                if stop.is_set():
                    return
                sel = order[b0 : b0 + bs]
                fl = flags[b0 : b0 + bs]
                pos = np.zeros((bs, cap, 3), np.float32)
                feat = None
                mask = np.zeros((bs, cap), bool)
                y = np.zeros((bs, 4), np.float32)
                aflag = np.zeros(bs, bool)
                for j, (i, f) in enumerate(zip(sel, fl)):
                    item = self.fileset.get(int(i), rng)
                    if item is None:
                        continue
                    p_, x_, y_, _ = item
                    if feat is None:
                        feat = np.zeros((bs, cap, x_.reshape(len(x_), -1).shape[1]), np.float32)
                    n = min(len(p_), self.base_n)
                    pos[j, :n] = p_[:n]
                    feat[j, :n] = x_.reshape(len(x_), -1)[:n]
                    mask[j, :n] = True
                    y[j] = y_
                    aflag[j] = f
                if feat is None:
                    continue
                if not put((pos, feat, mask, y, aflag)):
                    return
        except BaseException as e:  # surfaced by the consumer — a swallowed
            # decode error would silently truncate the epoch mid-training
            put(("error", e))
            return
        finally:
            put(None)

    def epoch(self, key: jax.Array, shuffle: bool = True) -> Iterator[CloudBatch]:
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        t = threading.Thread(target=self._produce, args=(q, seed, shuffle, stop),
                             daemon=True)
        t.start()
        try:
            yield from self._consume(q, key)
            t.join()
        finally:
            stop.set()  # unblock/terminate the producer if we exit early

    def _consume(self, q: queue.Queue, key: jax.Array) -> Iterator[CloudBatch]:
        from dl_biomass_tpu.io.device_data import AUG_KEY_DOMAIN

        # domain-separated from the trainer's per-step fold_in(key, i)
        # (fit hands both the loader and train_epoch the SAME epoch key)
        akey = jax.random.fold_in(key, AUG_KEY_DOMAIN)
        i = 0
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "error":
                raise RuntimeError(
                    "PrefetchingLoader producer failed mid-epoch"
                ) from item[1]
            pos, feat, mask, y, aflag = item
            batch = CloudBatch(
                pos=jax.device_put(pos), feat=jax.device_put(feat),
                mask=jax.device_put(mask), y=jax.device_put(y),
            )
            if self.num_augs > 0 and aflag.any():
                aug = augment_batch(jax.random.fold_in(akey, i), batch, self.base_n)
                f = jnp.asarray(aflag)[:, None]
                batch = CloudBatch(
                    pos=jnp.where(f[..., None], aug.pos, batch.pos),
                    feat=jnp.where(f[..., None], aug.feat, batch.feat),
                    mask=jnp.where(f, aug.mask, batch.mask),
                    y=batch.y,
                )
            yield batch
            i += 1
