"""On-device dataset: the TPU-native replacement for the reference's dataloader
stack (``PointCloudsInFiles*`` + ``AugmentPointCloudsInFiles*`` + ``ConcatDataset``
+ ``DataListLoader``).

The reference re-reads the LAS file *and* the biomass CSV for every sample of
every epoch inside ``__getitem__`` (``pointcloud_dataloader.py:93,114``) — the
pipeline's dominant stall. Here the decoded dataset (a few hundred plots x ~7k
points) is uploaded to HBM once; every epoch the sample list (originals +
``num_augs`` augmented copies, reference ``main.py:96-106``) is shuffled on host
and batches are gathered + augmented entirely on device in one fused jitted
computation. Zero host->device transfer per step beyond a handful of int32
indices.

Exactly one computation is compiled for batch assembly regardless of epoch,
shuffle order, augmentation flags or partial final batches (pad clouds carry an
all-False mask and are zero-weighted by the loss).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dl_biomass_tpu.core.cloud import CloudBatch, round_up
from dl_biomass_tpu.transforms.augment import aug_capacity, augment_batch


# domain tag folded into the epoch key before per-batch augmentation keys are
# derived: without it, fold_in(key, b0) for batch offsets collides with the
# trainer's per-step fold_in(key, i) whenever b0 == i (always at step 0, and
# at every step when batch_size == 1), correlating augmentation noise with
# the step's dropout/FPS randomness
AUG_KEY_DOMAIN = 0x617567  # "aug"


@partial(jax.jit, static_argnames=("base_n",))
def _assemble_batch(pos, feat, mask, y, idx, aug_flag, sample_valid, key, *, base_n: int):
    """Gather clouds ``idx`` from the device-resident dataset, augment where
    ``aug_flag``, and zero out invalid (pad) samples."""
    bpos = jnp.take(pos, idx, axis=0)
    bfeat = jnp.take(feat, idx, axis=0)
    bmask = jnp.take(mask, idx, axis=0) & sample_valid[:, None]
    by = jnp.take(y, idx, axis=0)
    base = CloudBatch(pos=bpos, feat=bfeat, mask=bmask, y=by)
    aug = augment_batch(key, base, base_n)
    f = aug_flag[:, None]
    return CloudBatch(
        pos=jnp.where(f[..., None], aug.pos, base.pos),
        feat=jnp.where(f[..., None], aug.feat, base.feat),
        mask=jnp.where(f, aug.mask, base.mask),
        y=by,
    )


class DeviceDataset:
    """A fixed set of point clouds resident on device.

    Args:
      pos:  (P, C, 3) float32, valid points in slots [0, base_n).
      feat: (P, C, F) float32.
      mask: (P, C) bool.
      y:    (P, 4) float32 biomass targets.
      plot_ids: host-side list of P plot IDs.
      base_n: nominal points per cloud (e.g. 7168 for the presampled path).
    """

    def __init__(self, pos, feat, mask, y, plot_ids: Sequence[str], base_n: int):
        self.pos = jnp.asarray(pos, jnp.float32)
        self.feat = jnp.asarray(feat, jnp.float32)
        self.mask = jnp.asarray(mask, bool)
        self.y = jnp.asarray(y, jnp.float32)
        self.plot_ids = list(plot_ids)
        self.base_n = int(base_n)

    def __len__(self) -> int:
        return self.pos.shape[0]

    @property
    def num_features(self) -> int:
        return self.feat.shape[-1]

    @classmethod
    def from_clouds(
        cls,
        pos_list: Sequence[np.ndarray],
        feat_list: Sequence[np.ndarray],
        y: np.ndarray,
        plot_ids: Sequence[str],
        base_n: Optional[int] = None,
        for_augmentation: bool = True,
    ) -> "DeviceDataset":
        """Pack host numpy clouds (each (n_i, 3) + (n_i, F)) into device arrays.

        Capacity is ``aug_capacity(base_n)`` when the dataset will be augmented
        (noise-append needs ~10% headroom — reference ``augmentation.py:113-120``),
        else ``base_n`` rounded to the TPU lane width.
        """
        if not pos_list:
            raise ValueError("from_clouds: empty cloud list (no plots matched?)")
        if base_n is None:
            base_n = max(int(p.shape[0]) for p in pos_list)
        cap = aug_capacity(base_n) if for_augmentation else round_up(base_n, 128)
        p_arr = np.zeros((len(pos_list), cap, 3), np.float32)
        f_dim = feat_list[0].reshape(len(feat_list[0]), -1).shape[-1]
        f_arr = np.zeros((len(pos_list), cap, f_dim), np.float32)
        m_arr = np.zeros((len(pos_list), cap), bool)
        for i, (p, x) in enumerate(zip(pos_list, feat_list)):
            n = min(int(p.shape[0]), base_n)
            p_arr[i, :n] = p[:n]
            f_arr[i, :n] = x.reshape(len(x), -1)[:n]
            m_arr[i, :n] = True
        return cls(p_arr, f_arr, m_arr, np.asarray(y, np.float32), plot_ids, base_n)

    def pad_plots(self, p_to: int) -> "DeviceDataset":
        """Zero-pad the plot axis to ``p_to`` (all-False masks, ``__pad__``
        ids). Serving compiles one computation per (plot-count, steps) shape
        — on a remote-compile stack every new directory size costs minutes —
        so bulk serving buckets plot counts and slices the real rows back out
        (padded plots produce garbage rows the caller drops by position)."""
        p = len(self)
        if p_to < p:
            raise ValueError(f"pad_plots: {p_to} < current {p}")
        if p_to == p:
            return self
        pad = p_to - p
        z = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0
        )
        return DeviceDataset(
            z(self.pos), z(self.feat), z(self.mask), z(self.y),
            self.plot_ids + ["__pad__"] * pad, self.base_n,
        )

    # ---- batch serving --------------------------------------------------------

    def epoch_order(
        self, key: Optional[jax.Array], num_augs: int, shuffle: bool
    ) -> tuple[np.ndarray, np.ndarray]:
        """Sample list for one epoch: P originals + num_augs augmented copies of
        each plot (reference builds this with ConcatDataset, ``main.py:96-106``),
        optionally shuffled."""
        p = len(self)
        idx = np.tile(np.arange(p, dtype=np.int32), 1 + num_augs)
        aug = np.repeat(np.arange(1 + num_augs, dtype=np.int32) > 0, p)
        if shuffle:
            assert key is not None
            perm = np.asarray(jax.random.permutation(key, len(idx)))
            idx, aug = idx[perm], aug[perm]
        return idx, aug

    def epoch_specs(
        self,
        batch_size: int,
        *,
        key: Optional[jax.Array] = None,
        num_augs: int = 0,
        shuffle: bool = False,
    ) -> Iterator[tuple]:
        """Yield per-batch host specs ``(idx, aug_flag, valid, assemble_key)``
        — tiny HOST numpy arrays a fused assemble+train step consumes (see
        Trainer.train_epoch_fused); staying numpy keeps per-batch host work to
        one argument transfer and lets callers count valid clouds without a
        device sync. Key discipline matches batches() exactly, so the two
        paths produce bit-identical batches."""
        if num_augs > 0 and key is None:
            raise ValueError(
                "epoch_specs(num_augs>0) needs a PRNG key — without one every "
                "epoch would see identical augmentations"
            )
        # one spec-building core: the stacked-array form is the source of
        # truth for the chunk/pad layout, so the per-step and scan paths can
        # never desynchronize
        idxs, augs, valids, b0s = self.epoch_spec_arrays(
            batch_size, key=key, num_augs=num_augs, shuffle=shuffle
        )
        akey = (jax.random.fold_in(key, AUG_KEY_DOMAIN) if key is not None
                else jax.random.key(0))
        for si in range(len(b0s)):
            yield idxs[si], augs[si], valids[si], jax.random.fold_in(
                akey, int(b0s[si])
            )

    def epoch_spec_arrays(
        self,
        batch_size: int,
        *,
        key: Optional[jax.Array] = None,
        num_augs: int = 0,
        shuffle: bool = False,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """All of one epoch's batch specs stacked: ``(idxs (S,B), aug_flags
        (S,B), valids (S,B), b0s (S,))`` host numpy — the input layout of the
        scan-over-steps epoch (Trainer.train_epoch_scan), which runs the whole
        epoch as ONE device dispatch. ``b0s`` carries each step's batch offset
        so the scan body can derive the step's augmentation key exactly as
        ``epoch_specs`` does (``fold_in(fold_in(key, AUG_KEY_DOMAIN), b0)``) —
        the two paths stay bit-identical."""
        if num_augs > 0 and key is None:
            raise ValueError(
                "epoch_spec_arrays(num_augs>0) needs a PRNG key — without one "
                "every epoch would see identical augmentations"
            )
        order, aug = self.epoch_order(key, num_augs, shuffle)
        n = len(order)
        s = (n + batch_size - 1) // batch_size
        idxs = np.zeros((s, batch_size), np.int32)
        augs = np.zeros((s, batch_size), bool)
        valids = np.zeros((s, batch_size), bool)
        b0s = np.arange(s, dtype=np.int32) * batch_size
        for si, b0 in enumerate(range(0, n, batch_size)):
            chunk = order[b0 : b0 + batch_size]
            idxs[si, : len(chunk)] = chunk
            augs[si, : len(chunk)] = aug[b0 : b0 + batch_size]
            valids[si, : len(chunk)] = True
        return idxs, augs, valids, b0s

    def batches(
        self,
        batch_size: int,
        *,
        key: Optional[jax.Array] = None,
        num_augs: int = 0,
        shuffle: bool = False,
    ) -> Iterator[CloudBatch]:
        """Yield fixed-shape CloudBatches; the final partial batch is padded with
        zero-weight clouds so every step reuses one compiled shape."""
        if num_augs > 0 and key is None:
            raise ValueError(
                "batches(num_augs>0) needs a PRNG key — without one every epoch "
                "would see identical augmentations"
            )
        for idx, aug_flag, valid, akey in self.epoch_specs(
            batch_size, key=key, num_augs=num_augs, shuffle=shuffle
        ):
            yield _assemble_batch(
                self.pos, self.feat, self.mask, self.y,
                idx, aug_flag, valid, akey, base_n=self.base_n,
            )

    def batch_plot_ids(self, batch_size: int) -> List[List[str]]:
        """Plot IDs per (unshuffled, unaugmented) batch — for eval reporting."""
        ids = self.plot_ids
        return [ids[i : i + batch_size] for i in range(0, len(ids), batch_size)]
