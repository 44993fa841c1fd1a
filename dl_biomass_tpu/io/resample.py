"""Offline point-cloud resampler.

Parity with the reference's ``downsampling_point_clouds.py``: per LAS file —
read, normalize intensity, downsample to ``num_points`` (random or exact FPS,
seeded at index 0, ``:55-92``), center, and write parquet (x, y, z, i_norm —
``:170-176``) or LAS with an ``intensity_normalized`` extra dim (``:179-183``);
output filenames ``{plot}_{method}_{num_points}``.

The reference's FPS is an O(N*k) numpy loop (~minutes per large plot). Here the
default engine batches plots onto the TPU FPS kernel (ops/pallas_fps) with a
numpy fallback; a C++ engine is used when the native extension is built.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from dl_biomass_tpu.io.reader import normalize_intensity, read_las, write_las
from dl_biomass_tpu.ops.reference import fps_numpy


def farthest_point_sampling(coords: np.ndarray, k: int, engine: str = "auto") -> np.ndarray:
    """Exact FPS seeded at index 0 -> (k,) indices (reference ``:55-92``)."""
    coords = np.asarray(coords, np.float64)
    n = len(coords)
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    if engine == "auto":
        try:
            from dl_biomass_tpu.native import pointops

            engine = "native" if pointops.available() else "tpu"
        except Exception:
            engine = "tpu"
    if engine == "native":
        from dl_biomass_tpu.native import pointops

        return pointops.fps(coords, k, start=0)
    if engine == "tpu":
        import jax
        import jax.numpy as jnp

        from dl_biomass_tpu.ops.fps import farthest_point_sample

        pos = jnp.asarray(coords, jnp.float32)[None]
        mask = jnp.ones((1, n), bool)
        use_pallas = jax.default_backend() == "tpu"
        return np.asarray(
            farthest_point_sample(pos, mask, k, start_idx=0, use_pallas=use_pallas)[0]
        )
    if engine == "numpy":
        return fps_numpy(coords, np.ones(n, bool), k, start=0)
    if engine == "sectored":
        # opt-in approximation (VERDICT round-2 item 6): sectored multi-start
        # FPS — S x fewer sequential iterations; exact semantics stay the
        # default. See ops/fps.py fps_sectored for the statistical argument.
        import jax
        import jax.numpy as jnp

        from dl_biomass_tpu.ops.fps import fps_sectored

        pos = jnp.asarray(coords, jnp.float32)[None]
        mask = np.ones((1, n), bool)
        use_pallas = jax.default_backend() == "tpu"
        idx = np.asarray(
            fps_sectored(pos, jnp.asarray(mask), k, use_pallas=use_pallas)[0]
        )
        return np.sort(idx)
    raise ValueError(f"unknown engine {engine!r}")


def voxel_downsample(coords: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel-grid downsampling: one (first) point per occupied voxel. The
    BASELINE config-5 ablation path ("voxel downsampling") — returns indices.

    Packs the 3 voxel coords into one int64 key so the dedup is a single 1-D
    stable sort: ~20x faster than ``np.unique(q, axis=0)``'s row-as-void sort
    (which cost ~30 ms per 50k-pt cloud and host-bound the density bench).
    First-occurrence semantics are identical (np.unique is stable when
    return_index=True)."""
    q = np.floor(coords / voxel_size).astype(np.int64)
    q -= q.min(axis=0)
    span = q.max(axis=0) + 1
    n = len(q)
    idx_bits = max(int(n - 1).bit_length(), 1)
    vox_bits = (int(span[0]) * int(span[1]) * int(span[2]) - 1).bit_length()
    if vox_bits + idx_bits <= 63:
        key = (q[:, 0] * span[1] + q[:, 1]) * span[2] + q[:, 2]
        # pack the point index into the low bits: a plain value sort then
        # groups points by voxel with ascending original index inside each
        # group — group starts ARE the stable-unique first indices, without
        # paying for a stable argsort (~12x slower than np.sort here)
        packed = np.sort((key << idx_bits) | np.arange(n, dtype=np.int64))
        starts = np.empty(n, bool)
        starts[0] = True
        np.not_equal(packed[1:] >> idx_bits, packed[:-1] >> idx_bits, out=starts[1:])
        first_idx = packed[starts] & ((1 << idx_bits) - 1)
    else:  # degenerate extents: fall back to the row-wise unique
        _, first_idx = np.unique(q, axis=0, return_index=True)
    return np.sort(first_idx)


def resample_point_clouds(
    in_dir: str,
    out_dir: str,
    num_points: int,
    use_columns: Sequence[str] = (),
    samp_meth: str = "random",  # random | fps | voxel
    glob: str = "*.las",
    use_parquet: bool = True,
    seed: int = 0,
    engine: str = "auto",
    voxel_size: float = 0.25,
    log_fn=print,
) -> List[str]:
    """Resample every LAS in ``in_dir``; returns the written file paths."""
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(Path(in_dir).glob(glob))
    rng = np.random.default_rng(seed)
    written = []
    for file in files:
        coords, attrs = read_las(str(file), get_attributes=True, filter_height=0)
        plot_id = file.name.rsplit(".", 1)[0]
        attrs["intensity_normalized"] = normalize_intensity(attrs["intensity"])
        cols = list(use_columns) if use_columns else ["intensity_normalized"]
        attr_arr = np.asarray(attrs[cols[0]], np.float64)

        n = coords.shape[0]
        if n >= num_points:
            if samp_meth == "random":
                use_idx = rng.choice(n, num_points, replace=False)
            elif samp_meth == "fps":
                use_idx = farthest_point_sampling(coords, num_points, engine=engine)
            elif samp_meth == "voxel":
                vi = voxel_downsample(coords, voxel_size)
                use_idx = (
                    vi if len(vi) <= num_points
                    else vi[rng.choice(len(vi), num_points, replace=False)]
                )
            else:
                raise ValueError(f"unknown samp_meth {samp_meth!r}")
        else:
            use_idx = rng.choice(n, num_points, replace=True)

        coords_s = coords[use_idx]
        attr_s = attr_arr[use_idx]
        coords_s = coords_s - coords_s.mean(axis=0)

        stem = f"{plot_id}_{samp_meth}_{num_points}"
        if use_parquet:
            import pandas as pd

            df = pd.DataFrame(
                np.column_stack([coords_s, attr_s]), columns=["x", "y", "z", "i_norm"]
            )
            path = os.path.join(out_dir, stem + ".parq")
            df.to_parquet(path)
        else:
            path = os.path.join(out_dir, stem + ".las")
            write_las(coords_s, path, {"intensity_normalized": attr_s})
        written.append(path)
        log_fn(f"  resampled {file.name} ({n} -> {len(use_idx)} pts) -> {os.path.basename(path)}")
    return written


def check_resampling(in_dir: str, out_path: Optional[str] = None, seed: int = 0) -> None:
    """3-D render of 4 random resampled outputs (reference ``:186-240``)."""
    import pandas as pd

    from dl_biomass_tpu.eval.plots import plot_cloud_grid

    # cloud files only: the out dir may also hold this function's own PNG
    # from a previous run (or other artifacts), which read_las would reject
    files = sorted(
        f for f in Path(in_dir).glob("*")
        if f.suffix.lower() in (".las", ".laz", ".parq", ".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no cloud files under {in_dir!r}")
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(files), size=min(4, len(files)), replace=False)
    coords_list = []
    for i in pick:
        f = files[i]
        if f.suffix.lower() in (".parq", ".parquet"):  # match the filter above
            coords_list.append(pd.read_parquet(f, columns=["x", "y", "z"]).to_numpy())
        else:
            coords_list.append(read_las(str(f), get_attributes=False, filter_height=0))
    plot_cloud_grid(coords_list, out_path)
