"""Deployment prediction: a directory of clouds -> a biomass CSV.

The reference has no target-free serving path — every eval script joins the
biomass table and computes metrics (``testing_model.py:15-330``, ``scratch.py``).
Production deployment needs the other thing: predict plots for which no ground
truth exists. This module loads a checkpoint, ingests LAS/parquet clouds, runs
them through the folded-weight serving engine (``models/inference.py``) when
the architecture supports it (falling back to the jitted ``model.apply``), and
writes ``PlotID, bark/branch/foliage/wood_btphr, tree_btphr`` rows.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from dl_biomass_tpu.io.dataset import BIOMASS_COLUMNS


def _targetless(fileset):
    """Serve datasets without a biomass table: zero targets (unused)."""
    fileset.targets = lambda plot_id: np.zeros(4, np.float32)
    return fileset


def predict_directory(
    model_dir: str,
    in_dir: str,
    out_csv: Optional[str] = None,
    *,
    model_file: Optional[str] = None,
    use_presampled: bool = True,
    num_points: int = 7168,
    use_columns: Optional[List[str]] = None,
    use_datasets: Optional[Sequence[str]] = None,
    glob: str = "*.las",
    batch_size: int = 32,
    presampled_suffix: str = "_fps_7168",
    parity: bool = False,
    engine: bool = True,
    seed: int = 0,
    plot_bucket: int = 64,
    export_path: Optional[str] = None,
) -> pd.DataFrame:
    """Predict every plot under ``in_dir``; returns (and optionally writes)
    the predictions frame indexed by PlotID.

    ``plot_bucket``: round the served plot count up to a multiple of this
    (padded plots are masked out and their rows dropped), so directories
    whose sizes fall in the same bucket share ONE compiled serving
    computation — on this stack each new shape costs minutes of remote
    compile, vs ~40 ms for a wasted padded batch. 0 disables.

    ``export_path``: serve through an AOT artifact (CLI ``export-model``,
    models/export.py) instead of a checkpoint — no flax/model rebuild, no
    jit tracing; ``model_dir``/``parity``/``engine`` are ignored."""
    from dl_biomass_tpu.eval.testing import load_model_for_eval, predict_dataset

    use_columns = use_columns or ["intensity_normalized"]
    if use_datasets is None:
        # deployment plots carry arbitrary names — default to accepting every
        # file's prefix rather than the training corpora's {BC, RM, PF}
        import glob as _glob

        names = [os.path.basename(p) for p in
                 _glob.glob(os.path.join(in_dir, glob))]
        use_datasets = sorted({n.split(".")[0][:2] for n in names}) or ["BC"]
    exported = None
    if export_path is not None:
        from dl_biomass_tpu.models.export import load_serving

        exported = load_serving(export_path)
        print("Using exported artifact:", export_path)
    else:
        model, params, batch_stats, path = load_model_for_eval(
            model_dir, model_file, parity=parity
        )
        print("Using model:", path)

    if use_presampled:
        from dl_biomass_tpu.io.dataset import PointCloudsInFilesPreSampled

        fileset = _targetless(PointCloudsInFilesPreSampled(
            in_dir, glob, dataset=use_datasets, use_column=use_columns[0],
            presampled_suffix=presampled_suffix,
        ))
        if len(fileset) == 0:
            raise FileNotFoundError(f"no {glob} plots under {in_dir!r}")
        ds = fileset.load_all(for_augmentation=False)
    else:
        from dl_biomass_tpu.io.dataset import PointCloudsInFiles

        fileset = _targetless(PointCloudsInFiles(
            in_dir, glob, max_points=num_points, use_columns=use_columns,
            filter_height=0.2, dataset=use_datasets,
        ))
        if len(fileset) == 0:
            raise FileNotFoundError(f"no {glob} plots under {in_dir!r}")
        ds = fileset.load_all(np.random.default_rng(seed), for_augmentation=False)

    n_real = len(ds)
    plot_ids = list(ds.plot_ids)

    if exported is None and plot_bucket and plot_bucket > 0:
        ds = ds.pad_plots(-(-n_real // plot_bucket) * plot_bucket)

    pred = None
    if exported is not None:
        # the artifact's envelope does its own chunk+pad; plot_bucket is moot
        pred = exported.predict(
            np.asarray(ds.pos), np.asarray(ds.feat), np.asarray(ds.mask)
        )
    elif engine and not parity:
        from dl_biomass_tpu.models.inference import compile_dataset_inference

        try:
            # whole directory in ONE device dispatch (scanned serving):
            # per-batch dispatch latency dominates directory-scale serving on
            # this backend (measured at 288 plots x 7168 pts: 268 clouds/s
            # per-batch-sync, 381 pipelined, 978 scanned)
            serve_ds = compile_dataset_inference(
                model, {"params": params, "batch_stats": batch_stats}
            )
            pred = serve_ds(ds, batch_size)
        except NotImplementedError:
            pred = None  # non-flagship architecture: model.apply below
    if pred is None:
        pred = predict_dataset(model, params, batch_stats, ds, batch_size)
    pred = pred[:n_real]  # rows are in plot order; drop bucket padding

    df = pd.DataFrame(pred, columns=list(BIOMASS_COLUMNS), index=plot_ids)
    df.index.name = "PlotID"
    df["tree_btphr"] = df[list(BIOMASS_COLUMNS)].sum(axis=1)
    if out_csv:
        os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
        df.to_csv(out_csv)
    return df


def watch_directory(
    model_dir: str,
    in_dir: str,
    out_csv: str,
    *,
    poll_seconds: float = 10.0,
    max_polls: Optional[int] = None,
    model_file: Optional[str] = None,
    use_presampled: bool = True,
    num_points: int = 7168,
    use_columns: Optional[List[str]] = None,
    glob: str = "*.las",
    batch_size: int = 32,
    presampled_suffix: str = "_fps_7168",
    plot_bucket: int = 64,
    seed: int = 0,
    log_fn=print,
    export_path: Optional[str] = None,
) -> int:
    """Long-running serving: poll ``in_dir`` and predict plots not yet in
    ``out_csv``, appending rows as they arrive.

    The checkpoint, folded engine, and compiled serving computations stay
    warm in-process (with ``plot_bucket`` keeping arrival-batch shapes in a
    handful of buckets), so the marginal cost of a new plot is milliseconds —
    vs a fresh CLI start per arrival paying model load + compile-cache reads.
    Restart-safe: already-written PlotIDs are loaded from ``out_csv`` and
    skipped. Returns the number of plots predicted.

    ``export_path``: serve from an AOT artifact (models/export.py) instead of
    a checkpoint — the daemon then needs no flax/model code at all, and the
    artifact's fixed envelope replaces ``plot_bucket`` shape bucketing.
    """
    import time

    from dl_biomass_tpu.eval.testing import load_model_for_eval, predict_dataset
    from dl_biomass_tpu.models.inference import compile_dataset_inference

    use_columns = use_columns or ["intensity_normalized"]
    exported = None
    if export_path is not None:
        from dl_biomass_tpu.models.export import load_serving

        exported = load_serving(export_path)
        serve_ds = None
        log_fn(f"watching {in_dir!r} with exported artifact {export_path}")
    else:
        model, params, batch_stats, path = load_model_for_eval(model_dir, model_file)
        log_fn(f"watching {in_dir!r} with model {path}")
        variables = {"params": params, "batch_stats": batch_stats}
        try:
            serve_ds = compile_dataset_inference(model, variables)
        except NotImplementedError:
            serve_ds = None  # non-flagship architecture: model.apply below

    seen: set = set()
    if os.path.exists(out_csv):
        seen = set(pd.read_csv(out_csv, usecols=["PlotID"])["PlotID"].astype(str))
        log_fn(f"resuming: {len(seen)} plots already in {out_csv}")
    else:
        os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
        with open(out_csv, "w") as f:
            f.write("PlotID," + ",".join(BIOMASS_COLUMNS) + ",tree_btphr\n")

    def make_fileset():
        import glob as _glob

        names = [os.path.basename(p) for p in
                 _glob.glob(os.path.join(in_dir, glob))]
        prefixes = sorted({n.split(".")[0][:2] for n in names}) or ["BC"]
        if use_presampled:
            from dl_biomass_tpu.io.dataset import PointCloudsInFilesPreSampled

            return _targetless(PointCloudsInFilesPreSampled(
                in_dir, glob, dataset=prefixes, use_column=use_columns[0],
                presampled_suffix=presampled_suffix,
            ))
        from dl_biomass_tpu.io.dataset import PointCloudsInFiles

        return _targetless(PointCloudsInFiles(
            in_dir, glob, max_points=num_points, use_columns=use_columns,
            filter_height=0.2, dataset=prefixes,
        ))

    total = 0
    polls = 0
    while True:
        fileset = make_fileset()
        fileset.files = [
            f for i, f in enumerate(fileset.files)
            if fileset.plot_id(i) not in seen
        ]
        if fileset.files:
            if use_presampled:
                ds = fileset.load_all(for_augmentation=False)
            else:
                ds = fileset.load_all(np.random.default_rng(seed),
                                      for_augmentation=False)
            n_real = len(ds)
            ids = list(ds.plot_ids)
            if exported is None and plot_bucket and plot_bucket > 0:
                ds = ds.pad_plots(-(-n_real // plot_bucket) * plot_bucket)
            if exported is not None:
                pred = exported.predict(
                    np.asarray(ds.pos), np.asarray(ds.feat), np.asarray(ds.mask)
                )
            elif serve_ds is not None:
                pred = serve_ds(ds, batch_size)
            else:
                pred = predict_dataset(model, params, batch_stats, ds, batch_size)
            pred = np.asarray(pred[:n_real], np.float32)
            with open(out_csv, "a") as f:
                for pid, row in zip(ids, pred):
                    f.write(f"{pid}," + ",".join(f"{v}" for v in row)
                            + f",{row.sum()}\n")
            seen.update(ids)
            total += n_real
            log_fn(f"predicted {n_real} new plots ({total} total)")
        polls += 1
        if max_polls is not None and polls >= max_polls:
            return total
        time.sleep(poll_seconds)
