"""Model evaluation entry point — parity with the reference ``test_model``
(``testing_model.py:15-330``).

Differences by design:
  * "newest model" = newest Orbax checkpoint by epoch in ``model_dir`` (the
    reference picks the newest ``.model`` pickle by ctime);
  * the model is rebuilt from the checkpoint's ``model_config.json`` sidecar
    instead of unpickling a live module;
  * inference runs the whole test set through the jitted eval step in fixed-size
    batches (the reference stuffs the entire set into one batch).

Returns ``(metrics_df, results_df)`` and saves the four figure families as PNG.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from dl_biomass_tpu.eval.metrics import build_results_frame, metrics_table
from dl_biomass_tpu.eval.plots import plot_cloud_grid, save_all_eval_figures


def load_model_for_eval(model_dir: str, model_file: Optional[str] = None,
                        parity: bool = False):
    """Rebuild (model, params, batch_stats) from the newest (or given) ckpt.

    ``parity=True`` overrides the inference-speed knobs with the reference-
    exact ones (f32, exact first-K ball query, no stratified grouping) — the
    parameters are dtype-independent, so any checkpoint can be evaluated in
    parity mode."""
    import orbax.checkpoint as ocp

    from dl_biomass_tpu.models.pointnet2 import model_from_dict
    from dl_biomass_tpu.train.checkpoint import latest_checkpoint

    path = model_file or latest_checkpoint(model_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {model_dir!r}")
    cfg_path = os.path.join(os.path.dirname(path), "model_config.json")
    with open(cfg_path) as f:
        sidecar = json.load(f)
    mdict = dict(sidecar["model"])
    if parity:
        # must match TrainConfig.apply_parity's model overrides exactly
        # (analytic_bn included: parity keeps the literal Linear->BN form)
        mdict.update(compute_dtype="float32", fast_group=False, fast_fps=False,
                     fused_sa=False, exact_selection=True, analytic_bn=False)
    model = model_from_dict(mdict)
    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(path)
    return model, raw["params"], raw.get("batch_stats", {}), path


def predict_dataset(model, params, batch_stats, ds, batch_size: int = 32) -> np.ndarray:
    """Deterministic predictions (P, 4) over a DeviceDataset, in plot order.

    ``model.apply`` semantics (this is the metrics/parity path — the folded
    serving engine lives in models/inference.py), but the whole dataset runs
    in ONE scanned dispatch: per-batch dispatch round trips dominate bulk
    prediction on a remote-dispatch backend."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from dl_biomass_tpu.io.device_data import _assemble_batch

    @partial(jax.jit, static_argnames=("base_n",))
    def run_all(params, batch_stats, pos, feat, mask, y, idxs, valids,
                *, base_n: int):
        def body(_, per):
            idx, valid = per
            zeros = jnp.zeros(idx.shape[0], bool)
            batch = _assemble_batch(pos, feat, mask, y, idx, zeros, valid,
                                    jax.random.key(0), base_n=base_n)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, train=False
            )
            return 0, out

        _, outs = jax.lax.scan(body, 0, (idxs, valids))
        return outs

    idxs, _, valids, _ = ds.epoch_spec_arrays(batch_size)
    outs = run_all(params, batch_stats, ds.pos, ds.feat, ds.mask, ds.y,
                   jnp.asarray(idxs), jnp.asarray(valids), base_n=ds.base_n)
    flat = np.asarray(outs).reshape(-1, outs.shape[-1])
    return flat[np.asarray(valids).reshape(-1)]


def test_model(
    model_file: Optional[str] = None,
    test_dataset_path: str = "",
    use_presampled: bool = True,
    point_cloud_vis: bool = False,
    use_columns: Optional[List[str]] = None,
    use_datasets: Optional[Sequence[str]] = None,
    num_points: int = 200,
    *,
    model_dir: str = "models_out",
    biomass_csv: Optional[str] = None,
    fig_out_dir: str = "figures_out",
    batch_size: int = 32,
    glob: str = "*.las",
    seed: int = 0,
    presampled_suffix: str = "_fps_7168",
    parity: bool = False,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    if use_datasets is None:
        use_datasets = ["BC", "RM", "PF"]
    if use_columns is None:
        use_columns = ["intensity_normalized"]

    model, params, batch_stats, path = load_model_for_eval(model_dir, model_file, parity=parity)
    print("Using model:", path)

    if use_presampled:
        from dl_biomass_tpu.io.dataset import PointCloudsInFilesPreSampled

        fileset = PointCloudsInFilesPreSampled(
            test_dataset_path, glob, dataset=use_datasets,
            use_column=use_columns[0], biomass_csv=biomass_csv,
            presampled_suffix=presampled_suffix,
        )
        ds = fileset.load_all(for_augmentation=False)
    else:
        from dl_biomass_tpu.io.dataset import PointCloudsInFiles

        fileset = PointCloudsInFiles(
            test_dataset_path, glob, max_points=num_points, use_columns=use_columns,
            filter_height=0.2, dataset=use_datasets, biomass_csv=biomass_csv,
        )
        ds = fileset.load_all(np.random.default_rng(seed), for_augmentation=False)

    pred = predict_dataset(model, params, batch_stats, ds, batch_size)
    obs = np.asarray(ds.y)
    df = build_results_frame(obs, pred, ds.plot_ids)
    mdf = metrics_table(df)
    print(mdf)

    save_all_eval_figures(df, mdf, fig_out_dir)

    if point_cloud_vis:
        from dl_biomass_tpu.io.reader import read_las

        rng = np.random.default_rng(seed)
        pick = rng.choice(len(ds.plot_ids), size=min(4, len(ds.plot_ids)), replace=False)
        coords_list = []
        for i in pick:
            las_path = os.path.join(test_dataset_path, ds.plot_ids[i] + ".las")
            if not os.path.exists(las_path):  # presampled names carry a suffix
                las_path = str(fileset.files[i])
            c = read_las(las_path, get_attributes=False, filter_height=0)
            use_idx = rng.choice(c.shape[0], num_points, replace=c.shape[0] < num_points)
            c = c[use_idx]
            coords_list.append(c - c.mean(axis=0))
        plot_cloud_grid(coords_list, os.path.join(fig_out_dir, "cloud_grid.png"))

    return mdf, df
