"""Command-line interface.

The reference is a pile of ``if __name__ == '__main__'`` scripts with hard-coded
Windows paths (``main.py``, ``testing_model.py``, ``hyperparameter_tuning.py``,
``downsampling_point_clouds.py``, ``point_density_effect.py``,
``Visualize_Augmentation.py``). Each becomes a subcommand:

    python -m dl_biomass_tpu train    --data.train_dir ... [--hp.lr 1e-3 ...]
    python -m dl_biomass_tpu evaluate --data.test_dir ... --model-dir ...
    python -m dl_biomass_tpu resample --in-dir ... --out-dir ... --method fps
    python -m dl_biomass_tpu sweep    --data.train_dir ... --lrs 1e-4,1e-3
    python -m dl_biomass_tpu density  --data.train_dir ...
    python -m dl_biomass_tpu visualize-aug --las file.las --out fig.png

Any config knob is overridable with dotted flags (``--hp.batch_size 16``).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List


from dl_biomass_tpu.core.config import TrainConfig as _TC

_TOP_LEVEL_KEYS = {f.name for f in __import__("dataclasses").fields(_TC)}


def _split_overrides(argv: List[str], known_flags) -> tuple:
    """Separate config overrides (dotted paths like ``--hp.lr`` or top-level
    TrainConfig fields like ``--num_epochs``) from the subcommand's own flags."""
    own, overrides = [], []
    i = 0
    while i < len(argv):
        a = argv[i]
        key = a[2:].split("=")[0] if a.startswith("--") else ""
        if a.startswith("--") and ("." in key or key in _TOP_LEVEL_KEYS):
            if "=" in a:
                overrides.append(a)
                i += 1
            else:
                overrides += [a, argv[i + 1] if i + 1 < len(argv) else ""]
                i += 2
        else:
            own.append(a)
            i += 1
    return own, overrides


def _load_cfg(args, overrides):
    from dl_biomass_tpu.core.config import TrainConfig

    cfg = TrainConfig.from_json(args.config) if getattr(args, "config", None) else TrainConfig()
    if overrides:
        cfg = cfg.with_overrides(overrides)
    if getattr(args, "parity", False):
        cfg = cfg.apply_parity()
    return cfg


def _load_train_val(cfg):
    from dl_biomass_tpu.io.dataset import PointCloudsInFiles, PointCloudsInFilesPreSampled
    import numpy as np

    d = cfg.data
    if d.use_presampled:
        mk = lambda path: PointCloudsInFilesPreSampled(
            path, d.glob, dataset=d.use_datasets, use_column=d.use_columns[0],
            biomass_csv=d.biomass_csv, presampled_suffix=d.presampled_suffix,
        ).load_all()
        return mk(d.train_dir), mk(d.val_dir)
    rng = np.random.default_rng(cfg.seed)
    mk = lambda path: PointCloudsInFiles(
        path, d.glob, max_points=cfg.hp.num_points, use_columns=d.use_columns,
        filter_height=cfg.hp.ground_filter_height, dataset=d.use_datasets,
        biomass_csv=d.biomass_csv,
    ).load_all(rng)
    return mk(d.train_dir), mk(d.val_dir)


def cmd_train(argv):
    p = argparse.ArgumentParser(prog="train")
    p.add_argument("--config")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--parity", action="store_true",
                   help="reference-exact numerics: f32 + exact first-K ball query")
    own, overrides = _split_overrides(argv, p)
    args = p.parse_args(own)
    cfg = _load_cfg(args, overrides)

    import jax

    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.parallel.mesh import make_mesh
    from dl_biomass_tpu.train.trainer import Trainer

    print(f"Dataset(s): {cfg.data.use_datasets}")
    print(f"Additional features used: {cfg.data.use_columns}")
    print(f"Using {cfg.hp.num_points} points per plot")
    print(f"Early stopping: {cfg.early_stopping}")
    print(f"Max number of epochs: {cfg.num_epochs}")
    print("\nHyperparameters:")
    for k, v in vars(cfg.hp).items():
        print(f"  {k}: {v}")

    ds_train, ds_val = _load_train_val(cfg)
    print(f"\n{len(ds_train)} train / {len(ds_val)} val plots "
          f"({1 + cfg.hp.num_augs}x train samples with augmentation)")

    mesh = make_mesh(cfg.mesh.dp, cfg.mesh.mp) if len(jax.devices()) > 1 else None
    model = build_model(cfg, num_features=ds_train.num_features)
    trainer = Trainer(model, cfg, mesh=mesh)
    key = jax.random.key(cfg.seed)
    state = trainer.init_state(key, next(ds_train.batches(cfg.hp.batch_size)))

    writer = None
    if args.tensorboard:
        from dl_biomass_tpu.utils.tboard import SummaryWriter

        writer = SummaryWriter(comment=f"_{cfg.hp.num_points}_pts_lr_{cfg.hp.lr}")

    os.makedirs(cfg.model_dir, exist_ok=True)
    hist = trainer.fit(
        state,
        ds_train,  # DeviceDataset directly -> fused assemble+train step
        ds_val,
        key=key,
        csv_path=os.path.join(cfg.model_dir, "training_log.csv"),
        checkpoint_dir=cfg.model_dir,
        metric_writer=writer,
    )
    from dl_biomass_tpu.eval.plots import plot_mse_curves

    plot_mse_curves(os.path.join(cfg.model_dir, "training_log.csv"),
                    os.path.join(cfg.model_dir, "mse_curves.png"))
    print(f"\nBest val MSE: {hist['best_val_mse']:.4f} "
          f"(mean {sum(hist['clouds_per_sec'])/len(hist['clouds_per_sec']):.0f} clouds/s)")

    if cfg.data.test_dir:
        from dl_biomass_tpu.eval.testing import test_model

        test_model(
            test_dataset_path=cfg.data.test_dir, use_presampled=cfg.data.use_presampled,
            use_columns=cfg.data.use_columns, use_datasets=cfg.data.use_datasets,
            num_points=cfg.hp.num_points, model_dir=cfg.model_dir,
            biomass_csv=cfg.data.biomass_csv,
            fig_out_dir=os.path.join(cfg.model_dir, "figures"),
            presampled_suffix=cfg.data.presampled_suffix,
        )


def cmd_evaluate(argv):
    p = argparse.ArgumentParser(prog="evaluate")
    p.add_argument("--config")
    p.add_argument("--parity", action="store_true",
                   help="reference-exact numerics: f32 + exact first-K ball query")
    p.add_argument("--model-dir", default="models_out")
    p.add_argument("--model-file")
    p.add_argument("--fig-out-dir", default="figures_out")
    p.add_argument("--point-cloud-vis", action="store_true")
    own, overrides = _split_overrides(argv, p)
    args = p.parse_args(own)
    cfg = _load_cfg(args, overrides)

    from dl_biomass_tpu.eval.testing import test_model

    test_model(
        model_file=args.model_file,
        test_dataset_path=cfg.data.test_dir,
        use_presampled=cfg.data.use_presampled,
        point_cloud_vis=args.point_cloud_vis,
        use_columns=cfg.data.use_columns,
        use_datasets=cfg.data.use_datasets,
        num_points=cfg.hp.num_points,
        model_dir=args.model_dir,
        biomass_csv=cfg.data.biomass_csv,
        fig_out_dir=args.fig_out_dir,
        presampled_suffix=cfg.data.presampled_suffix,
        parity=args.parity,
    )


def cmd_resample(argv):
    p = argparse.ArgumentParser(prog="resample")
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--num-points", type=int, default=7168)
    p.add_argument("--method", choices=["random", "fps", "voxel"], default="fps")
    p.add_argument("--format", choices=["parquet", "las"], default="parquet")
    p.add_argument("--engine", choices=["auto", "tpu", "native", "numpy", "sectored"],
                   default="auto")
    p.add_argument("--check", action="store_true", help="render 4 random outputs")
    args = p.parse_args(argv)

    from dl_biomass_tpu.io.resample import check_resampling, resample_point_clouds

    written = resample_point_clouds(
        args.in_dir, args.out_dir, args.num_points, samp_meth=args.method,
        use_parquet=args.format == "parquet", engine=args.engine,
    )
    print(f"wrote {len(written)} files to {args.out_dir}")
    if args.check:
        check_resampling(args.out_dir, os.path.join(args.out_dir, "check_resampling.png"))


def cmd_sweep(argv):
    p = argparse.ArgumentParser(prog="sweep")
    p.add_argument("--config")
    p.add_argument("--lrs", default="1e-4,3e-4,1e-3,3e-3")
    p.add_argument("--wds", default="8.025e-5")
    p.add_argument("--batch-sizes", default="36")
    p.add_argument("--num-epochs", type=int, default=100)
    p.add_argument("--study-out", default="studies/sweep.json")
    own, overrides = _split_overrides(argv, p)
    args = p.parse_args(own)
    cfg = _load_cfg(args, overrides)

    import jax

    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.sweep import create_study
    from dl_biomass_tpu.sweep.vmapped import grid_sweep

    ds_train, ds_val = _load_train_val(cfg)
    model = build_model(cfg, num_features=ds_train.num_features)
    study = create_study(study_name="vmapped_sweep")
    lrs = [float(x) for x in args.lrs.split(",")]
    wds = [float(x) for x in args.wds.split(",")]
    results = grid_sweep(
        model, ds_train, ds_val, lrs=lrs, wds=wds,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        num_augs=cfg.hp.num_augs, num_epochs=args.num_epochs,
        patience=cfg.hp.patience, optimizer=cfg.hp.optimizer,
        key=jax.random.key(cfg.seed), study=study,
    )
    study.save(args.study_out)
    best = min(results, key=lambda r: r.best_val_mse)
    print(f"\nBest trial: lr={best.lr} wd={best.weight_decay} "
          f"batch={best.batch_size} -> val MSE {best.best_val_mse:.4f}")
    print(f"Study saved to {args.study_out}")
    df = study.trials_dataframe()
    df.to_csv(os.path.splitext(args.study_out)[0] + "_trials.csv", index=False)


def cmd_tune(argv):
    """Sequential TPE study over the reference's search space (the reference's
    ``hyperparameter_tuning.py`` surface; see ``sweep`` for the vmapped grid)."""
    p = argparse.ArgumentParser(prog="tune")
    p.add_argument("--config")
    p.add_argument("--n-trials", type=int, default=20)
    p.add_argument("--timeout", type=float, default=None, help="seconds")
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--study-out", default="studies/tune.json")
    p.add_argument("--continue-study", action="store_true")
    p.add_argument("--no-pruning", action="store_true")
    p.add_argument("--catch-failures", action="store_true",
                   help="mark a crashed trial FAILED and continue the study "
                        "(Optuna catch=(Exception,)) — e.g. a TPU worker "
                        "fault costs one trial, not the run")
    own, overrides = _split_overrides(argv, p)
    args = p.parse_args(own)
    cfg = _load_cfg(args, overrides)

    from dl_biomass_tpu.sweep import MedianPruner, TPESampler, create_study, load_study
    from dl_biomass_tpu.sweep.objective import make_training_objective
    from dl_biomass_tpu.sweep.study import newest_study

    ds_train, ds_val = _load_train_val(cfg)
    study = None
    if args.continue_study:
        prev = newest_study(os.path.dirname(args.study_out) or ".")
        if prev:
            study = load_study(prev, sampler=TPESampler(seed=cfg.seed),
                               pruner=None if args.no_pruning else MedianPruner())
            print(f"Continuing study: {prev} ({len(study.trials)} trials)")
    if study is None:
        study = create_study(sampler=TPESampler(seed=cfg.seed),
                             pruner=None if args.no_pruning else MedianPruner(),
                             study_name="tune")
    objective = make_training_objective(
        ds_train, ds_val, base_cfg=cfg, max_num_epochs=args.max_epochs, seed=cfg.seed
    )
    try:
        study.optimize(objective, n_trials=args.n_trials, timeout=args.timeout,
                   catch=(Exception,) if args.catch_failures else ())
    finally:
        # a failing trial re-raises out of optimize — persist the completed
        # trials either way (hours of search must survive one bad trial);
        # a save failure must not mask the trial's own exception
        try:
            study.save(args.study_out)
        except Exception as e:
            print(f"WARNING: could not save study to {args.study_out}: {e}",
                  file=sys.stderr)
    print("Best trial:")
    print("  Value: ", study.best_value)
    for k, v in study.best_params.items():
        print(f"    {k}: {v}")
    study.trials_dataframe().to_csv(os.path.splitext(args.study_out)[0] + "_trials.csv", index=False)
    imp = study.get_param_importances()
    print("Param importances:", {k: round(v, 3) for k, v in imp.items()})
    if imp:
        from dl_biomass_tpu.eval.plots import plot_param_importances

        # splitext, not str.replace: a suffix-less --study-out must not make the
        # PNG path collide with (and overwrite) the study JSON written above
        png = os.path.splitext(args.study_out)[0] + "_param_importances.png"
        plot_param_importances(imp, png)
        print(f"Wrote {png}")


def cmd_density(argv):
    p = argparse.ArgumentParser(prog="density")
    p.add_argument("--config")
    p.add_argument("--out-csv", default="point_density_effect.csv")
    p.add_argument("--range", default="500:10000:500")
    own, overrides = _split_overrides(argv, p)
    args = p.parse_args(own)
    cfg = _load_cfg(args, overrides)

    import numpy as np

    from dl_biomass_tpu.experiments.density import point_density_effect
    from dl_biomass_tpu.io.dataset import PointCloudsInFiles

    lo, hi, step = (int(x) for x in args.range.split(":"))
    # Training HPs: the reference ablation runs its own alternate tuned set
    # (point_density_effect.py:23-33), which is the default here (cfg=None).
    # But a user who passes --config or any --hp.* override is asking for
    # explicit control — silently ignoring those for the training inside the
    # ablation would be a trap, so pass the full config through in that case.
    hp_overridden = any(o.startswith("--hp.") for o in overrides)
    train_cfg = cfg if (args.config or hp_overridden) else None
    rng = np.random.default_rng(cfg.seed)
    fileset = PointCloudsInFiles(
        cfg.data.train_dir, cfg.data.glob, max_points=hi,
        use_columns=cfg.data.use_columns, filter_height=cfg.hp.ground_filter_height,
        dataset=cfg.data.use_datasets, biomass_csv=cfg.data.biomass_csv,
    )
    pos_list, feat_list, ys, ids = [], [], [], []
    for i in range(len(fileset)):
        item = fileset.get(i, rng)
        if item:
            pos_list.append(item[0]); feat_list.append(item[1])
            ys.append(item[2]); ids.append(item[3])
    point_density_effect(
        pos_list, feat_list, np.stack(ys), ids,
        point_range=range(lo, hi, step), out_csv=args.out_csv,
        cfg=train_cfg, num_epochs=cfg.num_epochs, seed=cfg.seed,
    )
    print(f"wrote {args.out_csv}")


def cmd_visualize_aug(argv):
    p = argparse.ArgumentParser(prog="visualize-aug")
    p.add_argument("--las", required=True)
    p.add_argument("--out", default="augmentation_vis.png")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from dl_biomass_tpu.experiments.visualize_augmentation import visualize_augmentation
    from dl_biomass_tpu.io.reader import read_las

    coords = read_las(args.las, get_attributes=False, filter_height=0)
    coords = coords - coords.mean(axis=0)
    visualize_augmentation(coords, out_path=args.out, seed=args.seed)
    print(f"wrote {args.out}")


def cmd_predict(argv):
    """Target-free serving: a directory of clouds -> a predictions CSV (the
    deployment path the reference never had — its eval always joins ground
    truth, testing_model.py:70-86)."""
    p = argparse.ArgumentParser(prog="predict")
    p.add_argument("--model-dir", default="models_out")
    p.add_argument("--model-file")
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out", required=True, help="predictions CSV path")
    p.add_argument("--glob", default="*.las")
    p.add_argument("--datasets", default=None,
                   help="comma-separated 2-char filename prefixes to keep "
                        "(default: every prefix present in --in-dir)")
    p.add_argument("--presampled", default="true",
                   help="true: already-resampled clouds (load all points); "
                        "false: raw LAS (height filter + random subsample)")
    p.add_argument("--num-points", type=int, default=7168)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--presampled-suffix", default="_fps_7168")
    p.add_argument("--parity", action="store_true",
                   help="reference-exact numerics (disables the serving engine)")
    p.add_argument("--no-engine", action="store_true",
                   help="use jitted model.apply instead of the folded engine")
    p.add_argument("--plot-bucket", type=int, default=64,
                   help="round the served plot count up to a multiple of this "
                        "so same-bucket directory sizes share one compiled "
                        "serving computation (0 disables)")
    p.add_argument("--from-export", default=None, metavar="DIR",
                   help="serve through an AOT artifact written by "
                        "`export-model` instead of a checkpoint (no model "
                        "rebuild or jit tracing; --model-dir is ignored)")
    p.add_argument("--watch", action="store_true",
                   help="keep running: poll --in-dir and append predictions "
                        "for newly arriving plots (restart-safe; the engine "
                        "stays warm in-process)")
    p.add_argument("--poll-seconds", type=float, default=10.0)
    p.add_argument("--max-polls", type=int, default=None,
                   help="stop after N polls (default: run until killed)")
    args = p.parse_args(argv)

    if args.watch:
        from dl_biomass_tpu.eval.predict import watch_directory

        n = watch_directory(
            args.model_dir, args.in_dir, args.out,
            poll_seconds=args.poll_seconds, max_polls=args.max_polls,
            model_file=args.model_file,
            use_presampled=args.presampled.lower() in ("1", "true", "yes"),
            num_points=args.num_points, glob=args.glob,
            batch_size=args.batch_size,
            presampled_suffix=args.presampled_suffix,
            plot_bucket=args.plot_bucket, export_path=args.from_export,
        )
        print(f"watch ended: {n} plots predicted -> {args.out}")
        return

    from dl_biomass_tpu.eval.predict import predict_directory

    df = predict_directory(
        args.model_dir, args.in_dir, args.out,
        model_file=args.model_file,
        use_presampled=args.presampled.lower() in ("1", "true", "yes"),
        use_datasets=args.datasets.split(",") if args.datasets else None,
        num_points=args.num_points, glob=args.glob,
        batch_size=args.batch_size, presampled_suffix=args.presampled_suffix,
        parity=args.parity, engine=not args.no_engine,
        plot_bucket=args.plot_bucket, export_path=args.from_export,
    )
    print(f"wrote {len(df)} predictions -> {args.out}")


def cmd_export_model(argv):
    """AOT serving export: checkpoint -> a portable StableHLO artifact that
    serves without model code (models/export.py). The TPU-native replacement
    for the reference's whole-module torch.save pickles (main.py:243-245,
    loadable only next to the exact source tree, testing_model.py:30-37)."""
    p = argparse.ArgumentParser(prog="export-model")
    p.add_argument("--model-dir", default="models_out")
    p.add_argument("--model-file")
    p.add_argument("--out", required=True, help="artifact directory to write")
    p.add_argument("--batch-size", type=int, default=36)
    p.add_argument("--num-points", type=int, default=7168,
                   help="served point-axis size; rounded up to the 128-lane "
                        "capacity the datasets produce")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets (default: the "
                        "current backend — export on the serving platform)")
    args = p.parse_args(argv)

    from dl_biomass_tpu.core.cloud import round_up
    from dl_biomass_tpu.eval.testing import load_model_for_eval
    from dl_biomass_tpu.models.export import export_serving

    model, params, batch_stats, path = load_model_for_eval(
        args.model_dir, args.model_file
    )
    print("Exporting model:", path)
    meta = export_serving(
        model, {"params": params, "batch_stats": batch_stats},
        batch_size=args.batch_size,
        num_points=round_up(args.num_points, 128),
        path=args.out,
        platforms=args.platforms.split(",") if args.platforms else None,
    )
    print(f"wrote artifact -> {args.out} "
          f"(platforms {meta['platforms']}, envelope "
          f"{meta['batch_size']}x{meta['num_points']}x{meta['num_features']})")


def cmd_parity_record(argv):
    p = argparse.ArgumentParser(prog="parity-record")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--biomass-csv", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model-dir", default=None,
                   help="checkpoint dir; omit for a deterministic seed init")
    p.add_argument("--num-points", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from dl_biomass_tpu.eval.recorded import record_parity

    rec = record_parity(args.data_dir, args.biomass_csv, args.out,
                        model_dir=args.model_dir, num_points=args.num_points,
                        seed=args.seed)
    print(f"recorded {len(rec['predictions'])} plots -> {args.out}")


def cmd_parity_check(argv):
    p = argparse.ArgumentParser(prog="parity-check")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--biomass-csv", required=True)
    p.add_argument("--recorded", required=True)
    p.add_argument("--model-dir", default=None)
    p.add_argument("--rtol", type=float, default=None)
    args = p.parse_args(argv)

    from dl_biomass_tpu.eval.recorded import DEFAULT_RTOL, check_parity

    d = check_parity(args.data_dir, args.biomass_csv, args.recorded,
                     model_dir=args.model_dir, rtol=args.rtol or DEFAULT_RTOL)
    print(f"parity OK: max relative delta {d:.2e}")


def cmd_seed_study(argv):
    p = argparse.ArgumentParser(prog="seed-study")
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--modes", default="production,production+fast_fps,parity")
    p.add_argument("--num-plots", type=int, default=288)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--max-epochs", type=int, default=40)
    # harness HP knobs (run_seed_study's training config; defaults mirror its
    # signature so omitting them is behavior-identical)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-augs", type=int, default=3)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--patience", type=int, default=8)
    p.add_argument("--neuron-multiplier", type=int, default=0,
                   help="SA/head width multiplier (reference constructor "
                        "knob; 0 = original architecture)")
    p.add_argument("--out", default="seed_study.json")
    args = p.parse_args(argv)

    from dl_biomass_tpu.experiments.seed_study import run_seed_study

    run_seed_study(
        list(range(args.seeds)), args.modes.split(","),
        num_plots=args.num_plots, n_points=args.num_points,
        batch_size=args.batch_size, num_augs=args.num_augs,
        lr=args.lr, patience=args.patience,
        neuron_multiplier=args.neuron_multiplier,
        max_epochs=args.max_epochs, out_json=args.out,
    )
    print(f"wrote {args.out}")


COMMANDS = {
    "train": cmd_train,
    "seed-study": cmd_seed_study,
    "evaluate": cmd_evaluate,
    "predict": cmd_predict,
    "export-model": cmd_export_model,
    "resample": cmd_resample,
    "sweep": cmd_sweep,
    "tune": cmd_tune,
    "density": cmd_density,
    "visualize-aug": cmd_visualize_aug,
    "parity-record": cmd_parity_record,
    "parity-check": cmd_parity_check,
}


def main(argv=None):
    # honor an explicit JAX_PLATFORMS from the environment at CONFIG level:
    # this host's sitecustomize pins jax_platforms="axon,cpu" via
    # jax.config.update, which MASKS the env var — so a caller exporting
    # JAX_PLATFORMS=cpu (tests, offline preprocessing) would still hit the
    # axon tunnel, and a dark tunnel hangs forever instead of falling back
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        # before any jax import: --help must not pay backend-init latency
        print(__doc__)
        return 0
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # every CLI process shares one persistent compile cache — without this a
    # fresh `evaluate` re-pays the remote compile (minutes) for shapes another
    # process built moments earlier
    from dl_biomass_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; options: {', '.join(COMMANDS)}")
        return 2
    COMMANDS[cmd](argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
