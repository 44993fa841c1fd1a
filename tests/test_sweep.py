"""Sweep tests: study API (pure python) + vmapped trials (jax)."""

import numpy as np
import pytest

from dl_biomass_tpu.sweep import (
    GridSampler,
    MedianPruner,
    RandomSampler,
    TPESampler,
    TrialPruned,
    TrialState,
    create_study,
    load_study,
)


class TestStudyAPI:
    def test_optimize_and_best_trial(self):
        study = create_study(direction="minimize", sampler=RandomSampler(0), pruner=None)

        def objective(trial):
            x = trial.suggest_float("x", -5, 5)
            return (x - 2.0) ** 2

        study.optimize(objective, n_trials=30)
        assert len(study.trials) == 30
        assert abs(study.best_params["x"] - 2.0) < 2.0
        assert study.best_value < 4.0

    def test_tpe_beats_random_on_quadratic(self):
        def objective(trial):
            x = trial.suggest_float("x", 0, 10)
            y = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
            return (x - 7.0) ** 2 + (np.log10(y) + 3) ** 2

        tpe = create_study(sampler=TPESampler(seed=1, n_startup_trials=8), pruner=None)
        tpe.optimize(objective, n_trials=60)
        # TPE should concentrate samples near the optimum after startup
        late = [t.params["x"] for t in tpe.trials[40:]]
        assert abs(np.median(late) - 7.0) < 2.5
        assert tpe.best_value < 0.5

    def test_suggest_int_and_categorical(self):
        study = create_study(sampler=RandomSampler(3), pruner=None)

        def objective(trial):
            b = trial.suggest_int("batch_size", 8, 40, step=4)
            act = trial.suggest_categorical("act", ["ReLU", "ELU"])
            assert b % 4 == 0 and 8 <= b <= 40
            assert act in ("ReLU", "ELU")
            return float(b)

        study.optimize(objective, n_trials=20)
        assert study.best_value == min(t.value for t in study.trials)

    def test_pruning(self):
        study = create_study(sampler=RandomSampler(0),
                             pruner=MedianPruner(n_startup_trials=2))
        calls = {"pruned": 0}

        def objective(trial):
            x = trial.suggest_float("x", 0, 1)
            for step in range(10):
                trial.report(x * 10 + step * 0.01, step)
                if trial.should_prune():
                    calls["pruned"] += 1
                    raise TrialPruned()
            return x * 10

        study.optimize(objective, n_trials=20)
        pruned = study.get_trials(states=[TrialState.PRUNED])
        assert len(pruned) == calls["pruned"] > 0
        # pruned trials never beat the best completed one
        assert study.best_trial.state == TrialState.COMPLETE

    def test_persistence_roundtrip(self, tmp_path):
        study = create_study(sampler=RandomSampler(0), pruner=None, study_name="s1")
        study.optimize(lambda t: t.suggest_float("x", 0, 1) ** 2, n_trials=5)
        p = str(tmp_path / "study.json")
        study.save(p)
        loaded = load_study(p)
        assert loaded.study_name == "s1"
        assert len(loaded.trials) == 5
        assert loaded.best_value == study.best_value
        assert loaded.best_params == study.best_params

    def test_trials_dataframe_and_importances(self):
        study = create_study(sampler=RandomSampler(0), pruner=None)

        def objective(trial):
            x = trial.suggest_float("x", 0, 1)
            noise = trial.suggest_float("noise", 0, 1)
            return x * 100 + noise * 0.001

        study.optimize(objective, n_trials=25)
        df = study.trials_dataframe()
        assert set(df.columns) >= {"number", "value", "state", "params_x", "params_noise"}
        imp = study.get_param_importances()
        assert imp["x"] > imp["noise"]  # x dominates the objective

    def test_grid_sampler(self):
        grid = GridSampler({"lr": [0.1, 0.2], "wd": [1e-4, 1e-3]})
        study = create_study(sampler=grid, pruner=None)

        def objective(trial):
            lr = trial.suggest_float("lr", 0.0, 1.0)
            wd = trial.suggest_float("wd", 0.0, 1.0)
            return lr + wd

        study.optimize(objective, n_trials=4)
        seen = {(t.params["lr"], t.params["wd"]) for t in study.trials}
        assert seen == {(0.1, 1e-4), (0.1, 1e-3), (0.2, 1e-4), (0.2, 1e-3)}

    def test_grid_sampler_stops_when_exhausted(self):
        """n_trials beyond the grid size must stop at the grid, not silently
        re-run duplicate configurations."""
        grid = GridSampler({"lr": [0.1, 0.2]})
        study = create_study(sampler=grid, pruner=None)
        study.optimize(lambda t: t.suggest_float("lr", 0.0, 1.0), n_trials=10)
        assert len(study.trials) == 2

    def test_pruner_none_disables_pruning(self):
        """pruner=None is the NopPruner analog; only the not-given default
        gets the MedianPruner (the CLI's --no-pruning relies on this)."""
        assert create_study(pruner=None).pruner is None
        assert isinstance(create_study().pruner, MedianPruner)

    def test_median_pruner_maximize_uses_best_so_far(self):
        """Under maximize, a trial judged by its WORST epoch would be pruned
        even while improving past the median — best-so-far must be used."""
        study = create_study(direction="maximize", sampler=RandomSampler(0),
                             pruner=MedianPruner(n_startup_trials=1,
                                                 n_warmup_steps=1))

        def flat(trial):
            trial.suggest_float("x", 0.0, 1.0)
            for step in range(3):
                trial.report(0.5, step)
            return 0.5

        study.optimize(flat, n_trials=2)

        def improving(trial):
            trial.suggest_float("x", 0.0, 1.0)
            vals = [0.1, 0.9]
            for step, v in enumerate(vals):
                trial.report(v, step)
                if trial.should_prune():
                    from dl_biomass_tpu.sweep.study import TrialPruned

                    raise TrialPruned()
            return vals[-1]

        study.optimize(improving, n_trials=1)
        assert study.trials[-1].state.value == "COMPLETE"
        assert study.trials[-1].value == 0.9


class TestVmappedSweep:
    def test_parallel_trials_differ_and_learn(self):
        import jax

        from dl_biomass_tpu.io.device_data import DeviceDataset
        from dl_biomass_tpu.io.synthetic import synthetic_dataset
        from dl_biomass_tpu.models import PointNet2Regressor
        from dl_biomass_tpu.sweep.vmapped import VmappedSweep

        pos, feat, y, ids = synthetic_dataset(8, 128, seed=0)
        ds = DeviceDataset.from_clouds(pos, feat, y, ids, base_n=128)
        model = PointNet2Regressor(num_features=1)
        sweep = VmappedSweep(
            model, lrs=[3e-3, 1e-8], wds=[1e-5, 1e-5], patience=5
        )
        results = sweep.run(ds, ds, key=jax.random.key(0), batch_size=4, num_epochs=3,
                            log_fn=lambda s: None)
        assert len(results) == 2
        # the real-lr trial must beat the dead-lr trial on synthetic data
        assert results[0].best_val_mse < results[1].best_val_mse
        assert all(np.isfinite(r.best_val_mse) for r in results)


class TestMeshShardedSweep:
    def test_trial_axis_sharded_and_matches_unsharded(self):
        """Trials shard over all 8 mesh devices; results match the unsharded
        run (embarrassingly-parallel — no collectives, same math)."""
        import jax

        from dl_biomass_tpu.io.device_data import DeviceDataset
        from dl_biomass_tpu.io.synthetic import synthetic_dataset
        from dl_biomass_tpu.models import PointNet2Regressor
        from dl_biomass_tpu.parallel.mesh import make_mesh
        from dl_biomass_tpu.sweep.vmapped import VmappedSweep

        pos, feat, y, ids = synthetic_dataset(8, 128, seed=0)
        ds = DeviceDataset.from_clouds(pos, feat, y, ids, base_n=128)
        model = PointNet2Regressor(num_features=1)
        lrs = [10 ** u for u in np.linspace(-4, -2, 8)]
        wds = [1e-5] * 8
        mesh = make_mesh(dp=4, mp=2)

        runs = {}
        for name, m in (("single", None), ("mesh", mesh)):
            sweep = VmappedSweep(model, lrs=lrs, wds=wds, patience=5, mesh=m)
            if m is not None:
                state = sweep.init_states(jax.random.key(0),
                                          next(ds.batches(4)))
                # every (T, ...) state leaf actually spans all 8 devices
                leaf = jax.tree.leaves(state["params"])[0]
                assert len(leaf.sharding.device_set) == 8
                assert not leaf.sharding.is_fully_replicated
            runs[name] = sweep.run(ds, ds, key=jax.random.key(0), batch_size=4,
                                   num_epochs=2, log_fn=lambda s: None)
        for a, b in zip(runs["single"], runs["mesh"]):
            # partitioning changes XLA's reduction tiling -> f32 reassociation,
            # compounded over the training epochs (measured ~9e-4 after the
            # split-first-layer matmul reordering)
            np.testing.assert_allclose(a.best_val_mse, b.best_val_mse,
                                       rtol=3e-3)

    def test_indivisible_trials_rejected(self):
        from dl_biomass_tpu.models import PointNet2Regressor
        from dl_biomass_tpu.parallel.mesh import make_mesh
        from dl_biomass_tpu.sweep.vmapped import VmappedSweep

        with pytest.raises(ValueError, match="divisible"):
            VmappedSweep(PointNet2Regressor(num_features=1),
                         lrs=[1e-3] * 3, wds=[1e-5] * 3,
                         mesh=make_mesh(dp=8, mp=1))


class TestBestHPFromCSV:
    def test_loads_newest_and_best_row(self, tmp_path):
        import pandas as pd

        from dl_biomass_tpu.sweep.study import load_best_hp_from_csv

        pd.DataFrame([
            dict(number=0, value=5.0, state="COMPLETE", params_lr=0.1, params_batch_size=8),
            dict(number=1, value=2.0, state="COMPLETE", params_lr=0.01, params_batch_size=16),
            dict(number=2, value=None, state="PRUNED", params_lr=0.5, params_batch_size=4),
        ]).to_csv(tmp_path / "a_trials.csv", index=False)
        best = load_best_hp_from_csv(str(tmp_path))
        assert best["lr"] == 0.01 and best["batch_size"] == 16 and best["value"] == 2.0

    def test_missing_folder_raises(self, tmp_path):
        import pytest as _pytest

        from dl_biomass_tpu.sweep.study import load_best_hp_from_csv

        with _pytest.raises(FileNotFoundError):
            load_best_hp_from_csv(str(tmp_path / "nope"))


class TestOptimizeCatch:
    """Optuna-parity ``catch``: a raising objective marks the trial FAILED
    and the study continues (the tune --catch-failures path — an
    environment fault costs one trial, not the run)."""

    def test_catch_continues_study(self):
        from dl_biomass_tpu.sweep.study import TrialState, create_study

        calls = []

        def objective(trial):
            x = trial.suggest_float("x", 0.0, 1.0)
            calls.append(x)
            if len(calls) == 2:
                raise RuntimeError("boom")
            return x

        study = create_study(direction="minimize")
        study.optimize(objective, n_trials=4, catch=(RuntimeError,))
        states = [t.state for t in study.trials]
        assert len(states) == 4
        assert states.count(TrialState.FAIL) == 1
        assert states.count(TrialState.COMPLETE) == 3
        assert study.best_trial.state == TrialState.COMPLETE

    def test_default_still_raises(self):
        from dl_biomass_tpu.sweep.study import create_study

        def objective(trial):
            trial.suggest_float("x", 0.0, 1.0)
            raise RuntimeError("boom")

        study = create_study(direction="minimize")
        import pytest as _pytest
        with _pytest.raises(RuntimeError):
            study.optimize(objective, n_trials=2)
