"""Headline benchmark: clouds/sec/chip at ~10k points (train + infer).

BASELINE.json's metric is "Clouds/sec/chip at 10k pts (train + infer)" with a
>=10x-the-reference-GPU target. The reference never recorded throughput
(SURVEY.md §6) and its torch/PyG stack is not installed here, so vs_baseline is
computed against a documented estimate:

  REFERENCE_GPU_CLOUDS_PER_SEC = 50.0
  PointNet++ SSG fwd+bwd at ~10k pts/cloud on a single V100/RTX-class GPU with
  torch_cluster fps+radius kernels runs ~20-25 ms/cloud => ~40-50 clouds/s;
  we take the favourable end. (The reference's *actual* end-to-end rate was far
  lower — it re-read the biomass CSV per sample inside __getitem__ — so this is
  a conservative baseline.)

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline", ...}
the MOMENT the two headline computations (B=36 train + eval step) are
measured, then re-prints a superset of that line as each optional stage
(serving engine, b16 point, bulk serving) lands — so whichever line the
driver parses (first or last), it carries the headline, and a cold-compile
stall in a later stage costs detail, never the number. A global deadline
(env BENCH_DEADLINE_S, default 1500 s) skips remaining optional stages.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_CLOUDS_PER_SEC = 50.0

# Headline batch = 36, the reference's OWN operating point (main.py:41; its HP
# search spans 8-40). Per-step fixed cost (~1.7 ms: sequential FPS argmax
# chain + kernel-launch floors) is batch-invariant and amortizes with batch —
# measured ms-per-16-clouds: 33.7 at B=16 vs 31.4 at B=36 (tools/batch_sweep).
# B=16 (rounds 1-2's reporting point) is still measured and reported alongside.
B_HEAD = 36  # clouds per step (headline)
B = 16  # rounds 1-2 reporting point; also the config-row batch
N = 10240  # ~10k pts, lane-aligned
TIMED_STEPS = 8
REPEATS = 5  # best-of: the axon tunnel adds ~10% run-to-run drift; the floor
# over more windows is the machine-capability number (3 windows measured
# 499-503 clouds/s across runs — drift, not change)

# v5e single-chip peaks for the standing MFU / %-of-HBM-roofline fields
# (tools/roofline.py uses the same constants). These judge the step against
# the MACHINE, not only the reference estimate: a future round's delta is
# visible as movement toward the roofline rather than a stack-change artifact.
V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def _roofline_fields(trainer, state, batch, train_dt: float, eval_dt: float) -> dict:
    """Standing MFU / HBM-roofline fields from XLA cost analysis of the two
    headline computations (VERDICT r4 item 3).

    ``*_hbm_roofline_pct`` = (bytes accessed / 819 GB/s) / measured step time:
    the fraction of the step that a perfectly-streamed HBM transfer of the
    program's own traffic would take — 100% means the step IS the HBM floor.
    ``*_mfu_pct`` = model FLOPs / (197 bf16 TFLOP/s * step time). Both use the
    compiled TPU executable's own cost analysis (same computation the timings
    ran; the persistent cache makes the lower+compile a no-op)."""
    key = jax.random.key(1)
    out = {}
    for name, fn, args, dt in [
        ("train", trainer._train_step, (state, batch, key), train_dt),
        ("eval", trainer._eval_step, (state.params, state.batch_stats, batch),
         eval_dt),
    ]:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):  # older jax returns a per-device list
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bts = float(ca.get("bytes accessed", 0.0))
        if dt > 0 and flops > 0:
            out[f"{name}_mfu_pct"] = round(flops / V5E_BF16_FLOPS / dt * 100, 2)
        if dt > 0 and bts > 0:
            out[f"{name}_hbm_roofline_pct"] = round(
                bts / V5E_HBM_BPS / dt * 100, 2)
    if out:
        out["roofline_note"] = (
            "pct of v5e peaks (197 bf16 TFLOP/s, 819 GB/s) consumed by the "
            "compiled step's own cost-analysis FLOPs/bytes at the measured "
            "time; hbm pct ~100 means the step sits on the HBM roofline"
        )
    return out


def _make_batch(rng, b, n, f=1):
    from dl_biomass_tpu.core.cloud import CloudBatch

    return CloudBatch(
        pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 5, jnp.float32),
        feat=jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32),
        mask=jnp.ones((b, n), bool),
        y=jnp.asarray(rng.normal(size=(b, 4)), jnp.float32),
    )


def _enable_cache():
    """Persistent compile cache for EVERY bench path (incl. --config 0,
    which never initializes a device)."""
    from dl_biomass_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()


def _time_train(trainer, state, batch, steps=TIMED_STEPS, repeats=1):
    """Warmup + best-of-``repeats`` chained-step windows; the ONE home of the
    train-step timing discipline (all steps chain through ``state``, one host
    sync per window — see the block_until_ready caveat in _measure_point).
    Returns ``(seconds_per_step, final_state)``."""
    key = jax.random.key(1)
    state, loss = trainer._train_step(state, batch, key)
    float(loss)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(steps):
            state, loss = trainer._train_step(state, batch, jax.random.fold_in(key, i))
        float(loss)  # all steps chain through `state`; reading the last syncs all
        best = min(best, (time.perf_counter() - t0) / steps)
    return best, state


def bench_config0() -> None:
    """BASELINE configs[0]: SSG regressor, 1024-pt clouds, CPU fwd/bwd."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    b, n = 8, 1024
    batch = _make_batch(rng, b, n)
    cfg = TrainConfig(hp=HyperParams(batch_size=b))
    cfg.model.compute_dtype = "float32"
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    dt, _ = _time_train(trainer, state, batch, steps=4)
    print(json.dumps({
        "metric": "config0_cpu_fwd_bwd_1024pts", "value": round(b / dt, 2),
        "unit": "clouds/s", "train_ms_per_step": round(dt * 1000, 2),
        "batch": b, "points_per_cloud": n, "device": "cpu",
    }))


def bench_config1() -> None:
    """BASELINE configs[1]: 10k-pt training with on-the-fly augs (2 augs, b=12)."""
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.io.device_data import DeviceDataset
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    b, n, plots = 12, 10240, 24
    ds = DeviceDataset.from_clouds(
        [rng.normal(size=(n, 3)).astype(np.float32) * 5 for _ in range(plots)],
        [rng.normal(size=(n, 1)).astype(np.float32) for _ in range(plots)],
        rng.normal(size=(plots, 4)).astype(np.float32),
        [f"RM_{i:03d}" for i in range(plots)],
    )
    cfg = TrainConfig(hp=HyperParams(batch_size=b, num_augs=2))
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    example = next(ds.batches(b))
    state = trainer.init_state(jax.random.key(0), example)
    key = jax.random.key(1)

    def epoch(ep, state):
        # the production epoch path: scan-over-steps (whole epoch as one
        # dispatch; Trainer.fit's default when handed datasets)
        state, _, clouds = trainer.train_epoch_scan(
            state, ds, jax.random.fold_in(key, ep), batch_size=b, num_augs=2
        )
        return state, clouds

    state, _ = epoch(0, state)  # warm/compile
    state, _ = epoch(1, state)  # steady state
    t0 = time.perf_counter()
    state, clouds = epoch(2, state)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "config1_train_10k_with_augs", "value": round(clouds / dt, 2),
        "unit": "clouds/s (incl. on-device augmentation)",
        "batch": b, "points_per_cloud": n, "num_augs": 2,
        "device": str(jax.devices()[0]),
    }))


def bench_config2() -> None:
    """BASELINE configs[2]: doubled-radius + multi-scale-grouping SA variant."""
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    batch = _make_batch(rng, B, N)
    out = {}
    for name, msg, dbl in [("doubled_radius", False, True), ("msg", True, False)]:
        cfg = TrainConfig(hp=HyperParams(batch_size=B))
        cfg.model.msg = msg
        cfg.model.doubled_radius = dbl
        model = build_model(cfg, num_features=1)
        trainer = Trainer(model, cfg)
        state = trainer.init_state(jax.random.key(0), batch)
        dt, _ = _time_train(trainer, state, batch)
        out[name] = {"clouds_per_sec": round(B / dt, 2),
                     "train_ms_per_step": round(dt * 1000, 2)}
    print(json.dumps({
        "metric": "config2_msg_doubled_radius", "value": out["msg"]["clouds_per_sec"],
        "unit": "clouds/s", **out, "batch": B, "points_per_cloud": N,
        "device": str(jax.devices()[0]),
    }))


def bench_config3() -> None:
    """BASELINE configs[3]: vmapped parallel HP trials (lr x wd grid)."""
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.io.device_data import DeviceDataset
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.sweep.vmapped import VmappedSweep

    rng = np.random.default_rng(0)
    trials, b, n, plots = 8, 8, 4096, 16
    ds = DeviceDataset.from_clouds(
        [rng.normal(size=(n, 3)).astype(np.float32) * 5 for _ in range(plots)],
        [rng.normal(size=(n, 1)).astype(np.float32) for _ in range(plots)],
        rng.normal(size=(plots, 4)).astype(np.float32),
        [f"RM_{i:03d}" for i in range(plots)],
    )
    cfg = TrainConfig(hp=HyperParams(batch_size=b))
    model = build_model(cfg, num_features=1)
    lrs = [10 ** u for u in np.linspace(-4, -2, trials)]
    wds = [1e-4] * trials
    sweep = VmappedSweep(model, lrs, wds)
    example = next(ds.batches(b))
    state = sweep.init_states(jax.random.key(0), example)
    active = jnp.ones(trials, bool)
    key = jax.random.key(1)

    def run_epoch(ep, state):
        loss = None
        steps = 0
        for i, batch in enumerate(ds.batches(b, key=jax.random.fold_in(key, ep), shuffle=True)):
            keys = jax.random.split(jax.random.fold_in(key, ep * 100 + i), trials)
            state, loss = sweep._train_step(state, sweep.lrs, sweep.wds, active, keys, batch)
            steps += 1
        float(jnp.sum(loss))
        return state, steps

    state, _ = run_epoch(0, state)
    t0 = time.perf_counter()
    state, steps = run_epoch(1, state)
    dt = time.perf_counter() - t0
    trial_clouds = trials * steps * b
    print(json.dumps({
        "metric": "config3_vmapped_sweep", "value": round(trial_clouds / dt, 2),
        "unit": "trial-clouds/s (8 parallel trials)", "trials": trials,
        "batch": b, "points_per_cloud": n, "device": str(jax.devices()[0]),
    }))


def bench_config4() -> None:
    """BASELINE configs[4]: inference at 1k-50k raw pts/cloud, with voxel
    downsampling bringing every cloud to the model's 10k-pt envelope first
    (the reference's density workflow: downsample, then infer — running the
    SA stack on a raw 50k cloud would materialize a 6.7 GB edge tensor)."""
    from dl_biomass_tpu.core.cloud import CloudBatch
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    b, n_model = 8, 10240
    cfg = TrainConfig(hp=HyperParams(batch_size=b))
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    warm = _make_batch(rng, b, n_model)
    state = trainer.init_state(jax.random.key(0), warm)
    loss, _ = trainer._eval_step(state.params, state.batch_stats, warm)
    float(loss)  # ONE compiled shape serves every density

    # Round 5 (VERDICT r4 item 4): the voxel downsample runs ON DEVICE
    # (ops/voxelize.voxel_select_first — selection-identical to the host
    # io/resample.voxel_downsample, parity-pinned) fused into ONE jitted
    # downsample+pack+infer computation per batch, and CH calls are chained
    # per host sync. The round-4 host-side row (numpy voxel pass + per-rep
    # transfer + single dispatch) was tunnel-noise-bound: 10k-raw swung
    # 89-153 clouds/s across runs with the device eval inside stable.
    from dl_biomass_tpu.ops.voxelize import voxel_select_first

    ch = 4  # chained calls per sync (device executes queued in order)

    def make_step(n_raw):
        @jax.jit
        def step(params, batch_stats, raw):  # raw (b, n_raw, 3) f32
            if n_raw > n_model:
                idx, msk = voxel_select_first(
                    raw, jnp.ones(raw.shape[:2], bool),
                    voxel_size=0.35, n_keep=n_model)
                pos = jnp.take_along_axis(raw, idx[..., None], axis=1)
                pos = jnp.where(msk[..., None], pos, 0.0)
            elif n_raw < n_model:
                pos = jnp.pad(raw, ((0, 0), (0, n_model - n_raw), (0, 0)))
                msk = jnp.pad(jnp.ones(raw.shape[:2], bool),
                              ((0, 0), (0, n_model - n_raw)))
            else:
                pos, msk = raw, jnp.ones(raw.shape[:2], bool)
            batch = CloudBatch(pos=pos, feat=pos[..., :1] * 0, mask=msk,
                               y=jnp.zeros((b, 4), jnp.float32))
            loss, out = trainer._eval_step(params, batch_stats, batch)
            return loss, jnp.sum(msk[0])

        return step

    rows = {}
    for n_raw in (1024, 5120, 10240, 51200):
        raw_np = (rng.normal(size=(b, n_raw, 3)) * 5).astype(np.float32)
        step = make_step(n_raw)
        loss, kept = step(state.params, state.batch_stats, jnp.asarray(raw_np))
        float(loss)  # compile
        dt = float("inf")
        for _rep in range(5):
            t0 = time.perf_counter()
            losses = []
            for _ in range(ch):
                # fresh transfer per chained call: each batch pays its own
                # host->device move, as a real pipeline would
                raw = jnp.asarray(raw_np)
                loss, kept = step(state.params, state.batch_stats, raw)
                losses.append(loss)
            float(sum(losses))  # one sync bounds the chained queue
            dt = min(dt, (time.perf_counter() - t0) / ch)
        rows[str(n_raw)] = {
            "clouds_per_sec": round(b / dt, 2),
            "end_to_end_ms_per_batch8": round(dt * 1000, 2),
            "kept_points": int(kept),
        }
    print(json.dumps({
        "metric": "config4_inference_density_sweep", "value": rows["10240"]["clouds_per_sec"],
        "unit": "clouds/s at 10k raw pts (on-device downsample+infer)",
        "by_raw_points": rows,
        "pipeline_note": (
            "device-native: voxel_select_first + pack + eval in one jitted "
            "dispatch; per-batch host transfer timed; selection parity with "
            "the host voxel_downsample pinned by test"
        ),
        "device": str(jax.devices()[0]),
    }))


def _require_device(timeout_s: int = 180) -> None:
    """Fail fast instead of hanging forever when the axon tunnel is dark.

    A dead tunnel makes even ``jax.devices()`` block indefinitely (observed
    round 3: multi-hour outage, main thread parked in nanosleep). Backend
    init in a daemon thread + bounded join turns that into a clean nonzero
    exit the driver can see."""
    import os
    import sys
    import threading

    _enable_cache()
    ok = []
    err = []

    def init():
        try:
            ok.append(jax.devices())
        except Exception as e:  # report the real error, not a fake timeout
            err.append(e)

    t = threading.Thread(target=init, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok:
        msg = (
            f"backend init failed: {type(err[0]).__name__}: {err[0]}" if err
            else f"backend did not initialize within {timeout_s}s (axon tunnel down?)"
        )
        print(f"FATAL: {msg} — no measurement possible", file=sys.stderr)
        os._exit(3)


def _measure_point(b: int, with_engine: bool = True) -> dict:
    """Train/eval/engine timings at batch ``b`` (best-of-REPEATS windows)."""
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b, N)
    cfg = TrainConfig(hp=HyperParams(batch_size=b))
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    key = jax.random.key(1)

    # warmup / compile. NOTE: on this backend block_until_ready returns before
    # execution finishes (async-dispatch artifact) — only a host transfer truly
    # synchronizes, so every timing boundary pulls a scalar to host.
    # The tunneled chip shows ~10% run-to-run drift, so take the best of
    # REPEATS timed windows — the floor is the machine-capability number.
    train_dt, state = _time_train(trainer, state, batch, repeats=REPEATS)

    # inference: device executes queued programs in order, so syncing the last
    # call's output (a real host transfer) bounds all of them — same
    # methodology as the chained train steps, without per-call dispatch latency
    loss, out = trainer._eval_step(state.params, state.batch_stats, batch)
    float(loss)
    eval_dt = float("inf")
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        losses = []
        for i in range(TIMED_STEPS):
            loss, out = trainer._eval_step(state.params, state.batch_stats, batch)
            losses.append(loss)
        float(sum(losses))
        eval_dt = min(eval_dt, (time.perf_counter() - t0) / TIMED_STEPS)

    # serving engine timing lives in _measure_engine (an optional bench
    # stage since round 4 — a cold engine compile must not delay the
    # headline line).
    engine_dt = float("inf")
    if with_engine:
        engine_dt = _measure_engine(b, model, state, batch=batch)
    return {
        "train_dt": train_dt,
        "eval_dt": eval_dt,
        "engine_dt": engine_dt,
        "infer_dt": min(eval_dt, engine_dt),
        "_model": model,  # reused by _measure_bulk_serving (underscore keys
        "_state": state,  # are not serialized into the JSON line)
        "_trainer": trainer,  # reused by the roofline-fields stage
        "_batch": batch,
    }


def _measure_engine(b: int, model, state, batch=None) -> float:
    """Folded-weight serving engine (models/inference.py) seconds/step at
    batch ``b`` — BN/bias folded into the matmuls, the flat pre-folded graph
    a production deployment ships. Returns inf if the path is unavailable
    (a remote-compile failure must not sink the benchmark)."""
    engine_dt = float("inf")
    if batch is None:
        batch = _make_batch(np.random.default_rng(0), b, N)
    try:
        from dl_biomass_tpu.models.inference import compile_inference

        infer_fn = compile_inference(
            model, {"params": state.params, "batch_stats": state.batch_stats}
        )
        float(jnp.sum(infer_fn(batch)))
        for rep in range(REPEATS):
            t0 = time.perf_counter()
            outs = []
            for i in range(TIMED_STEPS):
                outs.append(infer_fn(batch))
            float(sum(jnp.sum(o) for o in outs))
            engine_dt = min(engine_dt, (time.perf_counter() - t0) / TIMED_STEPS)
    except Exception as e:  # pragma: no cover - env-dependent
        import sys

        print(f"engine path unavailable ({e}); using _eval_step", file=sys.stderr)
    return engine_dt


def _measure_bulk_serving(b: int, s: int = 8, *, model=None, state=None):
    """Directory-scale serving: s*b clouds through compile_dataset_inference
    (the whole dataset in ONE scanned dispatch — what the predict CLI runs).
    Returns clouds/s, or None if the path is unavailable (guarded like the
    engine: a remote-compile failure must not sink the benchmark)."""
    try:
        from dl_biomass_tpu.core.config import HyperParams, TrainConfig
        from dl_biomass_tpu.io.device_data import DeviceDataset
        from dl_biomass_tpu.models.inference import compile_dataset_inference
        from dl_biomass_tpu.models.pointnet2 import build_model
        from dl_biomass_tpu.train.trainer import Trainer

        rng = np.random.default_rng(0)
        p = s * b
        ds = DeviceDataset(
            rng.normal(size=(p, N, 3)).astype(np.float32) * 5.0,
            rng.normal(size=(p, N, 1)).astype(np.float32),
            np.ones((p, N), bool),
            np.zeros((p, 4), np.float32),
            [f"BC_{i:04d}" for i in range(p)],
            N,
        )
        if model is None or state is None:
            # standalone use only — main() passes _measure_point's model/state
            # to avoid a duplicate build + init compile
            cfg = TrainConfig(hp=HyperParams(batch_size=b))
            model = build_model(cfg, num_features=1)
            trainer = Trainer(model, cfg)
            state = trainer.init_state(jax.random.key(0), _make_batch(rng, b, N))
        serve = compile_dataset_inference(
            model, {"params": state.params, "batch_stats": state.batch_stats}
        )
        serve(ds, b)  # compile warmup
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            serve(ds, b)  # returns host numpy — intrinsically synced
            best = min(best, time.perf_counter() - t0)
        return p / best
    except Exception as e:  # pragma: no cover - env-dependent
        import sys

        print(f"bulk-serving path unavailable ({e})", file=sys.stderr)
        return None


def main() -> None:
    """Headline first, extras as they land, bounded by a global deadline.

    Round 3's official capture (BENCH_r03) died rc=124/parsed=null: a
    cold-compile morning (remote compiles 15 s-5 min each, ~6 distinct
    computations) burned the driver's whole budget before the single JSON
    line at the end ever printed — even though the headline numbers existed
    minutes in. The fix is structural:

    1. Measure ONLY the two headline computations (B=36 train step + eval
       step) first — they get the cold compiles — and print the headline
       JSON line the moment they exist.
    2. Each optional stage (serving engine, b16 point, bulk serving)
       re-prints a SUPERSET line containing everything measured so far, so
       whichever line the driver parses (first or last) carries the
       headline, and a stall in any later stage can only cost detail.
    3. A global deadline (env BENCH_DEADLINE_S, default 1500 s) skips
       remaining optional stages — exit 0 with whatever was measured.
    """
    import os
    import sys
    import threading

    t_start = time.perf_counter()
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "1500"))

    def time_left() -> float:
        return deadline_s - (time.perf_counter() - t_start)

    # Last line of defense: a transient axon-tunnel stall can park ANY device
    # call indefinitely (observed live: the same warm-cache run completed in
    # 5 min once and hung past 10 min minutes later). The in-line deadline
    # checks can't fire while blocked in a C call, so a watchdog hard-exits
    # the process at deadline+grace — exit 0 if the headline line already
    # went out (the driver tails stdout; the number survives), else a clean
    # nonzero instead of eating the driver's whole capture budget.
    progress = {"headline": False, "finished": False}
    finished = threading.Event()

    def _watchdog():
        if not finished.wait(deadline_s + 180):
            print(
                "FATAL: bench watchdog fired (device call stalled past "
                f"{deadline_s:.0f}s+180s grace; axon tunnel hiccup?) — "
                + ("headline was already printed" if progress["headline"]
                   else "no headline was measured"),
                file=sys.stderr, flush=True,
            )
            # a watchdog-truncated capture must be DISTINGUISHABLE from a
            # clean run that measured fewer fields: re-print the superset
            # with an explicit marker + the stages the stall swallowed
            # (ADVICE r4). stdout so the driver's tail sees it.
            try:
                if progress["headline"] and progress.get("result") is not None:
                    final = dict(progress["result"])
                    final["watchdog_fired"] = True
                    final["watchdog_pending_stages"] = list(
                        progress.get("remaining", []))
                    print(json.dumps(final), flush=True)
            except Exception:  # racing main-thread mutation must never
                pass  # stop the hard exit — that IS the backstop
            os._exit(0 if progress["headline"] else 5)

    threading.Thread(target=_watchdog, daemon=True).start()

    _require_device()  # also enables the persistent compile cache

    # --- Stage A (required): the headline point. Cold compiles land HERE,
    # on exactly the two computations the headline needs.
    head = _measure_point(B_HEAD, with_engine=False)
    train_cps = B_HEAD / head["train_dt"]
    value = round(train_cps, 2)
    result = {
        "metric": "train_clouds_per_sec_per_chip_10k_pts",
        "value": value,
        "unit": "clouds/s",
        "vs_baseline": round(value / REFERENCE_GPU_CLOUDS_PER_SEC, 3),
        "infer_clouds_per_sec": round(B_HEAD / head["infer_dt"], 2),
        "train_ms_per_step": round(head["train_dt"] * 1000, 2),
        "infer_ms_per_step": round(head["infer_dt"] * 1000, 2),
        "infer_eval_step_ms": round(head["eval_dt"] * 1000, 2),
        "batch": B_HEAD,
        "points_per_cloud": N,
        "device": str(jax.devices()[0]),
        "baseline_estimate_note": (
            "reference GPU est. 50 clouds/s (see module docstring)"
        ),
        # the baseline is an estimate; report the break-even point so
        # the multiple isn't hostage to a single point value
        "baseline_sensitivity": (
            f"vs_baseline >= 10x holds for any reference baseline "
            f"<= {value / 10.0:.1f} clouds/s"
        ),
        "batch_note": (
            "headline at the reference's own operating point "
            "(batch 36, main.py:41); per-step fixed cost ~1.7 ms is "
            "batch-invariant — the b16 block is rounds 1-2's "
            "reporting point for progression comparability"
        ),
    }
    print(json.dumps(result), flush=True)  # the line that must survive
    progress["headline"] = True
    progress["result"] = result  # mutated in place by later stages; the
    # watchdog snapshots it for the marked superset line
    progress["remaining"] = ["roofline", "scan", "engine", "b16", "bulk_serve"]

    model, state = head.pop("_model"), head.pop("_state")
    trainer, hbatch = head.pop("_trainer"), head.pop("_batch")
    skipped = []

    # --- Stage A2 (cheap, no new compiles): MFU / %-of-HBM-roofline fields
    # from the already-compiled headline computations.
    if time_left() > 60:
        try:
            result.update(_roofline_fields(
                trainer, state, hbatch, head["train_dt"], head["eval_dt"]))
            print(json.dumps(result), flush=True)
        except Exception as e:  # pragma: no cover - env-dependent
            print(f"roofline stage failed ({e}); continuing", file=sys.stderr)
        progress["remaining"].remove("roofline")
    else:
        skipped.append("roofline")
        progress["remaining"].remove("roofline")

    # --- Stage A3 (optional): scan-path train rate. Trainer.fit's epochs run
    # steps under ONE lax.scan dispatch (train/trainer.py scan-over-steps);
    # the headline's chained-dispatch timing additionally pays the tunnel's
    # ~1.7 ms/step execute bubble. This field reports the production epoch
    # path's device rate at the same B=36 shape (headline unchanged).
    if time_left() > 120:
        try:
            import jax.numpy as _jnp
            from jax import lax as _lax

            @jax.jit
            def scan8(state, batch, key):
                def body(st, k):
                    st, loss = trainer._train_step(st, batch, k)
                    return st, loss
                return _lax.scan(body, state, jax.random.split(key, 8))

            st2, losses = scan8(state, hbatch, jax.random.key(7))
            float(_jnp.sum(losses))  # compile + sync
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                st2, losses = scan8(state, hbatch, jax.random.key(8))
                float(_jnp.sum(losses))
                best = min(best, (time.perf_counter() - t0) / 8)
            result["train_scan_clouds_per_sec"] = round(B_HEAD / best, 2)
            result["train_scan_ms_per_step"] = round(best * 1000, 2)
            print(json.dumps(result), flush=True)
        except Exception as e:  # pragma: no cover - env-dependent
            print(f"scan stage failed ({e}); continuing", file=sys.stderr)
        progress["remaining"].remove("scan")
    else:
        skipped.append("scan")
        progress["remaining"].remove("scan")

    # --- Stage B (optional): folded-weight serving engine at B=36.
    if time_left() > 120:
        try:
            engine_dt = _measure_engine(B_HEAD, model, state)
            if engine_dt != float("inf"):
                result["infer_engine_ms"] = round(engine_dt * 1000, 2)
                infer_dt = min(head["infer_dt"], engine_dt)
                result["infer_ms_per_step"] = round(infer_dt * 1000, 2)
                result["infer_clouds_per_sec"] = round(B_HEAD / infer_dt, 2)
            print(json.dumps(result), flush=True)
        except Exception as e:  # pragma: no cover - env-dependent
            print(f"engine stage failed ({e}); continuing", file=sys.stderr)
        progress["remaining"].remove("engine")
    else:
        skipped.append("engine")
        progress["remaining"].remove("engine")

    # --- Stage C (optional): the B=16 progression point.
    if time_left() > 120:
        try:
            alt = _measure_point(B, with_engine=False)
            alt.pop("_model"), alt.pop("_state")
            result["b16"] = {
                "train_clouds_per_sec": round(B / alt["train_dt"], 2),
                "train_ms_per_step": round(alt["train_dt"] * 1000, 2),
                "infer_clouds_per_sec": round(B / alt["infer_dt"], 2),
                "infer_ms_per_step": round(alt["infer_dt"] * 1000, 2),
            }
            print(json.dumps(result), flush=True)
        except Exception as e:  # pragma: no cover - env-dependent
            print(f"b16 stage failed ({e}); continuing", file=sys.stderr)
        progress["remaining"].remove("b16")
    else:
        skipped.append("b16")
        progress["remaining"].remove("b16")

    # --- Stage D (optional): directory-scale serving (288 clouds, one
    # scanned dispatch — the predict CLI's path, ALL dispatch overhead in).
    if time_left() > 120:
        try:
            serve_cps = _measure_bulk_serving(B_HEAD, model=model, state=state)
            if serve_cps:
                result["bulk_serve_clouds_per_sec"] = round(serve_cps, 2)
            print(json.dumps(result), flush=True)
        except Exception as e:  # pragma: no cover - env-dependent
            print(f"bulk-serve stage failed ({e}); continuing", file=sys.stderr)
        progress["remaining"].remove("bulk_serve")
    else:
        skipped.append("bulk_serve")
        progress["remaining"].remove("bulk_serve")

    if skipped:
        result["skipped_stages"] = skipped
        result["deadline_note"] = (
            f"deadline {deadline_s:.0f}s reached; optional stages skipped "
            "(headline unaffected)"
        )
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1].startswith("--config"):
        # BASELINE.json "configs" rows: bench.py --config N (0..4)
        try:
            n = int(sys.argv[1].split("=")[-1]) if "=" in sys.argv[1] else int(sys.argv[2])
        except (IndexError, ValueError):
            print("usage: bench.py --config N  (N in 0..4)", file=sys.stderr)
            sys.exit(2)
        if not 0 <= n <= 4:
            print(f"unknown config {n}: valid configs are 0..4", file=sys.stderr)
            sys.exit(2)
        if n != 0:  # config 0 is CPU-only by definition
            _require_device()
        else:
            _enable_cache()
        [bench_config0, bench_config1, bench_config2, bench_config3,
         bench_config4][n]()
    else:
        main()  # headline metric (the driver's entry — one JSON line)
