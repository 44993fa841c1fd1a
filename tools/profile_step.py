"""Per-op device profile of the flagship train/eval steps.

Captures a ``jax.profiler`` trace of a few hard-synced steps, then aggregates
the device-track event durations by HLO op name so the step's milliseconds can
be attributed line-by-line (the data behind docs/BENCHMARKS.md's profile
tables).

Usage: python tools/profile_step.py [train|eval|engine] [B] [N]
Set PROFILE_FUSED_SA=1 to profile the fused-SA-kernel path.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

STEPS = 6


def build(b, n):
    from dl_biomass_tpu.core.cloud import CloudBatch
    from dl_biomass_tpu.core.config import HyperParams, TrainConfig
    from dl_biomass_tpu.models.pointnet2 import build_model
    from dl_biomass_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    batch = CloudBatch(
        pos=jnp.asarray(rng.normal(size=(b, n, 3)) * 5, jnp.float32),
        feat=jnp.asarray(rng.normal(size=(b, n, 1)), jnp.float32),
        mask=jnp.ones((b, n), bool),
        y=jnp.asarray(rng.normal(size=(b, 4)), jnp.float32),
    )
    cfg = TrainConfig(hp=HyperParams(batch_size=b))
    if os.environ.get("PROFILE_FUSED_SA"):
        cfg.model.fused_sa = True
    model = build_model(cfg, num_features=1)
    trainer = Trainer(model, cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    return trainer, state, batch, model


def aggregate(logdir):
    """Sum device-track event durations by op name from the trace proto."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print(f"no trace.json.gz under {logdir}", file=sys.stderr)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid whose process name mentions TPU / device
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, nm in proc_names.items()
                if "TPU" in nm or "/device" in nm.lower() or "Device" in nm}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            # the "Steps" thread holds whole-step envelope events, not ops —
            # including them would double-count the entire step
            if thread_names.get((e["pid"], e.get("tid"))) == "Steps":
                continue
            nm = e.get("name", "?")
            tot[nm] += e["dur"]
            cnt[nm] += 1
    if not tot:
        print("no device events found; pids seen:", proc_names, file=sys.stderr)
        return
    grand = sum(tot.values())
    print(f"\n== device op totals over {STEPS} steps (us) — {grand/1000/STEPS:.2f} ms/step busy ==")
    for nm, us in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us/STEPS:10.1f} us/step  x{cnt[nm]//STEPS:<4d} {nm[:110]}")


def main(which="train", b=16, n=10240):
    trainer, state, batch, model = build(b, n)
    key = jax.random.key(1)
    if which == "train":
        def step(i, state):
            state, loss = trainer._train_step(state, batch, jax.random.fold_in(key, i))
            return state, loss
    elif which == "eval":
        def step(i, state):
            loss, _ = trainer._eval_step(state.params, state.batch_stats, batch)
            return state, loss
    else:  # engine
        from dl_biomass_tpu.models.inference import compile_inference

        fn = compile_inference(model, {"params": state.params,
                                       "batch_stats": state.batch_stats})

        def step(i, state):
            return state, jnp.sum(fn(batch))

    state, loss = step(0, state)  # compile
    float(jnp.sum(loss))
    logdir = f"/tmp/jaxtrace_{which}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    losses = []
    for i in range(STEPS):
        state, loss = step(i, state)
        losses.append(jnp.sum(loss))
    float(sum(losses))  # hard sync inside the trace window
    jax.profiler.stop_trace()
    aggregate(logdir)


if __name__ == "__main__":
    args = sys.argv[1:]
    which = args[0] if args else "train"
    rest = [int(a) for a in args[1:]]
    main(which, *rest)
