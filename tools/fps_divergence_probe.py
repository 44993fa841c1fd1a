"""Root-cause probe for the exact-FPS production divergence (VERDICT r3 #3).

``seed_study_r3.json`` row (mode=production: bf16 + stratified SA1 + exact
ball query + EXACT FPS, seed=1) diverged: val MSE 738.8, never descended,
early-stopped at epoch 11. No production+fast_fps or parity run diverged.

That run predates commit e363e52's PRNG domain-separation fix: per-batch
augmentation keys were derived ``fold_in(key, b0)``, which COLLIDES with the
trainer's per-step ``fold_in(key, i)`` at step 0 (b0 == i == 0) — so step
0's augmentation jitter/rotation draws were exactly correlated with the same
step's dropout mask draw, every epoch. This probe distinguishes "unlucky
init" from "the collision did it" by rerunning the exact row:

    python tools/fps_divergence_probe.py --seed 1                # HEAD keys
    python tools/fps_divergence_probe.py --seed 1 --old-keys     # pre-fix keys

``--old-keys`` simulates the pre-e363e52 derivation exactly: it patches
``jax.random.fold_in`` so folding the AUG domain tag is the identity, making
every augmentation key land where it did before the fix (the tag is folded
eagerly, outside jit, so the patch is complete).

Reference anchor: the early-stop rule in play is the reference's
(``main.py:226-235``); the augmentation chain is ``augmentation.py:54-122``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--mode", default="production",
                   help="seed-study mode (production = exact FPS)")
    p.add_argument("--old-keys", action="store_true",
                   help="simulate the pre-e363e52 aug-key collision")
    p.add_argument("--out", default=None, help="append result row to this JSON list")
    args = p.parse_args()

    from dl_biomass_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.old_keys:
        import jax.random as jrandom

        from dl_biomass_tpu.io.device_data import AUG_KEY_DOMAIN

        _orig_fold_in = jrandom.fold_in

        def fold_in(key, data):
            if isinstance(data, int) and data == AUG_KEY_DOMAIN:
                return key  # pre-fix: no domain tag -> akey = fold_in(key, b0)
            return _orig_fold_in(key, data)

        jrandom.fold_in = fold_in

    from dl_biomass_tpu.experiments.seed_study import run_seed_study

    res = run_seed_study([args.seed], [args.mode])
    row = res["runs"][0]
    row["old_keys"] = args.old_keys
    print(json.dumps(row))
    if args.out:
        import os

        rows = []
        if os.path.exists(args.out):
            with open(args.out) as f:
                rows = json.load(f)
        rows.append(row)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
