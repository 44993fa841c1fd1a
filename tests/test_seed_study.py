"""Multi-seed numerics study harness (experiments/seed_study.py).

Smoke-level: a tiny corpus + short runs must produce the full result schema
(per-run rows + per-mode mean/sd summaries) that seed_study_r3.json — the
evidence behind the fast_fps production default — was generated with.
"""

import numpy as np
import pytest

from dl_biomass_tpu.experiments.seed_study import run_seed_study


@pytest.mark.slow  # ~45 s: four real (tiny) training runs
def test_seed_study_schema_and_summary(tmp_path):
    out = tmp_path / "study.json"
    res = run_seed_study(
        [0, 1],
        modes=("production", "parity"),
        num_plots=12,
        n_points=128,
        batch_size=4,
        num_augs=0,
        max_epochs=2,
        patience=2,
        out_json=str(out),
        log_fn=lambda s: None,
    )
    assert out.exists()
    assert len(res["runs"]) == 4
    for row in res["runs"]:
        assert row["mode"] in ("production", "parity")
        assert row["epochs"] >= 1
        assert np.isfinite(row["min_val_mse"])
        assert len(row["r2_components"]) == 4
    for mode in ("production", "parity"):
        s = res["summary"][mode]
        assert s["val_mse_sd"] >= 0.0
        assert np.isfinite(s["r2_total_mean"])
    # the two modes trained on the SAME corpus slice: config block records it
    assert res["config"]["seeds"] == [0, 1]
