"""Recorded-fixture parity pathway (VERDICT r2 item 8).

The committed fixture corpus (tests/data/parity_fixture: 6 tiny LAS plots +
biomass CSV + frozen parity-mode predictions) freezes the complete
LAS-bytes -> prediction pipeline. A drift anywhere — LAS decode, height
filter, intensity normalization, sampling, centering quirks, parity model
math — fails the replay. When a real corpus drops, the cross-framework check
is `python -m dl_biomass_tpu parity-record/-check` (see eval/recorded.py).
"""

import json
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "data", "parity_fixture")
CSV = os.path.join(FIX, "biomass.csv")
REC = os.path.join(FIX, "recorded.json")


def test_recorded_fixture_replays_exactly():
    from dl_biomass_tpu.eval.recorded import check_parity

    d = check_parity(FIX, CSV, REC)
    # same machine + cached build: replay should be bit-exact or nearly so
    assert d < 5e-4


def test_recording_catches_semantic_drift(tmp_path):
    """A perturbed recording must fail — the tolerance actually bites."""
    from dl_biomass_tpu.eval.recorded import check_parity

    with open(REC) as f:
        rec = json.load(f)
    pid = sorted(rec["predictions"])[0]
    rec["predictions"][pid][0] += 0.05  # way past rtol on O(1) predictions
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(rec))
    with pytest.raises(AssertionError, match="drifted"):
        check_parity(FIX, CSV, str(bad))


def test_record_roundtrip(tmp_path):
    """record_parity -> check_parity on a fresh recording is self-consistent."""
    from dl_biomass_tpu.eval.recorded import check_parity, record_parity

    out = tmp_path / "rec.json"
    rec = record_parity(FIX, CSV, str(out), num_points=256, seed=3)
    assert len(rec["predictions"]) == 6
    assert all(np.isfinite(v).all() for v in map(np.asarray, rec["predictions"].values()))
    assert check_parity(FIX, CSV, str(out)) < 5e-4


def test_fixture_exercises_the_quirk_paths():
    """The committed corpus must keep exercising the branches it was built
    for: sub-512-pt cloud (with-replacement sampling) and sub-filter points."""
    from dl_biomass_tpu.io.reader import read_las

    n_small = 0
    for name in sorted(os.listdir(FIX)):
        if not name.endswith(".las"):
            continue
        coords = read_las(os.path.join(FIX, name), filter_height=0)
        filtered = read_las(os.path.join(FIX, name), filter_height=0.2)
        assert len(filtered) < len(coords), f"{name}: no points under the height filter"
        if len(filtered) < 512:
            n_small += 1
    assert n_small >= 1, "fixture lost its with-replacement sampling case"
