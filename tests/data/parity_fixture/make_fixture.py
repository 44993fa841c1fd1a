"""Generate the committed parity fixture corpus (run once, outputs committed).

Six tiny synthetic plots (2 per BC/RM/PF dataset prefix) with realistic LAS
structure: u16 intensity, some points under the 0.2 m height filter, one cloud
under 512 points (exercises the with-replacement sampling branch). Regenerate
with ``python tests/data/parity_fixture/make_fixture.py`` ONLY when the fixture
itself must change — the recorded.json must then be re-frozen via
``python -m dl_biomass_tpu parity-record`` on the CPU backend.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    from dl_biomass_tpu.io import las as lascodec

    rng = np.random.default_rng(2024)
    rows = ["PlotID,bark_btphr,branch_btphr,foliage_btphr,wood_btphr"]
    for i, (prefix, n) in enumerate(
        [("BC", 900), ("BC", 1400), ("RM", 700), ("RM", 430), ("PF", 1100), ("PF", 820)]
    ):
        pid = f"{prefix}_{i:03d}"
        xy = rng.normal(size=(n, 2)) * 6.0
        z = np.abs(rng.gamma(2.0, 3.0, size=n)) * 0.9  # canopy-ish heights
        # guarantee ground returns under the 0.2 m filter in EVERY plot so the
        # height-filter branch stays exercised
        n_ground = max(n // 40, 4)
        z[rng.choice(n, n_ground, replace=False)] = rng.uniform(0.0, 0.18, size=n_ground)
        coords = np.column_stack([xy[:, 0] + 470000.0, xy[:, 1] + 5500000.0, z])
        intensity = rng.integers(40, 3000, size=n).astype(np.uint16)
        hdr = lascodec.LasHeader(version=(1, 4), point_format=6)
        hdr.scales = np.asarray([0.001, 0.001, 0.001])
        hdr.offsets = np.floor(coords.mean(axis=0))
        lascodec.write(os.path.join(HERE, pid + ".las"), coords, header=hdr,
                       intensity=intensity)
        bio = np.round(np.abs(rng.normal(size=4)) * 30 + 2, 3)
        rows.append(f"{pid},{bio[0]},{bio[1]},{bio[2]},{bio[3]}")
    with open(os.path.join(HERE, "biomass.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote 6 LAS plots + biomass.csv under {HERE}")


if __name__ == "__main__":
    main()
