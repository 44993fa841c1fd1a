"""Generate a synthetic LAS corpus with the reference's on-disk layout.

The reference's real plots (BC Gov / Romeo-Malette / Petawawa LAS files +
a plot-biomass CSV, reference ``pointcloud_dataloader.py:47-131`` /
``main.py:55-61``) are not shipped; this tool materializes the same layout
from the procedural generator (``io/synthetic.py``) so the full pipeline —
raw LAS -> offline FPS resample -> presampled dataset -> train -> eval ->
predict — can run end to end on disk artifacts, exactly like a user of the
reference would.

Layout written:
  OUT/train/  OUT/val/  OUT/test/      {BC,RM,PF}_*.las  (raw clouds with an
                                        ``intensity`` dimension)
  OUT/biomass.csv                       PlotID + 4 *_btphr component columns

Usage:
  python tools/make_corpus.py --out /tmp/data_12k --plots 288 --points 12288
  # then (per split) the package resampler produces the presampled artifacts:
  python -m dl_biomass_tpu resample --in-dir /tmp/data_12k/train \
      --out-dir /tmp/data_12k/fps7168_train --num-points 7168 --format las
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_biomass_tpu.io.dataset import BIOMASS_COLUMNS
from dl_biomass_tpu.io.reader import write_las
from dl_biomass_tpu.io.synthetic import synthetic_plot


def make_corpus(out_dir: str, num_plots: int, n_points: int, seed: int = 0,
                splits=(("train", 2 / 3), ("val", 1 / 6), ("test", 1 / 6))):
    rng = np.random.default_rng(seed)
    sources = ("BC", "RM", "PF")
    rows = []
    counts = [int(round(num_plots * f)) for _, f in splits]
    counts[0] = num_plots - sum(counts[1:])
    i = 0
    for (split, _), count in zip(splits, counts):
        d = os.path.join(out_dir, split)
        os.makedirs(d, exist_ok=True)
        for _ in range(count):
            coords, intensity, biomass = synthetic_plot(rng, n_points)
            pid = f"{sources[i % 3]}_{i:04d}"
            write_las(coords, os.path.join(d, f"{pid}.las"),
                      {"intensity": intensity.astype(np.uint16)})
            rows.append((pid, *biomass))
            i += 1
        print(f"{split}: {count} plots -> {d}")
    import csv

    with open(os.path.join(out_dir, "biomass.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["PlotID", *BIOMASS_COLUMNS])
        w.writerows(rows)
    print(f"biomass table: {len(rows)} rows -> {out_dir}/biomass.csv")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--plots", type=int, default=288)
    p.add_argument("--points", type=int, default=12288)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    make_corpus(a.out, a.plots, a.points, a.seed)
