// Native point-cloud ops for the host-side (CPU) paths of dl_biomass_tpu.
//
// The reference relies on compiled extensions for its compute-critical ops
// (torch_cluster CUDA kernels for fps/radius/knn; SURVEY.md §2.3). The TPU
// framework's device path uses Pallas kernels; THIS library is the native
// engine for host-side tooling where the reference used slow numpy loops:
//   * exact farthest-point sampling for the offline resampler
//     (reference downsampling_point_clouds.py:55-92 — O(N*k) numpy loop),
//   * ball query / kNN for CPU-side validation and the historical
//     knn_interpolate decoder,
//   * voxel-grid downsampling for the density-ablation path.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>
#include <unordered_map>
#include <vector>

extern "C" {

// Exact FPS seeded at `start`; writes k indices to out. Matches
// dl_biomass_tpu.ops.reference.fps_numpy (min-dist update + argmax, selected
// points excluded from re-selection).
void fps(const double* pos, int64_t n, int64_t k, int64_t start, int32_t* out) {
  std::vector<double> dists(n, std::numeric_limits<double>::infinity());
  int64_t last = start;
  out[0] = static_cast<int32_t>(start);
  dists[start] = -std::numeric_limits<double>::infinity();
  for (int64_t i = 1; i < k; ++i) {
    const double lx = pos[last * 3], ly = pos[last * 3 + 1], lz = pos[last * 3 + 2];
    double best = -std::numeric_limits<double>::infinity();
    int64_t arg = 0;
    for (int64_t j = 0; j < n; ++j) {
      const double dx = pos[j * 3] - lx, dy = pos[j * 3 + 1] - ly, dz = pos[j * 3 + 2] - lz;
      const double d = dx * dx + dy * dy + dz * dz;
      if (d < dists[j]) dists[j] = d;
      if (dists[j] > best) { best = dists[j]; arg = j; }
    }
    out[i] = static_cast<int32_t>(arg);
    dists[arg] = -std::numeric_limits<double>::infinity();
    last = arg;
  }
}

// First-K-by-index in-radius neighbors (inclusive boundary), like
// ops/ballquery.py. idx_out (m*k) int32, mask_out (m*k) uint8.
void ball_query(const double* centers, int64_t m, const double* pos, int64_t n,
                double radius, int64_t k, int32_t* idx_out, uint8_t* mask_out) {
  const double r2 = radius * radius;
  for (int64_t i = 0; i < m; ++i) {
    int64_t cnt = 0;
    const double cx = centers[i * 3], cy = centers[i * 3 + 1], cz = centers[i * 3 + 2];
    for (int64_t j = 0; j < n && cnt < k; ++j) {
      const double dx = pos[j * 3] - cx, dy = pos[j * 3 + 1] - cy, dz = pos[j * 3 + 2] - cz;
      if (dx * dx + dy * dy + dz * dz <= r2) {
        idx_out[i * k + cnt] = static_cast<int32_t>(j);
        mask_out[i * k + cnt] = 1;
        ++cnt;
      }
    }
    for (int64_t t = cnt; t < k; ++t) {
      idx_out[i * k + t] = 0;
      mask_out[i * k + t] = 0;
    }
  }
}

// Exact kNN (brute force, partial selection) — backs the historical
// knn_interpolate feature-propagation decoder (Misc/Lukas_OG_Scripts).
void knn(const double* queries, int64_t m, const double* pos, int64_t n,
         int64_t k, int32_t* idx_out, double* dist_out) {
  std::vector<std::pair<double, int64_t>> best(k);
  for (int64_t i = 0; i < m; ++i) {
    int64_t filled = 0;
    double worst = std::numeric_limits<double>::infinity();
    const double cx = queries[i * 3], cy = queries[i * 3 + 1], cz = queries[i * 3 + 2];
    for (int64_t j = 0; j < n; ++j) {
      const double dx = pos[j * 3] - cx, dy = pos[j * 3 + 1] - cy, dz = pos[j * 3 + 2] - cz;
      const double d = dx * dx + dy * dy + dz * dz;
      if (filled < k) {
        best[filled++] = {d, j};
        if (filled == k) {
          std::make_heap(best.begin(), best.end());
          worst = best.front().first;
        }
      } else if (d < worst) {
        std::pop_heap(best.begin(), best.end());
        best[k - 1] = {d, j};
        std::push_heap(best.begin(), best.end());
        worst = best.front().first;
      }
    }
    std::sort(best.begin(), best.begin() + filled);
    for (int64_t t = 0; t < filled; ++t) {
      idx_out[i * k + t] = static_cast<int32_t>(best[t].second);
      dist_out[i * k + t] = std::sqrt(best[t].first);
    }
  }
}

// Voxel-grid downsample: first point per occupied voxel, ascending index
// order. Returns count; indices in out (caller allocates n).
int64_t voxel_downsample(const double* pos, int64_t n, double voxel,
                         int32_t* out) {
  struct Key { int64_t x, y, z;
    bool operator==(const Key& o) const { return x == o.x && y == o.y && z == o.z; } };
  struct H { size_t operator()(const Key& k) const {
    return static_cast<size_t>(k.x * 73856093LL ^ k.y * 19349663LL ^ k.z * 83492791LL); } };
  std::unordered_map<Key, int64_t, H> seen;
  seen.reserve(static_cast<size_t>(n));
  int64_t cnt = 0;
  for (int64_t j = 0; j < n; ++j) {
    Key key{static_cast<int64_t>(std::floor(pos[j * 3] / voxel)),
            static_cast<int64_t>(std::floor(pos[j * 3 + 1] / voxel)),
            static_cast<int64_t>(std::floor(pos[j * 3 + 2] / voxel))};
    if (seen.emplace(key, j).second) out[cnt++] = static_cast<int32_t>(j);
  }
  return cnt;
}

}  // extern "C"
