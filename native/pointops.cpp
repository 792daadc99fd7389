// pointops: native host-side point-cloud kernels for the data pipeline.
//
// The reference's only native component is a CUDA dwconv kernel
// (/root/reference/libs/dwconv/csrc/dwconv.cu); our TPU compute path
// covers that with XLA/Pallas. This library is the native runtime for
// the *host* side instead: the operations the reference does in Python/
// torch on CPU workers (voxel downsampling, Morton sorting, radius
// queries for tuple generation — datasets/*/processing_utils.py and
// generate_*_tuples.py) implemented in C++ for pipeline throughput.
//
// Build: see native/build.sh. Exposed via ctypes (C ABI, no pybind11).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Morton encoding (30-bit, depth <= 10), matching
// hotformerloc_tpu/octree/morton.py bit layout (x most significant).
// ---------------------------------------------------------------------
static inline uint32_t part1by2(uint32_t x) {
  x &= 0x3FF;
  x = (x | (x << 16)) & 0x030000FF;
  x = (x | (x << 8)) & 0x0300F00F;
  x = (x | (x << 4)) & 0x030C30C3;
  x = (x | (x << 2)) & 0x09249249;
  return x;
}

// points: (n, 3) float32 in [-1, 1]; keys out: (n,) int32
void morton_encode(const float* points, int64_t n, int32_t depth,
                   int32_t* keys) {
  const float scale = float(1u << (depth - 1));
  const int32_t lim = (1 << depth) - 1;
  for (int64_t i = 0; i < n; ++i) {
    int32_t u[3];
    for (int d = 0; d < 3; ++d) {
      float v = std::floor((points[i * 3 + d] + 1.0f) * scale);
      u[d] = std::min(std::max(int32_t(v), 0), lim);
    }
    keys[i] = int32_t((part1by2(u[0]) << 2) | (part1by2(u[1]) << 1) |
                      part1by2(u[2]));
  }
}

// argsort int32 keys; idx out: (n,) int64
void argsort_i32(const int32_t* keys, int64_t n, int64_t* idx) {
  for (int64_t i = 0; i < n; ++i) idx[i] = i;
  std::stable_sort(idx, idx + n, [keys](int64_t a, int64_t b) {
    return keys[a] < keys[b];
  });
}

// ---------------------------------------------------------------------
// Voxel downsample: mean of points per voxel (processing_utils.py:89).
// Returns number of voxels written (<= max_out).
// ---------------------------------------------------------------------
int64_t voxel_downsample(const float* points, int64_t n, float voxel,
                         float* out, int64_t max_out) {
  struct Acc { double s[3]; int64_t c; };
  std::unordered_map<uint64_t, Acc> vox;
  vox.reserve(size_t(n));
  for (int64_t i = 0; i < n; ++i) {
    int64_t gx = int64_t(std::floor(points[i * 3 + 0] / voxel));
    int64_t gy = int64_t(std::floor(points[i * 3 + 1] / voxel));
    int64_t gz = int64_t(std::floor(points[i * 3 + 2] / voxel));
    uint64_t key = (uint64_t(gx & 0x1FFFFF) << 42) |
                   (uint64_t(gy & 0x1FFFFF) << 21) |
                   uint64_t(gz & 0x1FFFFF);
    auto& a = vox[key];
    for (int d = 0; d < 3; ++d) a.s[d] += points[i * 3 + d];
    a.c += 1;
  }
  int64_t m = 0;
  for (auto& kv : vox) {
    if (m >= max_out) break;
    for (int d = 0; d < 3; ++d)
      out[m * 3 + d] = float(kv.second.s[d] / double(kv.second.c));
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------
// 2-D radius search over (easting, northing) positions with a uniform
// grid hash — the KDTree replacement for tuple generation
// (datasets/WildPlaces/generate_training_tuples.py:28-211).
// For each query i, writes indices of all points within `radius` of
// query into out[offsets[i] .. offsets[i+1]); two-pass API:
//   pass 1 (out == nullptr): fills counts (n_query,)
//   pass 2: fills out using caller-computed offsets.
// Excludes identical index self-matches only if exclude_self != 0 and
// the query set IS the point set (same pointer length semantics left to
// the caller via qidx_base offset).
// ---------------------------------------------------------------------
struct Grid2D {
  float cell;
  std::unordered_map<uint64_t, std::vector<int64_t>> cells;
  static uint64_t key(int64_t gx, int64_t gy) {
    return (uint64_t(gx & 0xFFFFFFFF) << 32) | uint64_t(gy & 0xFFFFFFFF);
  }
};

void radius_search_2d(const float* points, int64_t n, const float* queries,
                      int64_t nq, float radius, int64_t* counts,
                      int64_t* out, const int64_t* offsets) {
  Grid2D grid;
  grid.cell = radius > 0 ? radius : 1.0f;
  for (int64_t i = 0; i < n; ++i) {
    int64_t gx = int64_t(std::floor(points[i * 2] / grid.cell));
    int64_t gy = int64_t(std::floor(points[i * 2 + 1] / grid.cell));
    grid.cells[Grid2D::key(gx, gy)].push_back(i);
  }
  const float r2 = radius * radius;
  for (int64_t q = 0; q < nq; ++q) {
    const float qx = queries[q * 2], qy = queries[q * 2 + 1];
    int64_t gx = int64_t(std::floor(qx / grid.cell));
    int64_t gy = int64_t(std::floor(qy / grid.cell));
    int64_t cnt = 0;
    std::vector<int64_t>* slot = out ? nullptr : nullptr;
    for (int64_t dx = -1; dx <= 1; ++dx) {
      for (int64_t dy = -1; dy <= 1; ++dy) {
        auto it = grid.cells.find(Grid2D::key(gx + dx, gy + dy));
        if (it == grid.cells.end()) continue;
        for (int64_t j : it->second) {
          float ddx = points[j * 2] - qx, ddy = points[j * 2 + 1] - qy;
          if (ddx * ddx + ddy * ddy <= r2) {
            if (out) out[offsets[q] + cnt] = j;
            ++cnt;
          }
        }
      }
    }
    counts[q] = cnt;
    (void)slot;
  }
}

// ---------------------------------------------------------------------
// Fast .bin reader helper: float64 -> float32 xyz (PNV format)
// ---------------------------------------------------------------------
void f64_to_f32(const double* src, int64_t n, float* dst) {
  for (int64_t i = 0; i < n; ++i) dst[i] = float(src[i]);
}

}  // extern "C"
