// Native SAH BVH builder.
//
// C++ counterpart of pnraytracing_tpu/accel/bvh.py (both rebuild the
// recursive builder of the reference's include/BVH.hpp:92-173): 12-bucket
// surface-area-heuristic splits on the longest centroid axis, depth-first
// flat layout with the left child implicit at id+1, leaves bounded by
// max_leaf_size (median-split fallback).  Exposed with a C ABI for ctypes.
//
// Build: see csrc/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kBuckets = 12;
constexpr float kTraversalCost = 1.0f;

struct Vec3 {
  float x, y, z;
  float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Bound {
  Vec3 lo{std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity()};
  Vec3 hi{-std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity()};
  void merge(const Bound& o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void merge_point(const Vec3& p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  double surface_area() const {
    double dx = std::max(0.0, double(hi.x) - lo.x);
    double dy = std::max(0.0, double(hi.y) - lo.y);
    double dz = std::max(0.0, double(hi.z) - lo.z);
    return 2.0 * (dx * dy + dy * dz + dz * dx);
  }
};

struct Task {
  int lo, hi, patch;  // patch: node index whose right_child awaits this id
};

}  // namespace

extern "C" {

// Returns 0 on success.  Output arrays must have capacity:
//   node_*: 2*num_tris entries (x3 floats for node_min/node_max)
//   order: num_tris entries
int pnrt_build_bvh(const float* positions, int num_vertices,
                   const int32_t* indices, int num_tris, int max_leaf_size,
                   float* out_node_min, float* out_node_max, int32_t* out_axis,
                   int32_t* out_right, int32_t* out_start, int32_t* out_end,
                   int32_t* out_order, int32_t* out_num_nodes) {
  if (num_tris < 1 || max_leaf_size < 2) return 1;

  std::vector<Bound> tri_bounds(num_tris);
  std::vector<Vec3> centers(num_tris);
  for (int t = 0; t < num_tris; ++t) {
    Bound b;
    for (int k = 0; k < 3; ++k) {
      int32_t vi = indices[3 * t + k];
      if (vi < 0 || vi >= num_vertices) return 2;
      Vec3 p{positions[3 * vi], positions[3 * vi + 1], positions[3 * vi + 2]};
      b.merge_point(p);
    }
    tri_bounds[t] = b;
    centers[t] = {0.5f * (b.lo.x + b.hi.x), 0.5f * (b.lo.y + b.hi.y),
                  0.5f * (b.lo.z + b.hi.z)};
  }

  std::vector<int32_t> order(num_tris);
  for (int t = 0; t < num_tris; ++t) order[t] = t;

  int node_count = 0;
  std::vector<Task> stack;
  stack.push_back({0, num_tris, -1});
  std::vector<int32_t> scratch(num_tris);

  while (!stack.empty()) {
    Task task = stack.back();
    stack.pop_back();
    const int lo = task.lo, hi = task.hi, n = hi - lo;
    const int node_id = node_count++;
    if (task.patch >= 0) out_right[task.patch] = node_id;

    Bound bound;
    for (int i = lo; i < hi; ++i) bound.merge(tri_bounds[order[i]]);
    auto emit = [&](int axis, int right) {
      out_node_min[3 * node_id] = bound.lo.x;
      out_node_min[3 * node_id + 1] = bound.lo.y;
      out_node_min[3 * node_id + 2] = bound.lo.z;
      out_node_max[3 * node_id] = bound.hi.x;
      out_node_max[3 * node_id + 1] = bound.hi.y;
      out_node_max[3 * node_id + 2] = bound.hi.z;
      out_axis[node_id] = axis;
      out_right[node_id] = right;
      out_start[node_id] = lo;
      out_end[node_id] = hi;
    };

    if (n <= 2) {  // BVH.hpp:103
      emit(-1, -1);
      continue;
    }

    Bound cbound;
    for (int i = lo; i < hi; ++i) cbound.merge_point(centers[order[i]]);
    Vec3 diag{cbound.hi.x - cbound.lo.x, cbound.hi.y - cbound.lo.y,
              cbound.hi.z - cbound.lo.z};
    int d = 0;
    if (diag.y >= diag.x && diag.y >= diag.z) d = 1;
    if (diag.z >= diag.x && diag.z >= diag.y) d = 2;
    if (diag.x >= diag.y && diag.x >= diag.z) d = 0;

    auto median_split = [&]() -> int {
      std::stable_sort(order.begin() + lo, order.begin() + hi,
                       [&](int32_t a, int32_t b) {
                         return centers[a][d] < centers[b][d];
                       });
      return n / 2;
    };

    int mid_local;
    if (diag[d] <= 0.0f) {
      if (n <= max_leaf_size) {  // degenerate centroid bound -> leaf
        emit(-1, -1);
        continue;
      }
      mid_local = median_split();
    } else {
      int counts[kBuckets] = {0};
      Bound bbounds[kBuckets];
      const float inv = float(kBuckets) / diag[d];
      auto bucket_of = [&](int32_t tri) {
        int pos = int((centers[tri][d] - cbound.lo[d]) * inv);
        return std::min(std::max(pos, 0), kBuckets - 1);
      };
      for (int i = lo; i < hi; ++i) {
        int b = bucket_of(order[i]);
        counts[b]++;
        bbounds[b].merge(tri_bounds[order[i]]);
      }
      // prefix/suffix sweep (BVH.hpp:133-151)
      Bound pre[kBuckets], suf[kBuckets];
      Bound acc;
      for (int b = 0; b < kBuckets; ++b) {
        acc.merge(bbounds[b]);
        pre[b] = acc;
      }
      acc = Bound{};
      for (int b = kBuckets - 1; b >= 0; --b) {
        acc.merge(bbounds[b]);
        suf[b] = acc;
      }
      double sa_node = std::max(bound.surface_area(), 1e-30);
      double min_cost = std::numeric_limits<double>::infinity();
      int mid_bucket = 0;
      int c0 = 0;
      for (int m = 0; m < kBuckets - 1; ++m) {
        c0 += counts[m];
        int c1 = n - c0;
        double cost = kTraversalCost +
                      ((c0 > 0 ? pre[m].surface_area() * c0 : 0.0) +
                       (c1 > 0 ? suf[m + 1].surface_area() * c1 : 0.0)) /
                          sa_node;
        if (cost < min_cost) {
          min_cost = cost;
          mid_bucket = m;
        }
      }
      double leaf_cost = n;  // BVH.hpp:160
      if (n <= max_leaf_size && leaf_cost <= min_cost) {
        emit(-1, -1);
        continue;
      }
      // stable partition: <= mid_bucket left, preserving order
      int n_left = 0, n_right = 0;
      for (int i = lo; i < hi; ++i)
        if (bucket_of(order[i]) <= mid_bucket) ++n_left;
      if (n_left == 0 || n_left == n) {
        mid_local = median_split();
      } else {
        int li = 0, ri = n_left;
        for (int i = lo; i < hi; ++i) {
          if (bucket_of(order[i]) <= mid_bucket)
            scratch[li++] = order[i];
          else
            scratch[ri++] = order[i];
        }
        std::memcpy(order.data() + lo, scratch.data(),
                    size_t(n) * sizeof(int32_t));
        mid_local = n_left;
      }
      (void)n_right;
    }

    const int mid = lo + mid_local;
    emit(d, 0);  // right patched later
    stack.push_back({mid, hi, node_id});
    stack.push_back({lo, mid, -1});
  }

  std::memcpy(out_order, order.data(), size_t(num_tris) * sizeof(int32_t));
  *out_num_nodes = node_count;
  return 0;
}

}  // extern "C"
