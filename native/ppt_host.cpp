// ppt_host: native host-side point-cloud utilities.
//
// TPU-native equivalents of the reference's CPU C++ extensions:
//   - voxel-grid barycenter subsampling  (reference: openpoints/cpp/
//     subsampling — grid_subsampling with barycenter reduction)
//   - batched k-nearest-neighbors via a KD-tree (reference: openpoints/
//     dataset/semantic_kitti/utils/nearest_neighbors — nanoflann kNN)
//   - z-buffer ball renderer for part-segmentation visualization
//     (reference: notebook/render_balls.so, source not shipped)
//
// These run in the input pipeline / visualization path (host), not on
// TPU; the device compute path is JAX/Pallas. Exposed with a plain C ABI
// for ctypes binding (no pybind11 dependency).
//
// Build: make -C native  (produces libppt_host.so)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <limits>
#include <numeric>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Voxel-grid barycenter subsampling.
//
// points: [n, 3] float32. Every occupied voxel of size `cell` contributes
// the barycenter of its points. out must hold up to n*3 floats. Returns
// the number of output points. Deterministic: voxels emit in order of
// first appearance.
// ---------------------------------------------------------------------------
int ppt_grid_subsample(const float* points, int n, float cell,
                       float* out, const float* features, int fdim,
                       float* out_features) {
  struct Accum {
    double sum[3] = {0, 0, 0};
    std::vector<double> fsum;
    int count = 0;
    int order = 0;
  };
  std::unordered_map<uint64_t, Accum> voxels;
  voxels.reserve(static_cast<size_t>(n) / 4 + 1);

  float minv[3] = {std::numeric_limits<float>::max(),
                   std::numeric_limits<float>::max(),
                   std::numeric_limits<float>::max()};
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) minv[d] = std::min(minv[d], points[i * 3 + d]);

  int next_order = 0;
  for (int i = 0; i < n; ++i) {
    uint64_t key = 0;
    for (int d = 0; d < 3; ++d) {
      uint64_t c =
          static_cast<uint64_t>((points[i * 3 + d] - minv[d]) / cell);
      key = key * 2097152ull + c;  // 21 bits per axis
    }
    Accum& a = voxels[key];
    if (a.count == 0) {
      a.order = next_order++;
      if (fdim > 0) a.fsum.assign(fdim, 0.0);
    }
    for (int d = 0; d < 3; ++d) a.sum[d] += points[i * 3 + d];
    for (int d = 0; d < fdim; ++d) a.fsum[d] += features[i * fdim + d];
    a.count++;
  }

  std::vector<const Accum*> ordered(voxels.size());
  for (const auto& kv : voxels) ordered[kv.second.order] = &kv.second;
  for (size_t v = 0; v < ordered.size(); ++v) {
    const Accum& a = *ordered[v];
    for (int d = 0; d < 3; ++d)
      out[v * 3 + d] = static_cast<float>(a.sum[d] / a.count);
    for (int d = 0; d < fdim; ++d)
      out_features[v * fdim + d] = static_cast<float>(a.fsum[d] / a.count);
  }
  return static_cast<int>(ordered.size());
}

// ---------------------------------------------------------------------------
// KD-tree kNN (CPU). Median-split tree over the support set; queries
// return the k nearest support indices, nearest first.
// ---------------------------------------------------------------------------
namespace {

struct KdTree {
  const float* pts;  // [n, 3]
  std::vector<int> index;       // permutation
  std::vector<int> left, right; // children per node slot
  std::vector<int> axis_of;

  explicit KdTree(const float* p, int n) : pts(p) {
    index.resize(n);
    std::iota(index.begin(), index.end(), 0);
    left.assign(n, -1);
    right.assign(n, -1);
    axis_of.assign(n, 0);
    if (n > 0) root_ = build(0, n, 0);
  }

  int root() const { return root_; }

  int build(int lo, int hi, int depth) {
    if (lo >= hi) return -1;
    int axis = depth % 3;
    int mid = (lo + hi) / 2;
    std::nth_element(index.begin() + lo, index.begin() + mid,
                     index.begin() + hi, [&](int a, int b) {
                       return pts[a * 3 + axis] < pts[b * 3 + axis];
                     });
    int node = mid;
    axis_of[node] = axis;
    left[node] = build(lo, mid, depth + 1);
    right[node] = build(mid + 1, hi, depth + 1);
    return node;
  }

  // max-heap of (dist, idx): farthest current neighbor on top
  using Heap = std::priority_queue<std::pair<float, int>>;

  void search(int node, const float* q, int k, Heap& heap) const {
    if (node < 0) return;
    int pi = index[node];
    float d2 = 0;
    for (int d = 0; d < 3; ++d) {
      float diff = q[d] - pts[pi * 3 + d];
      d2 += diff * diff;
    }
    if (static_cast<int>(heap.size()) < k) {
      heap.emplace(d2, pi);
    } else if (d2 < heap.top().first) {
      heap.pop();
      heap.emplace(d2, pi);
    }
    int axis = axis_of[node];
    float delta = q[axis] - pts[pi * 3 + axis];
    int near = delta <= 0 ? left[node] : right[node];
    int far = delta <= 0 ? right[node] : left[node];
    search(near, q, k, heap);
    if (static_cast<int>(heap.size()) < k ||
        delta * delta < heap.top().first) {
      search(far, q, k, heap);
    }
  }

 private:
  int root_ = -1;
};

}  // namespace

// query: [nq, 3]; support: [ns, 3]; out_idx: [nq, k]; out_d2: [nq, k] or
// null. Nearest-first.
void ppt_knn(const float* query, int nq, const float* support, int ns,
             int k, int* out_idx, float* out_d2) {
  KdTree tree(support, ns);
  k = std::min(k, ns);
  std::vector<std::pair<float, int>> buf(k);
  for (int i = 0; i < nq; ++i) {
    KdTree::Heap heap;
    tree.search(tree.root(), query + i * 3, k, heap);
    int count = static_cast<int>(heap.size());
    for (int j = count - 1; j >= 0; --j) {
      buf[j] = heap.top();
      heap.pop();
    }
    for (int j = 0; j < count; ++j) {
      out_idx[i * k + j] = buf[j].second;
      if (out_d2) out_d2[i * k + j] = buf[j].first;
    }
  }
}

// batched variant over [b, n, 3] arrays
void ppt_knn_batch(const float* query, int b, int nq, const float* support,
                   int ns, int k, int* out_idx) {
  for (int i = 0; i < b; ++i) {
    ppt_knn(query + static_cast<int64_t>(i) * nq * 3, nq,
            support + static_cast<int64_t>(i) * ns * 3, ns, k,
            out_idx + static_cast<int64_t>(i) * nq * k, nullptr);
  }
}

// ---------------------------------------------------------------------------
// Farthest point sampling (CPU, batched).
//
// Dataset-construction path: the reference re-FPS-es every ModelNet item
// at load time (data/dataset_3d.py:294-300) with a numpy Python loop —
// tens of minutes for the full corpus on one core. This is the same
// algorithm as the device Pallas kernel (min-distance update + argmax)
// in a tight C loop: ~1 ms per 8192->1024 cloud.
//
// points: [b, n, 3]; out_idx: [b, npoint] indices into each cloud.
// start: index of the first sample for every cloud (deterministic; the
// reference uses a random start, which only shifts which FPS solution
// of equal quality is picked).
// ---------------------------------------------------------------------------
void ppt_fps_batch(const float* points, int b, int n, int npoint, int start,
                   int* out_idx) {
  // planar layout + branchless two-pass body so both loops vectorize
  std::vector<float> xs(n), ys(n), zs(n), dist(n);
  for (int bi = 0; bi < b; ++bi) {
    const float* pts = points + static_cast<int64_t>(bi) * n * 3;
    int* out = out_idx + static_cast<int64_t>(bi) * npoint;
    for (int j = 0; j < n; ++j) {
      xs[j] = pts[j * 3 + 0];
      ys[j] = pts[j * 3 + 1];
      zs[j] = pts[j * 3 + 2];
    }
    std::fill(dist.begin(), dist.end(), std::numeric_limits<float>::max());
    int far = start;
    for (int i = 0; i < npoint; ++i) {
      out[i] = far;
      const float cx = xs[far], cy = ys[far], cz = zs[far];
      float* __restrict__ dp = dist.data();
      const float* __restrict__ xp = xs.data();
      const float* __restrict__ yp = ys.data();
      const float* __restrict__ zp = zs.data();
      for (int j = 0; j < n; ++j) {  // min-update: auto-vectorizes
        const float dx = xp[j] - cx;
        const float dy = yp[j] - cy;
        const float dz = zp[j] - cz;
        const float d2 = dx * dx + dy * dy + dz * dz;
        dp[j] = d2 < dp[j] ? d2 : dp[j];
      }
      // argmax as vectorizable max-reduce + first-equal scan
      float best = dp[0];
      for (int j = 1; j < n; ++j) best = dp[j] > best ? dp[j] : best;
      int best_j = 0;
      for (int j = 0; j < n; ++j) {
        if (dp[j] == best) {
          best_j = j;
          break;
        }
      }
      far = best_j;
    }
  }
}

// ---------------------------------------------------------------------------
// Z-buffer ball renderer (visualization).
//
// points: [n, 3] normalized coords in [-1, 1]; colors: [n, 3] uint8.
// image: [h, w, 3] uint8 output buffer (cleared to background).
// Each point renders as a Lambertian-shaded disc of radius r pixels.
// ---------------------------------------------------------------------------
void ppt_render_balls(const float* points, const uint8_t* colors, int n,
                      uint8_t* image, int h, int w, float radius,
                      uint8_t bg_r, uint8_t bg_g, uint8_t bg_b) {
  std::vector<float> zbuf(static_cast<size_t>(h) * w,
                          -std::numeric_limits<float>::max());
  for (int64_t p = 0; p < static_cast<int64_t>(h) * w; ++p) {
    image[p * 3 + 0] = bg_r;
    image[p * 3 + 1] = bg_g;
    image[p * 3 + 2] = bg_b;
  }
  int r = std::max(1, static_cast<int>(radius));
  for (int i = 0; i < n; ++i) {
    float x = points[i * 3 + 0];
    float y = points[i * 3 + 1];
    float z = points[i * 3 + 2];
    int cx = static_cast<int>((x * 0.5f + 0.5f) * (w - 1));
    int cy = static_cast<int>((0.5f - y * 0.5f) * (h - 1));
    for (int dy = -r; dy <= r; ++dy) {
      for (int dx = -r; dx <= r; ++dx) {
        float rr = static_cast<float>(dx * dx + dy * dy) / (r * r);
        if (rr > 1.0f) continue;
        int px = cx + dx, py = cy + dy;
        if (px < 0 || px >= w || py < 0 || py >= h) continue;
        float dz = std::sqrt(1.0f - rr);
        float depth = z + dz * radius / (0.5f * w);
        size_t pix = static_cast<size_t>(py) * w + px;
        if (depth > zbuf[pix]) {
          zbuf[pix] = depth;
          float shade = 0.4f + 0.6f * dz;  // Lambertian-ish
          for (int c = 0; c < 3; ++c) {
            float v = colors[i * 3 + c] * shade;
            image[pix * 3 + c] =
                static_cast<uint8_t>(std::min(255.0f, v));
          }
        }
      }
    }
  }
}

}  // extern "C"
