// Native host-side runtime for U-RED-TPU.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the CPU-bound
// host loops around it — the role the reference filled with joblib + python
// loops (engine/run_preprocessing.py) and cached CUDA kNN tables
// (dataset/gen_occ_point.py):
//
//   * area-weighted mesh surface sampling with parametric A-matrix rows
//     (preprocessing stage 1 hot loop),
//   * exact kNN neighbor tables (occlusion-ball synthesis, host fallback),
//   * brute-force bidirectional nearest neighbors (host chamfer oracle /
//     pair-generation fallback),
//   * part connectivity (min pair distance + joint midpoint).
//
// OpenMP-parallel; exposed through a C ABI consumed via ctypes
// (ured_tpu/utils/native.py).  Build: `make -C native`.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Surface sampling: faces [F,3] indices into verts [V,3]; vertex A-matrices
// va [3V,6].  Outputs: points [n,3] and their A rows pa [3n,6].
// ---------------------------------------------------------------------------
void sample_surface(const double* verts, int64_t n_verts,
                    const int64_t* faces, int64_t n_faces,
                    const double* va,
                    int64_t n_samples, uint64_t seed,
                    double* out_points, double* out_pa) {
  std::vector<double> areas(n_faces);
  double total = 0.0;
  for (int64_t f = 0; f < n_faces; ++f) {
    const double* a = verts + 3 * faces[3 * f + 0];
    const double* b = verts + 3 * faces[3 * f + 1];
    const double* c = verts + 3 * faces[3 * f + 2];
    double u[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    double v[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    double cx = u[1] * v[2] - u[2] * v[1];
    double cy = u[2] * v[0] - u[0] * v[2];
    double cz = u[0] * v[1] - u[1] * v[0];
    areas[f] = 0.5 * std::sqrt(cx * cx + cy * cy + cz * cz);
    total += areas[f];
  }
  std::vector<double> cdf(n_faces);
  double acc = 0.0;
  for (int64_t f = 0; f < n_faces; ++f) {
    acc += areas[f] / total;
    cdf[f] = acc;
  }

  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int64_t i = 0; i < n_samples; ++i) {
    double r = uni(rng);
    int64_t f = std::lower_bound(cdf.begin(), cdf.end(), r) - cdf.begin();
    if (f >= n_faces) f = n_faces - 1;
    double w0 = uni(rng), w1 = uni(rng), w2 = uni(rng);
    double ws = w0 + w1 + w2;
    w0 /= ws; w1 /= ws; w2 /= ws;
    const int64_t vid[3] = {faces[3 * f], faces[3 * f + 1],
                            faces[3 * f + 2]};
    const double w[3] = {w0, w1, w2};
    // PA rows: barycentric mix of the vertex A rows (3 rows x 6 cols each)
    for (int r3 = 0; r3 < 3; ++r3) {
      for (int c6 = 0; c6 < 6; ++c6) {
        double s = 0.0;
        for (int k = 0; k < 3; ++k) {
          s += w[k] * va[(3 * vid[k] + r3) * 6 + c6];
        }
        out_pa[(3 * i + r3) * 6 + c6] = s;
      }
    }
    for (int d = 0; d < 3; ++d) {
      double s = 0.0;
      for (int k = 0; k < 3; ++k) s += w[k] * verts[3 * vid[k] + d];
      out_points[3 * i + d] = s;
    }
  }
}

// ---------------------------------------------------------------------------
// Exact kNN table: for each of n points, indices of its k nearest (self
// included, ascending) — the occlusion-ball neighbor table
// (reference caches this per model as pickle).
// ---------------------------------------------------------------------------
void knn_table(const float* points, int64_t n, int64_t k, int32_t* out_idx) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    std::vector<std::pair<float, int32_t>> d(n);
    const float* pi = points + 3 * i;
    for (int64_t j = 0; j < n; ++j) {
      const float* pj = points + 3 * j;
      float dx = pi[0] - pj[0], dy = pi[1] - pj[1], dz = pi[2] - pj[2];
      d[j] = {dx * dx + dy * dy + dz * dz, (int32_t)j};
    }
    std::partial_sort(d.begin(), d.begin() + k, d.end());
    for (int64_t j = 0; j < k; ++j) out_idx[i * k + j] = d[j].second;
  }
}

// ---------------------------------------------------------------------------
// Brute-force bidirectional NN (host chamfer oracle; same contract as the
// device kernels: squared L2, both directions).
// ---------------------------------------------------------------------------
void nn_distance(const float* x, int64_t n, const float* y, int64_t m,
                 float* d1, int32_t* i1, float* d2, int32_t* i2) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const float* p = x + 3 * i;
    float best = 1e30f;
    int32_t arg = 0;
    for (int64_t j = 0; j < m; ++j) {
      const float* q = y + 3 * j;
      float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
      float d = dx * dx + dy * dy + dz * dz;
      if (d < best) { best = d; arg = (int32_t)j; }
    }
    d1[i] = best;
    i1[i] = arg;
  }
#pragma omp parallel for schedule(static)
  for (int64_t j = 0; j < m; ++j) {
    const float* q = y + 3 * j;
    float best = 1e30f;
    int32_t arg = 0;
    for (int64_t i = 0; i < n; ++i) {
      const float* p = x + 3 * i;
      float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
      float d = dx * dx + dy * dy + dz * dz;
      if (d < best) { best = d; arg = (int32_t)i; }
    }
    d2[j] = best;
    i2[j] = arg;
  }
}

// ---------------------------------------------------------------------------
// Part connectivity: min distance between two clouds + joint midpoint.
// Returns the min distance; writes joint [3].
// ---------------------------------------------------------------------------
float min_pair_distance(const float* a, int64_t n, const float* b,
                        int64_t m, float* joint) {
  float best = 1e30f;
  int64_t bi = 0, bj = 0;
#pragma omp parallel
  {
    float lbest = 1e30f;
    int64_t li = 0, lj = 0;
#pragma omp for schedule(static) nowait
    for (int64_t i = 0; i < n; ++i) {
      const float* p = a + 3 * i;
      for (int64_t j = 0; j < m; ++j) {
        const float* q = b + 3 * j;
        float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        float d = dx * dx + dy * dy + dz * dz;
        if (d < lbest) { lbest = d; li = i; lj = j; }
      }
    }
#pragma omp critical
    {
      if (lbest < best) { best = lbest; bi = li; bj = lj; }
    }
  }
  for (int d = 0; d < 3; ++d) {
    joint[d] = 0.5f * (a[3 * bi + d] + b[3 * bj + d]);
  }
  return std::sqrt(best);
}

}  // extern "C"
