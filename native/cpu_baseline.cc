// OpenMP CPU baseline for the sift3d_tpu benchmark.
//
// A from-scratch C++17 implementation of the same 3D SIFT semantics as
// sift3d_tpu/oracle/cpu_sift.py (which in turn replicates the reference
// pipeline's numerics), multithreaded with OpenMP the way the reference is
// (parallel over z-slices for volume passes, dynamic over keypoints for the
// window stages, dynamic over queries for matching). It exists to measure
// an honest multi-threaded CPU wall-clock for bench.py's vs_baseline;
// it shares no code with the reference implementation.
//
// Usage: cpu_baseline <ref.mat> <tar.mat> [threads]
//   volumes in matrixIO3D format ([int32 nx ny nz][float32 data...]);
//   prints one JSON line with stage timings and match count.

#include <omp.h>

#include <algorithm>
#include <array>
#include <cfloat>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr float kSigmaDefault = 1.6f;
constexpr float kSigmaN = 1.15f;
constexpr int kKpLevels = 3;
constexpr float kPeakThresh = 0.1f;
constexpr float kEigThresh = 0.9f;
constexpr float kCornerThresh = 0.4f;
constexpr float kOriGradThresh = 1e-10f;
constexpr float kBaryEps = FLT_EPSILON * 10.0f;
constexpr float kConvEps = 0.1f;
constexpr int kDescLen = 768;

struct Vol {
  int nx = 0, ny = 0, nz = 0;
  std::vector<float> d;
  float &at(int x, int y, int z) { return d[(size_t)z * ny * nx + (size_t)y * nx + x]; }
  float at(int x, int y, int z) const { return d[(size_t)z * ny * nx + (size_t)y * nx + x]; }
  void init(int x, int y, int z) { nx = x; ny = y; nz = z; d.assign((size_t)x * y * z, 0.f); }
};

bool read_mat(const char *path, Vol *v) {
  FILE *f = fopen(path, "rb");
  if (!f) return false;
  int32_t dims[3];
  if (fread(dims, 4, 3, f) != 3) { fclose(f); return false; }
  v->init(dims[0], dims[1], dims[2]);
  size_t n = v->d.size();
  bool ok = fread(v->d.data(), 4, n, f) == n;
  fclose(f);
  return ok;
}

std::vector<float> make_kernel(float sigma, int *half_width) {
  int hw = sigma > 0 ? std::max((int)std::ceil(sigma * 3.0), 1) : 1;
  *half_width = hw;
  std::vector<float> k(2 * hw + 1);
  float acc = 0;
  for (int i = 0; i < (int)k.size(); ++i) {
    float x = (float)(i - hw) / (sigma + (float)DBL_EPSILON);
    k[i] = std::exp(-0.5f * x * x);
    acc += k[i];
  }
  for (auto &t : k) t /= acc;
  return k;
}

// One separable axis pass along a contiguous lane of length n with the
// boundary-mirror semantics (conv_eps offset, trunc-based interpolation).
void axis_pass(const float *src, float *dst, int n, std::ptrdiff_t stride,
               const std::vector<float> &k, int hw) {
  const int dim_end = n - 1;
  const int lo = hw, hi = n - hw - 2;
  for (int x = 0; x < n; ++x) {
    float acc = 0.f;
    if (x >= lo && x <= hi) {
      for (int d = -hw; d <= hw; ++d) acc += k[d + hw] * src[(x - d) * stride];
    } else {
      for (int d = -hw; d <= hw; ++d) {
        float c = (float)x - (float)d;
        if (c < 0) c = -c;
        else if (c >= dim_end) c = 2.f * dim_end - c - kConvEps;
        int ilo = (int)c;
        float frac = c - (float)ilo;
        int ihi = ilo + 1;
        ilo = std::min(std::max(ilo, 0), n - 1);
        ihi = std::min(std::max(ihi, 0), n - 1);
        acc += k[d + hw] * ((1.f - frac) * src[ilo * stride] + frac * src[ihi * stride]);
      }
    }
    dst[x * stride] = acc;
  }
}

void blur(const Vol &src, Vol *dst, float sigma, Vol *tmp) {
  int hw;
  auto k = make_kernel(sigma, &hw);
  dst->init(src.nx, src.ny, src.nz);
  tmp->init(src.nx, src.ny, src.nz);
  const int nx = src.nx, ny = src.ny, nz = src.nz;
  // X pass
#pragma omp parallel for schedule(static)
  for (int z = 0; z < nz; ++z)
    for (int y = 0; y < ny; ++y)
      axis_pass(&src.d[(size_t)z * ny * nx + (size_t)y * nx],
                &tmp->d[(size_t)z * ny * nx + (size_t)y * nx], nx, 1, k, hw);
  // Y pass
#pragma omp parallel for schedule(static)
  for (int z = 0; z < nz; ++z)
    for (int x = 0; x < nx; ++x)
      axis_pass(&tmp->d[(size_t)z * ny * nx + x],
                &dst->d[(size_t)z * ny * nx + x], ny, nx, k, hw);
  // Z pass
#pragma omp parallel for schedule(static)
  for (int y = 0; y < ny; ++y)
    for (int x = 0; x < nx; ++x) {
      axis_pass(&dst->d[(size_t)y * nx + x], &tmp->d[(size_t)y * nx + x],
                nz, (std::ptrdiff_t)nx * ny, k, hw);
    }
  std::swap(dst->d, tmp->d);
}

struct Keypoint {
  int x, y, z, octave, level;
  float scale;
  float rot[9];        // columns [v1 v2 v1xv2]
  float rx, ry, rz;
  std::vector<float> desc;
};

struct Mesh {
  // icosahedron: vertices + faces with the winding fix
  float tv[20][3][3];
  int idx[20][3];
  float normals[20][3];
};

Mesh build_mesh() {
  const double gr = 1.6180339887;
  const double verts[12][3] = {
      {0, 1, gr}, {0, -1, gr}, {0, 1, -gr}, {0, -1, -gr},
      {1, gr, 0}, {-1, gr, 0}, {1, -gr, 0}, {-1, -gr, 0},
      {gr, 0, 1}, {-gr, 0, 1}, {gr, 0, -1}, {-gr, 0, -1}};
  const int faces[20][3] = {
      {0, 1, 8}, {0, 8, 4}, {0, 4, 5}, {0, 5, 9}, {0, 9, 1},
      {1, 6, 8}, {8, 6, 10}, {8, 10, 4}, {4, 10, 2}, {4, 2, 5},
      {5, 2, 11}, {5, 11, 9}, {9, 11, 7}, {9, 7, 1}, {1, 7, 6},
      {3, 6, 7}, {3, 7, 11}, {3, 11, 2}, {3, 2, 10}, {3, 10, 6}};
  Mesh m;
  for (int f = 0; f < 20; ++f) {
    for (int j = 0; j < 3; ++j) {
      m.idx[f][j] = faces[f][j];
      const double *v = verts[faces[f][j]];
      double mag = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
      for (int c = 0; c < 3; ++c) m.tv[f][j][c] = (float)(v[c] / mag);
    }
    // winding fix: ensure outward normal
    float t1[3], t2[3], n[3];
    for (int c = 0; c < 3; ++c) {
      t1[c] = m.tv[f][2][c] - m.tv[f][1][c];
      t2[c] = m.tv[f][1][c] - m.tv[f][0][c];
    }
    n[0] = t1[1] * t2[2] - t1[2] * t2[1];
    n[1] = t1[2] * t2[0] - t1[0] * t2[2];
    n[2] = t1[0] * t2[1] - t1[1] * t2[0];
    float dot = n[0] * m.tv[f][0][0] + n[1] * m.tv[f][0][1] + n[2] * m.tv[f][0][2];
    if (dot < 0)
      for (int c = 0; c < 3; ++c) std::swap(m.tv[f][0][c], m.tv[f][1][c]);
    // outward unit normal: (v1-v0)x(v2-v0), flipped towards the face centre
    for (int c = 0; c < 3; ++c) {
      t1[c] = m.tv[f][1][c] - m.tv[f][0][c];
      t2[c] = m.tv[f][2][c] - m.tv[f][0][c];
    }
    n[0] = t1[1] * t2[2] - t1[2] * t2[1];
    n[1] = t1[2] * t2[0] - t1[0] * t2[2];
    n[2] = t1[0] * t2[1] - t1[1] * t2[0];
    float cx = 0, cy = 0, cz = 0;
    for (int j = 0; j < 3; ++j) {
      cx += m.tv[f][j][0] / 3.f;
      cy += m.tv[f][j][1] / 3.f;
      cz += m.tv[f][j][2] / 3.f;
    }
    float nm = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (n[0] * cx + n[1] * cy + n[2] * cz < 0) nm = -nm;
    for (int c = 0; c < 3; ++c) m.normals[f][c] = n[c] / nm;
  }
  return m;
}

// symmetric 3x3 eigen-decomposition (Jacobi), ascending
void eigh3(const float a[9], float vals[3], float vecs[9]) {
  double A[3][3] = {{a[0], a[1], a[2]}, {a[3], a[4], a[5]}, {a[6], a[7], a[8]}};
  double V[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 32; ++sweep) {
    double off = std::abs(A[0][1]) + std::abs(A[0][2]) + std::abs(A[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(A[p][q]) < 1e-18) continue;
        double theta = (A[q][q] - A[p][p]) / (2 * A[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1));
        double c = 1 / std::sqrt(t * t + 1), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = c * akp - s * akq;
          A[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = c * apk - s * aqk;
          A[q][k] = s * apk + c * aqk;
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = c * vkp - s * vkq;
          V[k][q] = s * vkp + c * vkq;
        }
      }
  }
  int ord[3] = {0, 1, 2};
  double ev[3] = {A[0][0], A[1][1], A[2][2]};
  std::sort(ord, ord + 3, [&](int i, int j) { return ev[i] < ev[j]; });
  for (int i = 0; i < 3; ++i) {
    vals[i] = (float)ev[ord[i]];
    for (int r = 0; r < 3; ++r) vecs[r * 3 + i] = (float)V[r][ord[i]];
  }
}

struct Pyramid {
  std::vector<Vol> gss, dog;  // octaves * levels
  int noct = 0;
};

void build_pyramids(const Vol &input, Pyramid *p) {
  const int gl = kKpLevels + 3;
  int m = std::min(input.nx, std::min(input.ny, input.nz));
  p->noct = (int)std::log2((double)m) - 3 + 1;
  const float sigma0 = kSigmaDefault * std::pow(2.0f, -1.0f / 3.0f);
  const float k = std::pow(2.0f, 1.0f / kKpLevels);
  std::vector<float> sigmas(gl);
  sigmas[0] = sigma0;
  for (int i = 1; i < gl; ++i) {
    float sp = std::pow(k, i - 1) * sigma0, st = sp * k;
    sigmas[i] = std::sqrt(st * st - sp * sp);
  }
  p->gss.resize((size_t)p->noct * gl);
  Vol tmp;
  for (int o = 0; o < p->noct; ++o)
    for (int i = 0; i < gl; ++i) {
      Vol &dst = p->gss[(size_t)o * gl + i];
      if (o == 0 && i == 0) {
        float base = std::sqrt(sigmas[0] * sigmas[0] - kSigmaN * kSigmaN);
        blur(input, &dst, base, &tmp);
      } else if (i == 0) {
        const Vol &src = p->gss[(size_t)(o - 1) * gl + kKpLevels];
        dst.init(src.nx / 2, src.ny / 2, src.nz / 2);
#pragma omp parallel for schedule(static)
        for (int z = 0; z < dst.nz; ++z)
          for (int y = 0; y < dst.ny; ++y)
            for (int x = 0; x < dst.nx; ++x)
              dst.at(x, y, z) = src.at(2 * x, 2 * y, 2 * z);
      } else {
        blur(p->gss[(size_t)o * gl + i - 1], &dst, sigmas[i], &tmp);
      }
    }
  const int dl = kKpLevels + 2;
  p->dog.resize((size_t)p->noct * dl);
  for (int o = 0; o < p->noct; ++o)
    for (int i = 0; i < dl; ++i) {
      const Vol &a = p->gss[(size_t)o * gl + i];      // prev
      const Vol &b = p->gss[(size_t)o * gl + i + 1];  // cur
      Vol &d = p->dog[(size_t)o * dl + i];
      d.init(a.nx, a.ny, a.nz);
#pragma omp parallel for schedule(static)
      for (size_t t = 0; t < d.d.size(); ++t) d.d[t] = a.d[t] - b.d[t];
    }
}

void extract(const Vol &raw, const Mesh &mesh, std::vector<Keypoint> *out,
             double *t_pyr, double *t_detect, double *t_orient, double *t_desc) {
  Vol input = raw;
  float mx = 0;
  for (float v : input.d) mx = std::max(mx, std::abs(v));
  if (mx > 0)
    for (auto &v : input.d) v /= mx;

  double t0 = omp_get_wtime();
  Pyramid p;
  build_pyramids(input, &p);
  *t_pyr += omp_get_wtime() - t0;

  t0 = omp_get_wtime();
  const int gl = kKpLevels + 3, dl = kKpLevels + 2;
  const float sigma0 = kSigmaDefault * std::pow(2.0f, -1.0f / 3.0f);
  std::vector<Keypoint> extrema;
  for (int o = 0; o < p.noct; ++o)
    for (int i = 1; i < dl - 1; ++i) {
      const Vol &prev = p.dog[(size_t)o * dl + i - 1];
      const Vol &cur = p.dog[(size_t)o * dl + i];
      const Vol &next = p.dog[(size_t)o * dl + i + 1];
      float dmax = 0;
      for (float v : cur.d) dmax = std::max(dmax, std::abs(v));
      const float thres = kPeakThresh * dmax;
      std::vector<std::vector<Keypoint>> per_thread(omp_get_max_threads());
#pragma omp parallel for schedule(static)
      for (int z = 1; z < cur.nz - 1; ++z) {
        auto &local = per_thread[omp_get_thread_num()];
        for (int y = 1; y < cur.ny - 1; ++y)
          for (int x = 1; x < cur.nx - 1; ++x) {
            float v = cur.at(x, y, z);
            if (v <= thres && v >= -thres) continue;
            float nb[8] = {prev.at(x, y, z), cur.at(x - 1, y, z), cur.at(x + 1, y, z),
                           cur.at(x, y + 1, z), cur.at(x, y - 1, z), cur.at(x, y, z + 1),
                           cur.at(x, y, z - 1), next.at(x, y, z)};
            bool lt = true, gt = true;
            for (float n : nb) { lt &= v < n; gt &= v > n; }
            if (lt || gt) {
              Keypoint kp;
              kp.x = x; kp.y = y; kp.z = z; kp.octave = o; kp.level = i;
              kp.scale = sigma0 * std::pow(2.0f, o + (float)i / kKpLevels);
              local.push_back(kp);
            }
          }
      }
      for (auto &v : per_thread)
        extrema.insert(extrema.end(), v.begin(), v.end());
    }
  *t_detect += omp_get_wtime() - t0;

  // orientation
  t0 = omp_get_wtime();
  std::vector<int> status(extrema.size(), 0);
#pragma omp parallel for schedule(dynamic)
  for (size_t ki = 0; ki < extrema.size(); ++ki) {
    Keypoint &kp = extrema[ki];
    const Vol &g = p.gss[(size_t)kp.octave * gl + kp.level];
    const float u = (float)(1 << kp.octave);
    const float sig = 1.5f * kp.scale;
    const float r = 3.0f * sig;
    auto rng = [&](int c, int n) {
      int lo = (int)std::floor(c - r / u);
      lo = lo > 1 ? lo : 1;
      int hi = (int)std::ceil(c + r / u);
      hi = hi < n - 2 ? hi : n - 2;
      return std::array<int, 2>{lo, hi};
    };
    auto xr = rng(kp.x, g.nx), yr = rng(kp.y, g.ny), zr = rng(kp.z, g.nz);
    double st[6] = {0}, mg[3] = {0};
    for (int z = zr[0]; z <= zr[1]; ++z)
      for (int y = yr[0]; y <= yr[1]; ++y)
        for (int x = xr[0]; x <= xr[1]; ++x) {
          float dxp = (x - kp.x) * u, dyp = (y - kp.y) * u, dzp = (z - kp.z) * u;
          float sq = dxp * dxp + dyp * dyp + dzp * dzp;
          if (sq > r * r) continue;
          float w = std::exp(-0.5f * sq / (sig * sig));
          float gx = 0.5f * (g.at(x + 1, y, z) - g.at(x - 1, y, z)) / u;
          float gy = 0.5f * (g.at(x, y + 1, z) - g.at(x, y - 1, z)) / u;
          float gz = 0.5f * (g.at(x, y, z + 1) - g.at(x, y, z - 1)) / u;
          st[0] += gx * gx * w; st[1] += gx * gy * w; st[2] += gx * gz * w;
          st[3] += gy * gy * w; st[4] += gy * gz * w; st[5] += gz * gz * w;
          mg[0] += gx * w; mg[1] += gy * w; mg[2] += gz * w;
        }
    float mg2 = (float)(mg[0] * mg[0] + mg[1] * mg[1] + mg[2] * mg[2]);
    if (mg2 < kOriGradThresh) { status[ki] = -1; continue; }
    float a9[9] = {(float)st[0], (float)st[1], (float)st[2],
                   (float)st[1], (float)st[3], (float)st[4],
                   (float)st[2], (float)st[4], (float)st[5]};
    float vals[3], vecs[9];
    eigh3(a9, vals, vecs);
    if (std::abs(vals[0] / vals[1]) > kEigThresh ||
        std::abs(vals[1] / vals[2]) > kEigThresh) { status[ki] = -2; continue; }
    if (std::abs(vals[0] - vals[1]) < DBL_EPSILON ||
        std::abs(vals[0] - vals[2]) < DBL_EPSILON ||
        std::abs(vals[2] - vals[1]) < DBL_EPSILON) { status[ki] = -2; continue; }
    float dnorm = std::sqrt(mg2);
    float corner = FLT_MAX;
    float v1[3], v2[3];
    for (int which = 2; which > 0; --which) {
      float v[3] = {vecs[0 * 3 + which], vecs[1 * 3 + which], vecs[2 * 3 + which]};
      float d = (float)(v[0] * mg[0] + v[1] * mg[1] + v[2] * mg[2]);
      float qn = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
      float ca = std::abs(d / (dnorm * qn));
      corner = std::min(corner, ca);
      float sgn = d > 0 ? 1.f : -1.f;
      float *dst = which == 2 ? v1 : v2;
      for (int c = 0; c < 3; ++c) dst[c] = v[c] * sgn;
    }
    if (corner < kCornerThresh) { status[ki] = -3; continue; }
    float vr[3] = {v1[1] * v2[2] - v1[2] * v2[1], v1[2] * v2[0] - v1[0] * v2[2],
                   v1[0] * v2[1] - v1[1] * v2[0]};
    for (int c = 0; c < 3; ++c) {
      kp.rot[c * 3 + 0] = v1[c];
      kp.rot[c * 3 + 1] = v2[c];
      kp.rot[c * 3 + 2] = vr[c];
    }
    status[ki] = 1;
  }
  std::vector<Keypoint> accepted;
  for (size_t i = 0; i < extrema.size(); ++i)
    if (status[i] == 1) accepted.push_back(extrema[i]);
  *t_orient += omp_get_wtime() - t0;

  // descriptors
  t0 = omp_get_wtime();
#pragma omp parallel for schedule(dynamic)
  for (size_t ki = 0; ki < accepted.size(); ++ki) {
    Keypoint &kp = accepted[ki];
    const Vol &g = p.gss[(size_t)kp.octave * gl + kp.level];
    const float u = (float)(1 << kp.octave);
    const float sig = kp.scale * 7.071067812f;
    const float r = 2.0f * sig;
    const float hwd = r / std::sqrt(2.0f);
    const float binf = 4.0f / (2.0f * hwd);
    auto rng = [&](int c, int n) {
      int lo = (int)std::floor(c - r / u);
      lo = lo > 1 ? lo : 1;
      int hi = (int)std::ceil(c + r / u);
      hi = hi < n - 2 ? hi : n - 2;
      return std::array<int, 2>{lo, hi};
    };
    auto xr = rng(kp.x, g.nx), yr = rng(kp.y, g.ny), zr = rng(kp.z, g.nz);
    // transposed rotation applied to displacement + gradient
    const float *R = kp.rot;
    kp.desc.assign(kDescLen, 0.f);
    for (int z = zr[0]; z <= zr[1]; ++z)
      for (int y = yr[0]; y <= yr[1]; ++y)
        for (int x = xr[0]; x <= xr[1]; ++x) {
          float dxp = (x - kp.x) * u, dyp = (y - kp.y) * u, dzp = (z - kp.z) * u;
          float sq = dxp * dxp + dyp * dyp + dzp * dzp;
          if (sq > r * r) continue;
          float vb[3];
          // R^T * disp
          vb[0] = (R[0] * dxp + R[3] * dyp + R[6] * dzp + hwd) * binf - 0.5f;
          vb[1] = (R[1] * dxp + R[4] * dyp + R[7] * dzp + hwd) * binf - 0.5f;
          vb[2] = (R[2] * dxp + R[5] * dyp + R[8] * dzp + hwd) * binf - 0.5f;
          if (vb[0] <= -0.5f || vb[1] <= -0.5f || vb[2] <= -0.5f ||
              vb[0] >= 3.5f || vb[1] >= 3.5f || vb[2] >= 3.5f)
            continue;
          float w = std::exp(-0.5f * sq / (sig * sig));
          float gx = 0.5f * (g.at(x + 1, y, z) - g.at(x - 1, y, z)) / u * w;
          float gy = 0.5f * (g.at(x, y + 1, z) - g.at(x, y - 1, z)) / u * w;
          float gz = 0.5f * (g.at(x, y, z + 1) - g.at(x, y, z - 1)) / u * w;
          float gr[3] = {R[0] * gx + R[3] * gy + R[6] * gz,
                         R[1] * gx + R[4] * gy + R[7] * gz,
                         R[2] * gx + R[5] * gy + R[8] * gz};
          float g2 = gr[0] * gr[0] + gr[1] * gr[1] + gr[2] * gr[2];
          if (g2 < kBaryEps) continue;
          // containing face via argmax of dot with outward normals
          int best = 0;
          float bd = -FLT_MAX;
          for (int f = 0; f < 20; ++f) {
            float d = gr[0] * mesh.normals[f][0] + gr[1] * mesh.normals[f][1] +
                      gr[2] * mesh.normals[f][2];
            if (d > bd) { bd = d; best = f; }
          }
          // Moller-Trumbore barycentric weights on the selected face
          const float (*tv)[3] = mesh.tv[best];
          float e1[3], e2[3], tt[3];
          for (int c = 0; c < 3; ++c) {
            e1[c] = tv[1][c] - tv[0][c];
            e2[c] = tv[2][c] - tv[0][c];
            tt[c] = -tv[0][c];
          }
          float pp[3] = {gr[1] * e2[2] - gr[2] * e2[1],
                         gr[2] * e2[0] - gr[0] * e2[2],
                         gr[0] * e2[1] - gr[1] * e2[0]};
          float det = e1[0] * pp[0] + e1[1] * pp[1] + e1[2] * pp[2];
          if (std::abs(det) < kBaryEps) continue;
          float inv = 1.f / det;
          float qq[3] = {tt[1] * e1[2] - tt[2] * e1[1],
                         tt[2] * e1[0] - tt[0] * e1[2],
                         tt[0] * e1[1] - tt[1] * e1[0]};
          float by = inv * (pp[0] * tt[0] + pp[1] * tt[1] + pp[2] * tt[2]);
          float bz = inv * (gr[0] * qq[0] + gr[1] * qq[1] + gr[2] * qq[2]);
          float bx = 1.f - by - bz;
          float kk = inv * (qq[0] * e2[0] + qq[1] * e2[1] + qq[2] * e2[2]);
          if (bx < -kBaryEps || by < -kBaryEps || bz < -kBaryEps || kk < 0) continue;
          float mag = std::sqrt(g2);
          float bary[3] = {bx, by, bz};
          int base[3] = {(int)vb[0], (int)vb[1], (int)vb[2]};
          float frac[3] = {vb[0] - std::floor(vb[0]), vb[1] - std::floor(vb[1]),
                           vb[2] - std::floor(vb[2])};
          for (int dx2 = 0; dx2 < 2; ++dx2)
            for (int dy2 = 0; dy2 < 2; ++dy2)
              for (int dz2 = 0; dz2 < 2; ++dz2) {
                int bxk = base[0] + dx2, byk = base[1] + dy2, bzk = base[2] + dz2;
                if (bxk < 0 || byk < 0 || bzk < 0 || bxk > 3 || byk > 3 || bzk > 3)
                  continue;
                float wgt = (dx2 ? frac[0] : 1 - frac[0]) *
                            (dy2 ? frac[1] : 1 - frac[1]) *
                            (dz2 ? frac[2] : 1 - frac[2]) * mag;
                int hist = bxk + 4 * byk + 16 * bzk;
                for (int c = 0; c < 3; ++c)
                  kp.desc[hist * 12 + mesh.idx[best][c]] += wgt * bary[c];
              }
        }
    // normalise -> truncate -> renormalise
    auto norm = [&]() {
      double n = 0;
      for (float v : kp.desc) n += (double)v * v;
      n = std::sqrt(n) + DBL_EPSILON;
      for (auto &v : kp.desc) v = (float)(v / n);
    };
    norm();
    const float trunc = 0.2f * 128 / kDescLen;
    for (auto &v : kp.desc) v = std::min(v, trunc);
    norm();
    float cf = (float)(1 << kp.octave);
    kp.rx = kp.x * cf; kp.ry = kp.y * cf; kp.rz = kp.z * cf;
  }
  *t_desc += omp_get_wtime() - t0;
  *out = std::move(accepted);
}

int match_count(const std::vector<Keypoint> &ref, const std::vector<Keypoint> &tar,
                float threshold) {
  const int n = (int)ref.size(), m = (int)tar.size();
  if (!n || !m) return 0;
  std::vector<int> fwd(n, -1);
  std::vector<char> fwd_ok(n, 0);
  const float thr2 = threshold * threshold;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    double d1 = FLT_MIN, d2 = FLT_MIN;
    int i1 = -1;
    for (int j = 0; j < m; ++j) {
      double s = 0;
      for (int k = 0; k < kDescLen; ++k) s += ref[i].desc[k] * tar[j].desc[k];
      if (s > d1) { d2 = d1; d1 = s; i1 = j; }
      else if (s > d2) d2 = s;
    }
    fwd[i] = i1;
    // index-0 quirk: the reference's negate-to-reject (gIdx *= -1,
    // Src/cMatcher.cc:93) cannot reject target index 0, so a best-match
    // to tar[0] survives the ratio test unconditionally.
    fwd_ok[i] = i1 >= 0 && (i1 == 0 || (2 - 2 * d1) / (2 - 2 * d2) < thr2);
  }
  // enhanced: ambiguous targets need reverse agreement
  std::vector<int> counts(m, 0);
  for (int i = 0; i < n; ++i)
    if (fwd_ok[i]) counts[fwd[i]]++;
  std::vector<int> rev(m, -1);
#pragma omp parallel for schedule(dynamic)
  for (int j = 0; j < m; ++j) {
    if (counts[j] <= 1) continue;
    double d1 = FLT_MIN, d2 = FLT_MIN;
    int i1 = -1;
    for (int i = 0; i < n; ++i) {
      double s = 0;
      for (int k = 0; k < kDescLen; ++k) s += tar[j].desc[k] * ref[i].desc[k];
      if (s > d1) { d2 = d1; d1 = s; i1 = i; }
      else if (s > d2) d2 = s;
    }
    // index-0 quirk again: a reverse best of ref[0] survives the reverse
    // ratio filter (its stored index negates to itself).
    if (i1 >= 0 && (i1 == 0 || (2 - 2 * d1) / (2 - 2 * d2) < thr2)) rev[j] = i1;
  }
  int kept = 0;
  for (int i = 0; i < n; ++i) {
    if (!fwd_ok[i]) continue;
    int j = fwd[i];
    // j == 0 cannot be rejected by bijectFilter's *= -1 (Src/cMatcher.cc:141)
    if (j != 0 && counts[j] > 1 && rev[j] != i) continue;
    kept++;
  }
  return kept;
}

}  // namespace

// Binary keypoint dump for cross-implementation parity diffing (the
// reference's write_sift_kp protocol, Src/cUtil.cc:938-1016, as a compact
// binary record instead of text): [int32 n][per kp: int32 x,y,z,octave,level;
// f32 scale; f32 rot[9]; f32 rx,ry,rz; f32 desc[768]].
static void dump_keypoints(const char *path, const std::vector<Keypoint> &kps) {
  FILE *f = fopen(path, "wb");
  if (!f) { fprintf(stderr, "cannot write %s\n", path); return; }
  int32_t n = (int32_t)kps.size();
  fwrite(&n, 4, 1, f);
  for (const Keypoint &kp : kps) {
    int32_t ints[5] = {kp.x, kp.y, kp.z, kp.octave, kp.level};
    fwrite(ints, 4, 5, f);
    fwrite(&kp.scale, 4, 1, f);
    fwrite(kp.rot, 4, 9, f);
    float r[3] = {kp.rx, kp.ry, kp.rz};
    fwrite(r, 4, 3, f);
    fwrite(kp.desc.data(), 4, kp.desc.size(), f);
  }
  fclose(f);
}

int main(int argc, char **argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: %s ref.mat tar.mat [threads] [dump_prefix]\n", argv[0]);
    return 1;
  }
  if (argc > 3 && atoi(argv[3]) > 0) omp_set_num_threads(atoi(argv[3]));
  Vol ref, tar;
  if (!read_mat(argv[1], &ref) || !read_mat(argv[2], &tar)) {
    fprintf(stderr, "failed to read volumes\n");
    return 1;
  }
  Mesh mesh = build_mesh();
  double t_pyr = 0, t_det = 0, t_ori = 0, t_desc = 0;
  double t0 = omp_get_wtime();
  std::vector<Keypoint> kr, kt;
  extract(ref, mesh, &kr, &t_pyr, &t_det, &t_ori, &t_desc);
  extract(tar, mesh, &kt, &t_pyr, &t_det, &t_ori, &t_desc);
  double t_extract = omp_get_wtime() - t0;
  if (argc > 4) {
    dump_keypoints((std::string(argv[4]) + "_ref.kp").c_str(), kr);
    dump_keypoints((std::string(argv[4]) + "_tar.kp").c_str(), kt);
  }
  t0 = omp_get_wtime();
  int matches = match_count(kr, kt, 0.85f);
  double t_match = omp_get_wtime() - t0;
  printf(
      "{\"threads\": %d, \"ref_kps\": %zu, \"tar_kps\": %zu, \"matches\": %d, "
      "\"extract_s\": %.3f, \"match_s\": %.3f, \"total_s\": %.3f, "
      "\"pyramid_s\": %.3f, \"detect_s\": %.3f, \"orient_s\": %.3f, "
      "\"desc_s\": %.3f}\n",
      omp_get_max_threads(), kr.size(), kt.size(), matches, t_extract, t_match,
      t_extract + t_match, t_pyr, t_det, t_ori, t_desc);
  return 0;
}
