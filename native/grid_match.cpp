// Native grid association: detected conics -> target grid coordinates.
//
// C++ port of vicalib_tpu/targets/grid_match.py (the Calibu
// TargetGridDot::FindTarget equivalent; reference call sites
// vicalib-task.cc:275-277, 351-363).  This is the host-side hot loop of the
// detection pipeline — per-frame lattice BFS, radius classification, binary
// pattern matching over the 8 grid symmetries x all translations, and a
// homography-based global re-association.  Semantics match the numpy
// implementation (the Python reference stays as the test oracle).
//
// C ABI only (consumed via ctypes); no external dependencies.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

struct V2 {
  double x, y;
};

inline double norm(V2 v) { return std::sqrt(v.x * v.x + v.y * v.y); }
inline V2 sub(V2 a, V2 b) { return {a.x - b.x, a.y - b.y}; }
inline double dot(V2 a, V2 b) { return a.x * b.x + a.y * b.y; }

constexpr int64_t kInvalid = std::numeric_limits<int32_t>::min();

// BFS lattice indexing (grid_match._bfs_lattice).
bool BfsLattice(const std::vector<V2>& c, std::vector<int64_t>* ci,
                std::vector<int64_t>* cj, std::vector<uint8_t>* taken) {
  const int n = static_cast<int>(c.size());
  if (n < 8) return false;

  // seed: closest to centroid
  V2 mu{0, 0};
  for (const auto& p : c) {
    mu.x += p.x / n;
    mu.y += p.y / n;
  }
  int seed = 0;
  double best = std::numeric_limits<double>::infinity();
  for (int i = 0; i < n; ++i) {
    double d = dot(sub(c[i], mu), sub(c[i], mu));
    if (d < best) {
      best = d;
      seed = i;
    }
  }

  // 6 nearest neighbors of the seed
  std::vector<std::pair<double, int>> nb;
  nb.reserve(n - 1);
  for (int j = 0; j < n; ++j) {
    if (j == seed) continue;
    nb.emplace_back(dot(sub(c[j], c[seed]), sub(c[j], c[seed])), j);
  }
  std::partial_sort(nb.begin(), nb.begin() + std::min<size_t>(6, nb.size()),
                    nb.end());
  V2 a1 = sub(c[nb[0].second], c[seed]);
  V2 a2{0, 0};
  bool have_a2 = false;
  for (size_t k = 1; k < std::min<size_t>(6, nb.size()); ++k) {
    V2 v = sub(c[nb[k].second], c[seed]);
    double cosang = std::fabs(dot(v, a1)) / (norm(v) * norm(a1));
    if (cosang < 0.866) {
      a2 = v;
      have_a2 = true;
      break;
    }
  }
  if (!have_a2) return false;

  ci->assign(n, kInvalid);
  cj->assign(n, kInvalid);
  taken->assign(n, 0);
  std::vector<V2> ax1(n), ax2(n);
  (*ci)[seed] = 0;
  (*cj)[seed] = 0;
  ax1[seed] = a1;
  ax2[seed] = a2;
  (*taken)[seed] = 1;
  std::vector<int> frontier = {seed};
  const int steps[4][2] = {{1, 0}, {-1, 0}, {0, 1}, {0, -1}};

  while (!frontier.empty()) {
    std::vector<int> next;
    for (int i : frontier) {
      V2 b1 = ax1[i], b2 = ax2[i];
      double scale = 0.4 * std::min(norm(b1), norm(b2));
      for (const auto& s : steps) {
        int si = s[0], sj = s[1];
        V2 pred{c[i].x + si * b1.x + sj * b2.x,
                c[i].y + si * b1.y + sj * b2.y};
        int jmin = -1;
        double dmin = std::numeric_limits<double>::infinity();
        for (int j = 0; j < n; ++j) {
          double d = norm(sub(c[j], pred));
          if (d < dmin) {
            dmin = d;
            jmin = j;
          }
        }
        if (jmin < 0 || dmin > scale || (*taken)[jmin]) continue;
        (*ci)[jmin] = (*ci)[i] + si;
        (*cj)[jmin] = (*cj)[i] + sj;
        V2 obs = sub(c[jmin], c[i]);
        if (si != 0) {
          ax1[jmin] = {obs.x * si, obs.y * si};
          ax2[jmin] = b2;
        } else {
          ax1[jmin] = b1;
          ax2[jmin] = {obs.x * sj, obs.y * sj};
        }
        (*taken)[jmin] = 1;
        next.push_back(jmin);
      }
    }
    frontier.swap(next);
  }
  return true;
}

double Percentile(std::vector<double> v, double q) {
  // matches numpy.percentile (linear interpolation)
  if (v.empty()) return 0.0;
  std::sort(v.begin(), v.end());
  double pos = q / 100.0 * (v.size() - 1);
  size_t lo = static_cast<size_t>(pos);
  size_t hi = std::min(lo + 1, v.size() - 1);
  double frac = pos - lo;
  return v[lo] * (1 - frac) + v[hi] * frac;
}

// Large/small bit per indexed dot (grid_match._classify_radii).
void ClassifyRadii(const std::vector<double>& radii,
                   const std::vector<int64_t>& ci,
                   const std::vector<int64_t>& cj,
                   const std::vector<uint8_t>& taken,
                   std::vector<int>* bits) {
  const int n = static_cast<int>(radii.size());
  bits->assign(n, -1);
  std::vector<int> idx;
  for (int i = 0; i < n; ++i)
    if (taken[i]) idx.push_back(i);
  for (int i : idx) {
    std::vector<double> near;
    for (int j : idx) {
      int64_t d = std::max(std::llabs(ci[j] - ci[i]), std::llabs(cj[j] - cj[i]));
      if (d > 0 && d <= 2) near.push_back(radii[j]);
    }
    if (near.size() < 3) continue;
    double med = Percentile(near, 50.0);
    double ratio = radii[i] / std::max(med, 1e-9);
    if (ratio > 1.25) {
      (*bits)[i] = 1;
    } else if (ratio < 0.85) {
      (*bits)[i] = 0;
    } else {
      double lo = Percentile(near, 25.0);
      double hi = Percentile(near, 75.0);
      (*bits)[i] =
          std::fabs(radii[i] - hi) < std::fabs(radii[i] - lo) ? 1 : 0;
    }
  }
}

// Smallest-eigenvector of symmetric 9x9 via cyclic Jacobi (for the DLT
// homography normal matrix A^T A).
void SmallestEigvec9(double A[9][9], double out[9]) {
  double V[9][9] = {};
  for (int i = 0; i < 9; ++i) V[i][i] = 1.0;
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = 0;
    for (int p = 0; p < 9; ++p)
      for (int q = p + 1; q < 9; ++q) off += A[p][q] * A[p][q];
    if (off < 1e-24) break;
    for (int p = 0; p < 9; ++p) {
      for (int q = p + 1; q < 9; ++q) {
        if (std::fabs(A[p][q]) < 1e-30) continue;
        double theta = (A[q][q] - A[p][p]) / (2 * A[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1));
        double cs = 1.0 / std::sqrt(t * t + 1);
        double sn = t * cs;
        for (int k = 0; k < 9; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = cs * akp - sn * akq;
          A[k][q] = sn * akp + cs * akq;
        }
        for (int k = 0; k < 9; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = cs * apk - sn * aqk;
          A[q][k] = sn * apk + cs * aqk;
        }
        for (int k = 0; k < 9; ++k) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = cs * vkp - sn * vkq;
          V[k][q] = sn * vkp + cs * vkq;
        }
      }
    }
  }
  int mi = 0;
  for (int i = 1; i < 9; ++i)
    if (A[i][i] < A[mi][mi]) mi = i;
  for (int k = 0; k < 9; ++k) out[k] = V[k][mi];
}

// Homography-based global re-association (grid_match._homography_reassociate).
void HomographyReassociate(const std::vector<V2>& centers,
                           const std::vector<uint8_t>& valid,
                           std::vector<int64_t>* gcol,
                           std::vector<int64_t>* grow, int rows, int cols,
                           double tol_frac) {
  const int K = static_cast<int>(centers.size());
  std::vector<int> m;
  for (int i = 0; i < K; ++i)
    if ((*gcol)[i] >= 0) m.push_back(i);
  if (m.size() < 8) return;

  // normalize src (grid coords) and dst (pixels)
  auto normalize = [](const std::vector<V2>& p, V2* mu, double* sc) {
    mu->x = mu->y = 0;
    for (const auto& q : p) {
      mu->x += q.x / p.size();
      mu->y += q.y / p.size();
    }
    double s = 0;
    for (const auto& q : p)
      s += (dot(sub(q, *mu), sub(q, *mu))) / p.size();
    *sc = std::sqrt(s) + 1e-12;
  };
  std::vector<V2> src, dst;
  for (int i : m) {
    src.push_back({static_cast<double>((*gcol)[i]),
                   static_cast<double>((*grow)[i])});
    dst.push_back(centers[i]);
  }
  V2 mus, mud;
  double scs, scd;
  normalize(src, &mus, &scs);
  normalize(dst, &mud, &scd);

  double AtA[9][9] = {};
  for (size_t k = 0; k < src.size(); ++k) {
    double x = (src[k].x - mus.x) / scs, y = (src[k].y - mus.y) / scs;
    double u = (dst[k].x - mud.x) / scd, v = (dst[k].y - mud.y) / scd;
    double r1[9] = {x, y, 1, 0, 0, 0, -u * x, -u * y, -u};
    double r2[9] = {0, 0, 0, x, y, 1, -v * x, -v * y, -v};
    for (int i = 0; i < 9; ++i)
      for (int j = 0; j < 9; ++j)
        AtA[i][j] += r1[i] * r1[j] + r2[i] * r2[j];
  }
  double h[9];
  SmallestEigvec9(AtA, h);
  // denormalize: H = Td^-1 Hn Ts;  Ts = [[1/scs,0,-mus/scs],...],
  // Td^-1 = [[scd,0,mud.x],[0,scd,mud.y],[0,0,1]]
  double Hn[3][3] = {{h[0], h[1], h[2]}, {h[3], h[4], h[5]}, {h[6], h[7], h[8]}};
  double Ts[3][3] = {{1 / scs, 0, -mus.x / scs},
                     {0, 1 / scs, -mus.y / scs},
                     {0, 0, 1}};
  double Tdi[3][3] = {{scd, 0, mud.x}, {0, scd, mud.y}, {0, 0, 1}};
  double HT[3][3] = {}, H[3][3] = {};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      for (int k = 0; k < 3; ++k) HT[i][j] += Hn[i][k] * Ts[k][j];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      for (int k = 0; k < 3; ++k) H[i][j] += Tdi[i][k] * HT[k][j];

  // project all grid points
  const int R = rows * cols;
  std::vector<V2> proj(R);
  for (int g = 0; g < R; ++g) {
    double gx = g % cols, gy = g / cols;
    double w = H[2][0] * gx + H[2][1] * gy + H[2][2];
    proj[g] = {(H[0][0] * gx + H[0][1] * gy + H[0][2]) / w,
               (H[1][0] * gx + H[1][1] * gy + H[1][2]) / w};
  }
  // local spacing = median horizontal neighbor distance
  std::vector<double> sp;
  for (int r = 0; r < rows; ++r)
    for (int cidx = 0; cidx + 1 < cols; ++cidx)
      sp.push_back(norm(sub(proj[r * cols + cidx + 1], proj[r * cols + cidx])));
  double tol = tol_frac * Percentile(sp, 50.0);

  std::vector<int> det_idx;
  for (int i = 0; i < K; ++i)
    if (valid[i]) det_idx.push_back(i);
  if (det_idx.empty()) return;
  const int Nd = static_cast<int>(det_idx.size());

  // nearest detection per grid point, and nearest grid point per detection
  std::vector<int> best_det(R);
  std::vector<double> best_dist(R);
  std::vector<int> best_grid_for_det(Nd);
  {
    std::vector<double> dmin_det(Nd,
                                 std::numeric_limits<double>::infinity());
    for (int g = 0; g < R; ++g) {
      int bi = 0;
      double bd = std::numeric_limits<double>::infinity();
      for (int d = 0; d < Nd; ++d) {
        double dist = norm(sub(centers[det_idx[d]], proj[g]));
        if (dist < bd) {
          bd = dist;
          bi = d;
        }
        if (dist < dmin_det[d]) {
          dmin_det[d] = dist;
          best_grid_for_det[d] = g;
        }
      }
      best_det[g] = bi;
      best_dist[g] = bd;
    }
  }
  // greedy one-to-one in ascending distance order
  std::vector<int> order(R);
  for (int g = 0; g < R; ++g) order[g] = g;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return best_dist[a] < best_dist[b]; });
  std::vector<int64_t> nc(K, -1), nr(K, -1);
  for (int g : order) {
    if (best_dist[g] > tol) break;
    int i = det_idx[best_det[g]];
    if (nc[i] >= 0) continue;
    if (best_grid_for_det[best_det[g]] != g) continue;
    nc[i] = g % cols;
    nr[i] = g / cols;
  }
  gcol->swap(nc);
  grow->swap(nr);
}

}  // namespace

extern "C" {

// Associate detections with the target grid.
//   centers: (K, 2) doubles [x, y]; radii: (K,); valid: (K,) uint8
//   pattern: (rows * cols,) int32 row-major 0/1
//   out_coords: (K, 2) int64 — (col, row) per detection, -1 when unmatched
// Returns n_matched (>= 0) on success, -1 on failure (no grid found).
int64_t vn_match_grid(const double* centers, const double* radii,
                      const uint8_t* valid, int64_t K,
                      const int32_t* pattern, int rows, int cols,
                      int min_matched, double min_agreement,
                      int64_t* out_coords) {
  for (int64_t i = 0; i < 2 * K; ++i) out_coords[i] = -1;

  std::vector<int> sel;
  for (int64_t i = 0; i < K; ++i)
    if (valid[i]) sel.push_back(static_cast<int>(i));
  if (static_cast<int>(sel.size()) < min_matched) return -1;

  std::vector<V2> c(sel.size());
  std::vector<double> rr(sel.size());
  for (size_t i = 0; i < sel.size(); ++i) {
    c[i] = {centers[2 * sel[i]], centers[2 * sel[i] + 1]};
    rr[i] = radii[sel[i]];
  }

  std::vector<int64_t> ci, cj;
  std::vector<uint8_t> taken;
  if (!BfsLattice(c, &ci, &cj, &taken)) return -1;
  int n_taken = 0;
  for (auto t : taken) n_taken += t;
  if (n_taken < min_matched) return -1;

  std::vector<int> bits;
  ClassifyRadii(rr, ci, cj, taken, &bits);

  // symmetry x translation search (grid_match._SYMMETRIES order)
  const int n = static_cast<int>(c.size());
  double best_score = -1, best_agree = 0;
  int best_sym = -1;
  int64_t best_di = 0, best_dj = 0;
  for (int sym = 0; sym < 8; ++sym) {
    bool tr = sym & 4, fi = sym & 2, fj = sym & 1;
    std::vector<int64_t> si(n), sj(n);
    for (int i = 0; i < n; ++i) {
      int64_t a = ci[i], b = cj[i];
      if (tr) std::swap(a, b);
      if (fi) a = -a;
      if (fj) b = -b;
      si[i] = a;
      sj[i] = b;
    }
    int64_t imin = INT64_MAX, jmin = INT64_MAX, imax = INT64_MIN,
            jmax = INT64_MIN;
    int n_known = 0;
    for (int i = 0; i < n; ++i) {
      if (!taken[i]) continue;
      imin = std::min(imin, si[i]);
      imax = std::max(imax, si[i]);
      jmin = std::min(jmin, sj[i]);
      jmax = std::max(jmax, sj[i]);
      if (bits[i] >= 0) ++n_known;
    }
    if (n_known < min_matched / 2) continue;
    for (int64_t di = -imin; di < cols - imax; ++di) {
      for (int64_t dj = -jmin; dj < rows - jmax; ++dj) {
        int use = 0, agree_cnt = 0;
        for (int i = 0; i < n; ++i) {
          if (!taken[i] || bits[i] < 0) continue;
          int64_t col = si[i] + di, row = sj[i] + dj;
          if (col < 0 || col >= cols || row < 0 || row >= rows) continue;
          ++use;
          if (pattern[row * cols + col] == bits[i]) ++agree_cnt;
        }
        if (use < min_matched / 2) continue;
        double agree = static_cast<double>(agree_cnt) / use;
        double score = agree * use;
        if (score > best_score) {
          best_score = score;
          best_agree = agree;
          best_sym = sym;
          best_di = di;
          best_dj = dj;
        }
      }
    }
  }
  if (best_sym < 0 || best_agree < min_agreement) return -1;

  std::vector<int64_t> gcol(K, -1), grow(K, -1);
  {
    bool tr = best_sym & 4, fi = best_sym & 2, fj = best_sym & 1;
    for (int i = 0; i < n; ++i) {
      if (!taken[i]) continue;
      int64_t a = ci[i], b = cj[i];
      if (tr) std::swap(a, b);
      if (fi) a = -a;
      if (fj) b = -b;
      int64_t col = a + best_di, row = b + best_dj;
      if (col < 0 || col >= cols || row < 0 || row >= rows) continue;
      gcol[sel[i]] = col;
      grow[sel[i]] = row;
    }
  }

  std::vector<V2> all_centers(K);
  std::vector<uint8_t> vv(K);
  for (int64_t i = 0; i < K; ++i) {
    all_centers[i] = {centers[2 * i], centers[2 * i + 1]};
    vv[i] = valid[i];
  }
  HomographyReassociate(all_centers, vv, &gcol, &grow, rows, cols, 0.3);

  int64_t n_matched = 0;
  for (int64_t i = 0; i < K; ++i) {
    out_coords[2 * i] = gcol[i];
    out_coords[2 * i + 1] = grow[i];
    if (gcol[i] >= 0) ++n_matched;
  }
  return n_matched;
}

// Batch association over F frames with a thread pool — the config-5 scale
// path (10k+ frames x 4 cameras): per-frame matching is independent, so
// frames are striped over hardware threads (ctypes releases the GIL for the
// whole call).
//   centers: (F, K, 2); radii: (F, K); valid: (F, K) uint8
//   out_coords: (F, K, 2) int64; out_n: (F,) int64 n_matched or -1
//   nthreads <= 0 selects hardware_concurrency
void vn_match_grid_batch(const double* centers, const double* radii,
                         const uint8_t* valid, int64_t F, int64_t K,
                         const int32_t* pattern, int rows, int cols,
                         int min_matched, double min_agreement,
                         int64_t* out_coords, int64_t* out_n, int nthreads) {
  if (nthreads <= 0) {
    nthreads = static_cast<int>(std::thread::hardware_concurrency());
    if (nthreads <= 0) nthreads = 4;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t f = next.fetch_add(1);
      if (f >= F) break;
      out_n[f] = vn_match_grid(centers + 2 * K * f, radii + K * f,
                               valid + K * f, K, pattern, rows, cols,
                               min_matched, min_agreement,
                               out_coords + 2 * K * f);
    }
  };
  std::vector<std::thread> pool;
  int nt = static_cast<int>(std::min<int64_t>(nthreads, F));
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
