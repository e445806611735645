// Feature-based RGB-D pose backend: oriented-BRIEF corners + Hamming
// matching + RANSAC 3D-3D alignment.
//
// Native counterpart of the reference's ORB-SLAM2 binding
// (`use_orb_backend`, reference SLAM/tracker.py + orbslam2 C++ module):
// the reference delegates feature-based camera tracking to a C++ backend
// and fuses it with ICP. This is a from-scratch, dependency-free
// implementation of that capability: Harris-scored grid corners, rotated
// BRIEF-256 descriptors, ratio-test Hamming matching, and a RANSAC
// Kabsch/Horn alignment over depth-lifted 3D correspondences. Runs on the
// host CPU alongside the TPU compute path (same split as the reference:
// feature tracking never touches the accelerator).
//
// exported C API (ctypes-friendly):
//   ob_create(width, height, fx, fy, cx, cy, max_feats) -> handle
//   ob_track(handle, gray_u8, depth_f32, rel_pose_out[16]) -> n_inliers
//       rel_pose_out is T_{prev<-curr} row-major: x_prev = R x_curr + t.
//       Returns -1 before the first frame has been ingested, 0 on failure.
//   ob_reset(handle)
//   ob_destroy(handle)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};
static inline Vec3 operator-(const Vec3 &a, const Vec3 &b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
static inline Vec3 operator+(const Vec3 &a, const Vec3 &b) {
  return {a.x + b.x, a.y + b.y, a.z + b.z};
}
static inline Vec3 operator*(double s, const Vec3 &a) {
  return {s * a.x, s * a.y, s * a.z};
}
static inline double dot(const Vec3 &a, const Vec3 &b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline Vec3 cross(const Vec3 &a, const Vec3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline double norm(const Vec3 &a) { return std::sqrt(dot(a, a)); }
static inline Vec3 normalized(const Vec3 &a) {
  double n = norm(a);
  return n > 1e-12 ? (1.0 / n) * a : Vec3{0, 0, 0};
}

struct Mat3 {
  double m[3][3];
  static Mat3 identity() {
    Mat3 r{};
    r.m[0][0] = r.m[1][1] = r.m[2][2] = 1.0;
    return r;
  }
};
static inline Vec3 mul(const Mat3 &R, const Vec3 &v) {
  return {R.m[0][0] * v.x + R.m[0][1] * v.y + R.m[0][2] * v.z,
          R.m[1][0] * v.x + R.m[1][1] * v.y + R.m[1][2] * v.z,
          R.m[2][0] * v.x + R.m[2][1] * v.y + R.m[2][2] * v.z};
}
static inline Mat3 mulT(const Mat3 &A, const Mat3 &B) {  // A * B^T
  Mat3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      for (int k = 0; k < 3; ++k) r.m[i][j] += A.m[i][k] * B.m[j][k];
  return r;
}

struct Keypoint {
  float x, y;      // pixel
  float response;
  float angle;     // orientation (radians)
  Vec3 p3d;        // camera-frame 3D (from depth)
  bool has3d;
};

struct Frame {
  std::vector<Keypoint> kps;
  std::vector<uint64_t> desc;  // 4 x uint64 per keypoint
};

// ---------------------------------------------------------------- detector
// Harris corner response on Sobel gradients, box-filtered 5x5, grid NMS.
void detect(const uint8_t *img, int W, int H, int max_feats, int cell,
            std::vector<Keypoint> &out) {
  std::vector<float> ixx((size_t)W * H, 0.f), iyy((size_t)W * H, 0.f),
      ixy((size_t)W * H, 0.f);
  for (int y = 1; y < H - 1; ++y) {
    for (int x = 1; x < W - 1; ++x) {
      const uint8_t *r0 = img + (size_t)(y - 1) * W;
      const uint8_t *r1 = img + (size_t)y * W;
      const uint8_t *r2 = img + (size_t)(y + 1) * W;
      float gx = (float)(r0[x + 1] - r0[x - 1]) +
                 2.f * (float)(r1[x + 1] - r1[x - 1]) +
                 (float)(r2[x + 1] - r2[x - 1]);
      float gy = (float)(r2[x - 1] - r0[x - 1]) +
                 2.f * (float)(r2[x] - r0[x]) +
                 (float)(r2[x + 1] - r0[x + 1]);
      size_t i = (size_t)y * W + x;
      ixx[i] = gx * gx;
      iyy[i] = gy * gy;
      ixy[i] = gx * gy;
    }
  }
  // 5x5 box filter via running sums (separable)
  auto boxfilt = [&](std::vector<float> &a) {
    std::vector<float> tmp((size_t)W * H, 0.f);
    for (int y = 0; y < H; ++y) {
      const float *row = a.data() + (size_t)y * W;
      float *trow = tmp.data() + (size_t)y * W;
      float s = 0;
      for (int x = 0; x < std::min(5, W); ++x) s += row[x];
      for (int x = 2; x < W - 2; ++x) {
        trow[x] = s;
        if (x + 3 < W) s += row[x + 3] - row[x - 2];
      }
    }
    for (int x = 0; x < W; ++x) {
      float s = 0;
      for (int y = 0; y < std::min(5, H); ++y) s += tmp[(size_t)y * W + x];
      for (int y = 2; y < H - 2; ++y) {
        a[(size_t)y * W + x] = s;
        if (y + 3 < H) s += tmp[(size_t)(y + 3) * W + x] - tmp[(size_t)(y - 2) * W + x];
      }
    }
  };
  boxfilt(ixx);
  boxfilt(iyy);
  boxfilt(ixy);

  const int margin = 20;  // room for the descriptor patch
  int gw = (W + cell - 1) / cell, gh = (H + cell - 1) / cell;
  std::vector<Keypoint> best((size_t)gw * gh,
                             Keypoint{0, 0, -1.f, 0, {0, 0, 0}, false});
  for (int y = margin; y < H - margin; ++y) {
    for (int x = margin; x < W - margin; ++x) {
      size_t i = (size_t)y * W + x;
      float det = ixx[i] * iyy[i] - ixy[i] * ixy[i];
      float tr = ixx[i] + iyy[i];
      float R = det - 0.04f * tr * tr;
      Keypoint &b = best[(size_t)(y / cell) * gw + (x / cell)];
      if (R > b.response) b = Keypoint{(float)x, (float)y, R, 0, {0, 0, 0}, false};
    }
  }
  std::vector<Keypoint> cand;
  for (auto &k : best)
    if (k.response > 1e4f) cand.push_back(k);
  std::sort(cand.begin(), cand.end(),
            [](const Keypoint &a, const Keypoint &b) {
              return a.response > b.response;
            });
  if ((int)cand.size() > max_feats) cand.resize(max_feats);
  out = std::move(cand);
}

// ------------------------------------------------------------- descriptors
// Fixed BRIEF-256 sampling pattern from a deterministic LCG; rotated by the
// intensity-centroid orientation (rBRIEF).
struct Pattern {
  int8_t pts[256][4];  // x1,y1,x2,y2 in [-13,13]
  Pattern() {
    uint64_t s = 0x9e3779b97f4a7c15ull;
    auto rnd = [&]() {
      s = s * 6364136223846793005ull + 1442695040888963407ull;
      // gaussian-ish via sum of uniforms, clipped
      int v = (int)((s >> 33) % 27) + (int)((s >> 13) % 27) - 26;
      return (int8_t)std::max(-13, std::min(13, v / 2 + (int)((s >> 53) % 14) - 6));
    };
    for (auto &p : pts) {
      p[0] = rnd();
      p[1] = rnd();
      p[2] = rnd();
      p[3] = rnd();
    }
  }
};
static const Pattern kPattern;

float orientation(const uint8_t *img, int W, int H, int cx, int cy) {
  double m01 = 0, m10 = 0;
  for (int dy = -7; dy <= 7; ++dy)
    for (int dx = -7; dx <= 7; ++dx) {
      if (dx * dx + dy * dy > 49) continue;
      uint8_t v = img[(size_t)(cy + dy) * W + (cx + dx)];
      m10 += dx * v;
      m01 += dy * v;
    }
  return (float)std::atan2(m01, m10);
}

void describe(const uint8_t *img, int W, int H, std::vector<Keypoint> &kps,
              std::vector<uint64_t> &desc) {
  desc.assign(kps.size() * 4, 0ull);
  for (size_t k = 0; k < kps.size(); ++k) {
    int cx = (int)kps[k].x, cy = (int)kps[k].y;
    float th = orientation(img, W, H, cx, cy);
    kps[k].angle = th;
    float c = std::cos(th), sn = std::sin(th);
    uint64_t *d = desc.data() + 4 * k;
    for (int i = 0; i < 256; ++i) {
      const int8_t *p = kPattern.pts[i];
      int x1 = cx + (int)std::lround(c * p[0] - sn * p[1]);
      int y1 = cy + (int)std::lround(sn * p[0] + c * p[1]);
      int x2 = cx + (int)std::lround(c * p[2] - sn * p[3]);
      int y2 = cy + (int)std::lround(sn * p[2] + c * p[3]);
      x1 = std::max(0, std::min(W - 1, x1));
      y1 = std::max(0, std::min(H - 1, y1));
      x2 = std::max(0, std::min(W - 1, x2));
      y2 = std::max(0, std::min(H - 1, y2));
      if (img[(size_t)y1 * W + x1] < img[(size_t)y2 * W + x2])
        d[i >> 6] |= 1ull << (i & 63);
    }
  }
}

// ---------------------------------------------------------------- matching
static inline int hamming(const uint64_t *a, const uint64_t *b) {
  return __builtin_popcountll(a[0] ^ b[0]) + __builtin_popcountll(a[1] ^ b[1]) +
         __builtin_popcountll(a[2] ^ b[2]) + __builtin_popcountll(a[3] ^ b[3]);
}

void match(const Frame &a, const Frame &b, std::vector<std::pair<int, int>> &m) {
  m.clear();
  for (size_t i = 0; i < a.kps.size(); ++i) {
    int best = 256, second = 256, bj = -1;
    const uint64_t *da = a.desc.data() + 4 * i;
    for (size_t j = 0; j < b.kps.size(); ++j) {
      int h = hamming(da, b.desc.data() + 4 * j);
      if (h < best) {
        second = best;
        best = h;
        bj = (int)j;
      } else if (h < second) {
        second = h;
      }
    }
    if (bj >= 0 && best < 64 && best * 10 < second * 8)  // ratio 0.8
      m.emplace_back((int)i, bj);
  }
}

// -------------------------------------------------------------- alignment
// 4x4 Jacobi eigensolver for Horn's quaternion method (refinement step).
void jacobi4(double A[4][4], double V[4][4]) {
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) V[i][j] = (i == j);
  for (int sweep = 0; sweep < 32; ++sweep) {
    double off = 0;
    for (int p = 0; p < 4; ++p)
      for (int q = p + 1; q < 4; ++q) off += A[p][q] * A[p][q];
    if (off < 1e-18) break;
    for (int p = 0; p < 4; ++p)
      for (int q = p + 1; q < 4; ++q) {
        if (std::fabs(A[p][q]) < 1e-15) continue;
        double theta = (A[q][q] - A[p][p]) / (2 * A[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1));
        double c = 1 / std::sqrt(t * t + 1), s = t * c;
        for (int k = 0; k < 4; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = c * akp - s * akq;
          A[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 4; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = c * apk - s * aqk;
          A[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 4; ++k) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = c * vkp - s * vkq;
          V[k][q] = s * vkp + c * vkq;
        }
      }
  }
}

// Horn closed-form: R,t minimizing sum |prev_i - (R curr_i + t)|^2.
bool horn(const std::vector<Vec3> &curr, const std::vector<Vec3> &prev,
          Mat3 &R, Vec3 &t) {
  size_t n = curr.size();
  if (n < 3) return false;
  Vec3 mc{0, 0, 0}, mp{0, 0, 0};
  for (size_t i = 0; i < n; ++i) {
    mc = mc + curr[i];
    mp = mp + prev[i];
  }
  mc = (1.0 / n) * mc;
  mp = (1.0 / n) * mp;
  double S[3][3] = {{0}};
  for (size_t i = 0; i < n; ++i) {
    Vec3 a = curr[i] - mc, b = prev[i] - mp;
    double av[3] = {a.x, a.y, a.z}, bv[3] = {b.x, b.y, b.z};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) S[r][c] += av[r] * bv[c];
  }
  double N[4][4] = {
      {S[0][0] + S[1][1] + S[2][2], S[1][2] - S[2][1], S[2][0] - S[0][2],
       S[0][1] - S[1][0]},
      {S[1][2] - S[2][1], S[0][0] - S[1][1] - S[2][2], S[0][1] + S[1][0],
       S[2][0] + S[0][2]},
      {S[2][0] - S[0][2], S[0][1] + S[1][0], S[1][1] - S[0][0] - S[2][2],
       S[1][2] + S[2][1]},
      {S[0][1] - S[1][0], S[2][0] + S[0][2], S[1][2] + S[2][1],
       S[2][2] - S[0][0] - S[1][1]}};
  double V[4][4];
  jacobi4(N, V);
  int bi = 0;
  for (int i = 1; i < 4; ++i)
    if (N[i][i] > N[bi][bi]) bi = i;
  double qw = V[0][bi], qx = V[1][bi], qy = V[2][bi], qz = V[3][bi];
  double nq = std::sqrt(qw * qw + qx * qx + qy * qy + qz * qz);
  if (nq < 1e-12) return false;
  qw /= nq;
  qx /= nq;
  qy /= nq;
  qz /= nq;
  R.m[0][0] = 1 - 2 * (qy * qy + qz * qz);
  R.m[0][1] = 2 * (qx * qy - qw * qz);
  R.m[0][2] = 2 * (qx * qz + qw * qy);
  R.m[1][0] = 2 * (qx * qy + qw * qz);
  R.m[1][1] = 1 - 2 * (qx * qx + qz * qz);
  R.m[1][2] = 2 * (qy * qz - qw * qx);
  R.m[2][0] = 2 * (qx * qz - qw * qy);
  R.m[2][1] = 2 * (qy * qz + qw * qx);
  R.m[2][2] = 1 - 2 * (qx * qx + qy * qy);
  t = mp - mul(R, mc);
  return true;
}

// Exact 3-point rigid alignment via triad frames (RANSAC hypothesis).
bool triad(const Vec3 c[3], const Vec3 p[3], Mat3 &R, Vec3 &t) {
  auto frame = [](const Vec3 q[3], Mat3 &F) {
    Vec3 v1 = q[1] - q[0], v2 = q[2] - q[0];
    Vec3 e1 = normalized(v1);
    Vec3 e3 = normalized(cross(v1, v2));
    if (norm(e3) < 1e-9) return false;
    Vec3 e2 = cross(e3, e1);
    F.m[0][0] = e1.x; F.m[1][0] = e1.y; F.m[2][0] = e1.z;
    F.m[0][1] = e2.x; F.m[1][1] = e2.y; F.m[2][1] = e2.z;
    F.m[0][2] = e3.x; F.m[1][2] = e3.y; F.m[2][2] = e3.z;
    return true;
  };
  Mat3 Fc, Fp;
  if (!frame(c, Fc) || !frame(p, Fp)) return false;
  R = mulT(Fp, Fc);  // Fp * Fc^T
  Vec3 mc = (1.0 / 3) * (c[0] + c[1] + c[2]);
  Vec3 mp = (1.0 / 3) * (p[0] + p[1] + p[2]);
  t = mp - mul(R, mc);
  return true;
}

struct Tracker {
  int W, H, max_feats;
  double fx, fy, cx, cy;
  Frame prev;
  bool has_prev = false;
  uint64_t rng = 0x2545F4914F6CDD1Dull;
  uint32_t rand_u32() {
    rng ^= rng << 13;
    rng ^= rng >> 7;
    rng ^= rng << 17;
    return (uint32_t)(rng >> 32);
  }

  void lift(const float *depth, std::vector<Keypoint> &kps) {
    for (auto &k : kps) {
      float d = depth[(size_t)((int)k.y) * W + (int)k.x];
      if (d > 0.05f && d < 20.f && std::isfinite(d)) {
        k.p3d = {(k.x - cx) / fx * d, (k.y - cy) / fy * d, (double)d};
        k.has3d = true;
      } else {
        k.has3d = false;
      }
    }
  }

  int track(const uint8_t *gray, const float *depth, double *pose_out) {
    Frame cur;
    detect(gray, W, H, max_feats, 12, cur.kps);
    describe(gray, W, H, cur.kps, cur.desc);
    lift(depth, cur.kps);
    if (!has_prev) {
      prev = std::move(cur);
      has_prev = true;
      return -1;
    }
    std::vector<std::pair<int, int>> m;
    match(cur, prev, m);
    std::vector<Vec3> pc, pp;
    for (auto &pr : m) {
      if (cur.kps[pr.first].has3d && prev.kps[pr.second].has3d) {
        pc.push_back(cur.kps[pr.first].p3d);
        pp.push_back(prev.kps[pr.second].p3d);
      }
    }
    prev = std::move(cur);
    size_t n = pc.size();
    if (n < 6) return 0;

    Mat3 bestR = Mat3::identity();
    Vec3 bestT{0, 0, 0};
    int best_inl = 0;
    for (int it = 0; it < 256; ++it) {
      int i0 = rand_u32() % n, i1 = rand_u32() % n, i2 = rand_u32() % n;
      if (i0 == i1 || i1 == i2 || i0 == i2) continue;
      Vec3 c[3] = {pc[i0], pc[i1], pc[i2]};
      Vec3 p[3] = {pp[i0], pp[i1], pp[i2]};
      Mat3 R;
      Vec3 t;
      if (!triad(c, p, R, t)) continue;
      int inl = 0;
      for (size_t i = 0; i < n; ++i) {
        Vec3 e = pp[i] - (mul(R, pc[i]) + t);
        double thr = 0.02 + 0.01 * pc[i].z;
        if (dot(e, e) < thr * thr) ++inl;
      }
      if (inl > best_inl) {
        best_inl = inl;
        bestR = R;
        bestT = t;
      }
    }
    if (best_inl < 6) return 0;
    // refine with Horn on the inlier set
    std::vector<Vec3> ic, ip;
    for (size_t i = 0; i < n; ++i) {
      Vec3 e = pp[i] - (mul(bestR, pc[i]) + bestT);
      double thr = 0.02 + 0.01 * pc[i].z;
      if (dot(e, e) < thr * thr) {
        ic.push_back(pc[i]);
        ip.push_back(pp[i]);
      }
    }
    Mat3 R = bestR;
    Vec3 t = bestT;
    if (!horn(ic, ip, R, t)) {
      R = bestR;
      t = bestT;
    }
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) pose_out[4 * i + j] = R.m[i][j];
    pose_out[3] = t.x;
    pose_out[7] = t.y;
    pose_out[11] = t.z;
    pose_out[12] = pose_out[13] = pose_out[14] = 0;
    pose_out[15] = 1;
    return best_inl;
  }
};

}  // namespace

extern "C" {

void *ob_create(int width, int height, double fx, double fy, double cx,
                double cy, int max_feats) {
  auto *t = new Tracker();
  t->W = width;
  t->H = height;
  t->fx = fx;
  t->fy = fy;
  t->cx = cx;
  t->cy = cy;
  t->max_feats = max_feats > 0 ? max_feats : 1000;
  return t;
}

int ob_track(void *h, const uint8_t *gray, const float *depth,
             double *pose_out) {
  for (int i = 0; i < 16; ++i) pose_out[i] = (i % 5 == 0) ? 1.0 : 0.0;
  return static_cast<Tracker *>(h)->track(gray, depth, pose_out);
}

void ob_reset(void *h) { static_cast<Tracker *>(h)->has_prev = false; }

void ob_destroy(void *h) { delete static_cast<Tracker *>(h); }

}  // extern "C"
