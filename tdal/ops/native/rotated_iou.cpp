// Native CPU rotated-box IoU + greedy NMS.
//
// The TPU-native counterpart of the reference's CUDA kernels
// (det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu:104-414 — rotated-rect polygon
// clipping + bitmask NMS) lives on-device in tdal/core/{iou,nms}.py; this C++
// implementation is the independent host-side oracle used for parity tests and as a
// fast fallback for host pipelines (SURVEY.md §2.7: "C++ reference implementation for
// CPU parity tests"). Convention: boxes are [x, y, z, l, w, h, heading(CCW)], BEV
// footprint (x, y) x (l, w).
//
// Build: see build.py (g++ -O2 -shared -fPIC). C ABI for ctypes.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

constexpr double kEps = 1e-8;

void box_corners(const float* b5, Pt* out) {
  // b5 = [x, y, l, w, heading]
  const double x = b5[0], y = b5[1], l = b5[2], w = b5[3], h = b5[4];
  const double c = std::cos(h), s = std::sin(h);
  const double lx[4] = {-l / 2, -l / 2, l / 2, l / 2};
  const double ly[4] = {-w / 2, w / 2, w / 2, -w / 2};
  for (int i = 0; i < 4; ++i) {
    out[i].x = c * lx[i] - s * ly[i] + x;
    out[i].y = s * lx[i] + c * ly[i] + y;
  }
}

double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// Sutherland-Hodgman: clip polygon `poly` against the half-plane left of (a, b).
std::vector<Pt> clip_edge(const std::vector<Pt>& poly, const Pt& a, const Pt& b) {
  std::vector<Pt> out;
  const size_t n = poly.size();
  for (size_t i = 0; i < n; ++i) {
    const Pt& p = poly[i];
    const Pt& q = poly[(i + 1) % n];
    const double dp = cross(a, b, p);
    const double dq = cross(a, b, q);
    if (dp >= -kEps) out.push_back(p);
    if ((dp > kEps && dq < -kEps) || (dp < -kEps && dq > kEps)) {
      const double t = dp / (dp - dq);
      out.push_back({p.x + t * (q.x - p.x), p.y + t * (q.y - p.y)});
    }
  }
  return out;
}

double polygon_area(const std::vector<Pt>& poly) {
  if (poly.size() < 3) return 0.0;
  double area = 0.0;
  for (size_t i = 0; i < poly.size(); ++i) {
    const Pt& p = poly[i];
    const Pt& q = poly[(i + 1) % poly.size()];
    area += p.x * q.y - p.y * q.x;
  }
  return std::fabs(area) * 0.5;
}

// Signed-CCW corner ordering for the clip polygon.
void ensure_ccw(Pt* c) {
  double a = 0.0;
  for (int i = 0; i < 4; ++i) {
    const Pt& p = c[i];
    const Pt& q = c[(i + 1) % 4];
    a += p.x * q.y - p.y * q.x;
  }
  if (a < 0) std::swap(c[1], c[3]);
}

double overlap_bev(const float* a5, const float* b5) {
  Pt ca[4], cb[4];
  box_corners(a5, ca);
  box_corners(b5, cb);
  ensure_ccw(ca);
  ensure_ccw(cb);
  std::vector<Pt> poly(ca, ca + 4);
  for (int i = 0; i < 4 && !poly.empty(); ++i) {
    poly = clip_edge(poly, cb[i], cb[(i + 1) % 4]);
  }
  return polygon_area(poly);
}

}  // namespace

extern "C" {

// boxes: (n, 7) / (m, 7) row-major float32 [x,y,z,l,w,h,heading]; out: (n, m).
void boxes_iou_bev(const float* a, int n, const float* b, int m, float* out) {
  for (int i = 0; i < n; ++i) {
    const float a5[5] = {a[i * 7 + 0], a[i * 7 + 1], a[i * 7 + 3], a[i * 7 + 4],
                         a[i * 7 + 6]};
    const double area_a = (double)a[i * 7 + 3] * a[i * 7 + 4];
    for (int j = 0; j < m; ++j) {
      const float b5[5] = {b[j * 7 + 0], b[j * 7 + 1], b[j * 7 + 3], b[j * 7 + 4],
                           b[j * 7 + 6]};
      const double area_b = (double)b[j * 7 + 3] * b[j * 7 + 4];
      const double inter = overlap_bev(a5, b5);
      out[i * m + j] =
          (float)(inter / std::max(area_a + area_b - inter, kEps));
    }
  }
}

// 3D IoU with z-interval intersection (iou3d_nms_kernel semantics).
void boxes_iou_3d(const float* a, int n, const float* b, int m, float* out) {
  for (int i = 0; i < n; ++i) {
    const float a5[5] = {a[i * 7 + 0], a[i * 7 + 1], a[i * 7 + 3], a[i * 7 + 4],
                         a[i * 7 + 6]};
    const double va = (double)a[i * 7 + 3] * a[i * 7 + 4] * a[i * 7 + 5];
    const double za0 = a[i * 7 + 2] - a[i * 7 + 5] / 2.0;
    const double za1 = a[i * 7 + 2] + a[i * 7 + 5] / 2.0;
    for (int j = 0; j < m; ++j) {
      const float b5[5] = {b[j * 7 + 0], b[j * 7 + 1], b[j * 7 + 3], b[j * 7 + 4],
                           b[j * 7 + 6]};
      const double vb = (double)b[j * 7 + 3] * b[j * 7 + 4] * b[j * 7 + 5];
      const double zb0 = b[j * 7 + 2] - b[j * 7 + 5] / 2.0;
      const double zb1 = b[j * 7 + 2] + b[j * 7 + 5] / 2.0;
      const double hz = std::max(0.0, std::min(za1, zb1) - std::max(za0, zb0));
      const double inter = overlap_bev(a5, b5) * hz;
      out[i * m + j] = (float)(inter / std::max(va + vb - inter, kEps));
    }
  }
}

// Greedy rotated NMS by descending score. keep: preallocated (n,) int32;
// returns number kept via n_keep.
void nms_rotated(const float* boxes, const float* scores, int n, float thresh,
                 int* keep, int* n_keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int i, int j) { return scores[i] > scores[j]; });
  std::vector<char> suppressed(n, 0);
  int k = 0;
  for (int oi = 0; oi < n; ++oi) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep[k++] = i;
    const float a5[5] = {boxes[i * 7 + 0], boxes[i * 7 + 1], boxes[i * 7 + 3],
                         boxes[i * 7 + 4], boxes[i * 7 + 6]};
    const double area_a = (double)boxes[i * 7 + 3] * boxes[i * 7 + 4];
    for (int oj = oi + 1; oj < n; ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      const float b5[5] = {boxes[j * 7 + 0], boxes[j * 7 + 1], boxes[j * 7 + 3],
                           boxes[j * 7 + 4], boxes[j * 7 + 6]};
      const double area_b = (double)boxes[j * 7 + 3] * boxes[j * 7 + 4];
      const double inter = overlap_bev(a5, b5);
      const double iou = inter / std::max(area_a + area_b - inter, kEps);
      if (iou > thresh) suppressed[j] = 1;
    }
  }
  *n_keep = k;
}

}  // extern "C"
