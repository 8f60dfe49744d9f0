// Host-side 3D box operations (C++, ctypes ABI).
//
// Native equivalent of the reference's numba-jitted host ops
// (reference: mmdetection3d/mmdet3d/core/post_processing/box3d_nms.py:181
// circle_nms and mmdet3d/core/bbox/box_np_ops.py rotated-overlap helpers;
// numba is not in this image, so the host eval path gets real native
// code). Exact rotated-rectangle overlap via polygon clipping, greedy
// rotated NMS, circle NMS, points-in-rotated-boxes.
//
// Build: g++ -O3 -march=native -shared -fPIC boxops.cpp -o libboxops.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

// Sutherland–Hodgman: clip polygon by half-plane to the LEFT of (a->b).
int clip_edge(const Pt* in, int n, Pt a, Pt b, Pt* out) {
  int m = 0;
  double ex = b.x - a.x, ey = b.y - a.y;
  auto side = [&](const Pt& p) { return ex * (p.y - a.y) - ey * (p.x - a.x); };
  for (int i = 0; i < n; ++i) {
    const Pt& cur = in[i];
    const Pt& nxt = in[(i + 1) % n];
    double sc = side(cur), sn = side(nxt);
    if (sc >= 0) out[m++] = cur;
    if ((sc >= 0) != (sn >= 0)) {
      double t = sc / (sc - sn);
      out[m++] = {cur.x + t * (nxt.x - cur.x), cur.y + t * (nxt.y - cur.y)};
    }
  }
  return m;
}

void corners_of(const double* b, Pt* c) {
  // b = [cx, cy, dx, dy, yaw]
  double cosy = std::cos(b[4]), siny = std::sin(b[4]);
  double hx = b[2] / 2, hy = b[3] / 2;
  const double ox[4] = {hx, hx, -hx, -hx};
  const double oy[4] = {-hy, hy, hy, -hy};
  for (int i = 0; i < 4; ++i) {
    c[i].x = b[0] + ox[i] * cosy - oy[i] * siny;
    c[i].y = b[1] + ox[i] * siny + oy[i] * cosy;
  }
}

double overlap_pair(const double* ba, const double* bb) {
  Pt a[4], b[4];
  corners_of(ba, a);
  corners_of(bb, b);
  Pt poly[16], tmp[16];
  std::memcpy(poly, a, sizeof(a));
  int n = 4;
  for (int e = 0; e < 4 && n > 2; ++e) {
    n = clip_edge(poly, n, b[e], b[(e + 1) % 4], tmp);
    std::memcpy(poly, tmp, n * sizeof(Pt));
  }
  if (n < 3) return 0.0;
  double area = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& p = poly[i];
    const Pt& q = poly[(i + 1) % n];
    area += p.x * q.y - q.x * p.y;
  }
  return std::abs(area) / 2;
}

}  // namespace

extern "C" {

// boxes (N, 5) [cx, cy, dx, dy, yaw] row-major double -> iou (N, M)
void boxes_iou_bev(const double* a, int64_t n, const double* b, int64_t m,
                   double* iou) {
  for (int64_t i = 0; i < n; ++i) {
    double area_a = a[i * 5 + 2] * a[i * 5 + 3];
    for (int64_t j = 0; j < m; ++j) {
      double area_b = b[j * 5 + 2] * b[j * 5 + 3];
      double inter = overlap_pair(a + i * 5, b + j * 5);
      double u = area_a + area_b - inter;
      iou[i * m + j] = u > 1e-12 ? inter / u : 0.0;
    }
  }
}

// greedy rotated NMS: boxes (N, 5) sorted externally or not; scores (N).
// keep flags out (N) uint8. Returns number kept.
int64_t nms_bev(const double* boxes, const double* scores, int64_t n,
                double thresh, uint8_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t x, int64_t y) { return scores[x] > scores[y]; });
  std::vector<uint8_t> alive(n, 1);
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (!alive[i]) continue;
    keep[i] = 1;
    ++kept;
    double area_i = boxes[i * 5 + 2] * boxes[i * 5 + 3];
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (!alive[j]) continue;
      double inter = overlap_pair(boxes + i * 5, boxes + j * 5);
      double u = area_i + boxes[j * 5 + 2] * boxes[j * 5 + 3] - inter;
      if (u > 1e-12 && inter / u > thresh) alive[j] = 0;
    }
  }
  return kept;
}

// circle NMS on centers (N, 2); suppress dist^2 < thresh.
int64_t circle_nms(const double* xy, const double* scores, int64_t n,
                   double thresh, uint8_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t x, int64_t y) { return scores[x] > scores[y]; });
  std::vector<uint8_t> alive(n, 1);
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (!alive[i]) continue;
    keep[i] = 1;
    ++kept;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (!alive[j]) continue;
      double dx = xy[i * 2] - xy[j * 2], dy = xy[i * 2 + 1] - xy[j * 2 + 1];
      if (dx * dx + dy * dy < thresh) alive[j] = 0;
    }
  }
  return kept;
}

// points (N, 3), boxes (M, 7) [x y z dx dy dz yaw], z = bottom center.
// out (N) int32: first containing box or -1.
void points_in_boxes(const double* pts, int64_t n, const double* boxes,
                     int64_t m, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = -1;
    for (int64_t j = 0; j < m; ++j) {
      const double* b = boxes + j * 7;
      double px = pts[i * 3] - b[0], py = pts[i * 3 + 1] - b[1],
             pz = pts[i * 3 + 2] - b[2];
      double cosy = std::cos(b[6]), siny = std::sin(b[6]);
      double lx = px * cosy + py * siny;
      double ly = -px * siny + py * cosy;
      if (std::abs(lx) <= b[3] / 2 && std::abs(ly) <= b[4] / 2 && pz >= 0 &&
          pz <= b[5]) {
        out[i] = (int32_t)j;
        break;
      }
    }
  }
}

}  // extern "C"
