// Host-side rotated-box geometry for evaluation (C++, ctypes ABI).
//
// TPU-native framework layout: device compute is JAX/XLA; the host-side
// evaluation path (rotated mAP over ~20k images x 3 datasets,
// SURVEY.md §6/§7) needs a fast CPU IoU matrix + greedy NMS without
// multiprocessing pools. This library implements the same
// Green's-theorem interval-clipping intersection as the device kernel
// (sm3det_tpu/ops/rotated_iou.py) in vectorizable scalar C++.
//
// Build: tools/build_native.sh -> libsm3det_geometry.so
// ABI:
//   void box_iou_rotated(const float* b1, int n1, const float* b2,
//                        int n2, float* out);      // out[n1*n2]
//   int  nms_rotated(const float* boxes, const float* scores, int n,
//                    float iou_thr, int* keep);    // returns n_keep

#include <algorithm>
#include <cmath>
#include <cstring>

namespace {

struct P2 {
  float x, y;
};

// corners of (cx, cy, w, h, theta)
inline void corners(const float* b, P2* c) {
  const float cx = b[0], cy = b[1], w = b[2], h = b[3], a = b[4];
  const float ca = std::cos(a), sa = std::sin(a);
  const float wx = 0.5f * w * ca, wy = 0.5f * w * sa;
  const float hx = -0.5f * h * sa, hy = 0.5f * h * ca;
  c[0] = {cx - wx - hx, cy - wy - hy};
  c[1] = {cx + wx - hx, cy + wy - hy};
  c[2] = {cx + wx + hx, cy + wy + hy};
  c[3] = {cx - wx + hx, cy - wy + hy};
}

// Green's contribution of sub's edges clipped inside clip (both CCW).
inline float edge_clip_contrib(const P2* sub, const P2* clip, float eps) {
  float total = 0.f;
  for (int i = 0; i < 4; ++i) {
    const P2 p = sub[i];
    const P2 q = sub[(i + 1) & 3];
    const float dx = q.x - p.x, dy = q.y - p.y;
    float t_lo = 0.f, t_hi = 1.f;
    for (int k = 0; k < 4; ++k) {
      const P2 o = clip[k];
      const P2 e = clip[(k + 1) & 3];
      const float ex = e.x - o.x, ey = e.y - o.y;
      const float el = std::max(std::sqrt(ex * ex + ey * ey), 1e-8f);
      const float a0 = (ex * (p.y - o.y) - ey * (p.x - o.x)) / el + eps;
      const float b0 = (ex * dy - ey * dx) / el;
      if (std::fabs(b0) < 1e-8f) {
        if (a0 < 0.f) { t_lo = 1.f; t_hi = 0.f; break; }
      } else {
        const float tc = -a0 / b0;
        if (b0 > 0.f) t_lo = std::max(t_lo, tc);
        else          t_hi = std::min(t_hi, tc);
        if (t_lo >= t_hi) break;
      }
    }
    if (t_hi > t_lo) {
      t_lo = std::max(0.f, t_lo);
      t_hi = std::min(1.f, t_hi);
      const float x0 = p.x + t_lo * dx, y0 = p.y + t_lo * dy;
      const float x1 = p.x + t_hi * dx, y1 = p.y + t_hi * dy;
      total += 0.5f * (x0 * y1 - y0 * x1);
    }
  }
  return total;
}

inline float inter_area(const P2* a, const P2* b) {
  const float s = edge_clip_contrib(a, b, 1e-4f) +
                  edge_clip_contrib(b, a, -1e-4f);
  return s > 0.f ? s : 0.f;
}

}  // namespace

extern "C" {

void box_iou_rotated(const float* b1, int n1, const float* b2, int n2,
                     float* out) {
  for (int i = 0; i < n1; ++i) {
    P2 ca[4];
    corners(b1 + 5 * i, ca);
    const float a1 = b1[5 * i + 2] * b1[5 * i + 3];
    for (int j = 0; j < n2; ++j) {
      P2 cb[4];
      corners(b2 + 5 * j, cb);
      const float a2 = b2[5 * j + 2] * b2[5 * j + 3];
      const float inter = inter_area(ca, cb);
      const float uni = a1 + a2 - inter;
      out[i * n2 + j] = uni > 1e-8f ? inter / uni : 0.f;
    }
  }
}

int nms_rotated(const float* boxes, const float* scores, int n,
                float iou_thr, int* keep) {
  // score-descending order
  int* order = new int[n];
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order, order + n, [scores](int a, int b) {
    return scores[a] > scores[b];
  });
  bool* suppressed = new bool[n]();
  int n_keep = 0;
  for (int oi = 0; oi < n; ++oi) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep[n_keep++] = i;
    P2 ci[4];
    corners(boxes + 5 * i, ci);
    const float ai = boxes[5 * i + 2] * boxes[5 * i + 3];
    for (int oj = oi + 1; oj < n; ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      P2 cj[4];
      corners(boxes + 5 * j, cj);
      const float aj = boxes[5 * j + 2] * boxes[5 * j + 3];
      const float inter = inter_area(ci, cj);
      const float uni = ai + aj - inter;
      const float iou = uni > 1e-8f ? inter / uni : 0.f;
      if (iou > iou_thr) suppressed[j] = true;
    }
  }
  delete[] order;
  delete[] suppressed;
  return n_keep;
}

}  // extern "C"
