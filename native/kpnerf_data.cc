// kpnerf_data — native data-pipeline core for keypointnerf_tpu.
//
// The reference delegates its host-side image preprocessing to OpenCV +
// torch DataLoader worker processes (reference src/zju_dataset.py:273-286).
// This library implements the same hot host-path ops in portable C++ with
// OpenMP so the TPU feeder threads never wait on Python:
//
//   * kp_undistort      — inverse-map pinhole undistortion (radial k1..k3 +
//                         tangential p1,p2, cv2.undistort semantics) with
//                         bilinear sampling.
//   * kp_resize_area    — INTER_AREA box-filter downscale (the reference's
//                         image resize mode).
//   * kp_resize_nearest — nearest-neighbor resize (mask resize mode).
//   * kp_mask_apply     — zero background + build float mask plane.
//   * kp_prefetch_*     — a pthread worker pool + ring buffer that runs
//                         caller-registered sample indices through a C
//                         callback off the main thread.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this environment).
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- undistort
// img: H x W x C float32, dst same. K = [fx, 0, cx; 0, fy, cy; 0, 0, 1]
// dist = [k1, k2, p1, p2, k3] (OpenCV ordering).
void kp_undistort(const float* src, float* dst, int h, int w, int c,
                  const float* K, const float* dist) {
  const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];
  const float k1 = dist[0], k2 = dist[1], p1 = dist[2], p2 = dist[3],
              k3 = dist[4];
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      // normalized coords of the *undistorted* pixel
      const float xn = (x - cx) / fx;
      const float yn = (y - cy) / fy;
      const float r2 = xn * xn + yn * yn;
      const float radial = 1.0f + r2 * (k1 + r2 * (k2 + r2 * k3));
      const float xd =
          xn * radial + 2.0f * p1 * xn * yn + p2 * (r2 + 2.0f * xn * xn);
      const float yd =
          yn * radial + p1 * (r2 + 2.0f * yn * yn) + 2.0f * p2 * xn * yn;
      // back to pixel coords in the distorted source image; clamp float
      // round-off at the exact border before the outside-image test
      float sx = xd * fx + cx;
      float sy = yd * fy + cy;
      const float eps = 1e-3f;
      if (sx > -eps && sx < 0.0f) sx = 0.0f;
      if (sy > -eps && sy < 0.0f) sy = 0.0f;
      if (sx > w - 1.0f && sx < w - 1.0f + eps) sx = w - 1.0f;
      if (sy > h - 1.0f && sy < h - 1.0f + eps) sy = h - 1.0f;

      float* out = dst + (static_cast<int64_t>(y) * w + x) * c;
      if (sx < 0.0f || sy < 0.0f || sx > w - 1.0f || sy > h - 1.0f) {
        for (int ch = 0; ch < c; ++ch) out[ch] = 0.0f;
        continue;
      }
      const int x0 = static_cast<int>(sx);
      const int y0 = static_cast<int>(sy);
      const int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      const int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
      const float ax = sx - x0, ay = sy - y0;
      const float* p00 = src + (static_cast<int64_t>(y0) * w + x0) * c;
      const float* p01 = src + (static_cast<int64_t>(y0) * w + x1) * c;
      const float* p10 = src + (static_cast<int64_t>(y1) * w + x0) * c;
      const float* p11 = src + (static_cast<int64_t>(y1) * w + x1) * c;
      for (int ch = 0; ch < c; ++ch) {
        const float top = p00[ch] + ax * (p01[ch] - p00[ch]);
        const float bot = p10[ch] + ax * (p11[ch] - p10[ch]);
        out[ch] = top + ay * (bot - top);
      }
    }
  }
}

// ------------------------------------------------------------- resize: AREA
// Box-filter downscale, matching cv2 INTER_AREA for integer and fractional
// scale factors. src: sh x sw x c, dst: dh x dw x c.
void kp_resize_area(const float* src, float* dst, int sh, int sw, int dh,
                    int dw, int c) {
  const double scale_y = static_cast<double>(sh) / dh;
  const double scale_x = static_cast<double>(sw) / dw;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    const double fy0 = y * scale_y, fy1 = (y + 1) * scale_y;
    const int iy0 = static_cast<int>(fy0);
    const int iy1 = std::min(static_cast<int>(std::ceil(fy1)), sh);
    for (int x = 0; x < dw; ++x) {
      const double fx0 = x * scale_x, fx1 = (x + 1) * scale_x;
      const int ix0 = static_cast<int>(fx0);
      const int ix1 = std::min(static_cast<int>(std::ceil(fx1)), sw);
      float* out = dst + (static_cast<int64_t>(y) * dw + x) * c;
      for (int ch = 0; ch < c; ++ch) out[ch] = 0.0f;
      double wsum = 0.0;
      for (int yy = iy0; yy < iy1; ++yy) {
        const double wy = std::min<double>(yy + 1, fy1) - std::max<double>(yy, fy0);
        for (int xx = ix0; xx < ix1; ++xx) {
          const double wx =
              std::min<double>(xx + 1, fx1) - std::max<double>(xx, fx0);
          const double wgt = wx * wy;
          const float* p = src + (static_cast<int64_t>(yy) * sw + xx) * c;
          for (int ch = 0; ch < c; ++ch)
            out[ch] += static_cast<float>(wgt * p[ch]);
          wsum += wgt;
        }
      }
      const float inv = static_cast<float>(1.0 / wsum);
      for (int ch = 0; ch < c; ++ch) out[ch] *= inv;
    }
  }
}

// --------------------------------------------------------- resize: NEAREST
void kp_resize_nearest(const float* src, float* dst, int sh, int sw, int dh,
                       int dw, int c) {
  const double scale_y = static_cast<double>(sh) / dh;
  const double scale_x = static_cast<double>(sw) / dw;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    // cv2 INTER_NEAREST: floor(dst * scale)
    int sy = static_cast<int>(y * scale_y);
    if (sy >= sh) sy = sh - 1;
    for (int x = 0; x < dw; ++x) {
      int sx = static_cast<int>(x * scale_x);
      if (sx >= sw) sx = sw - 1;
      std::memcpy(dst + (static_cast<int64_t>(y) * dw + x) * c,
                  src + (static_cast<int64_t>(sy) * sw + sx) * c,
                  sizeof(float) * c);
    }
  }
}

// -------------------------------------------------------------- mask apply
// img: H x W x 3 in/out; mask_in: H x W (any nonzero = fg);
// mask_out: H x W float {0, 1}. Zeroes background pixels in-place.
void kp_mask_apply(float* img, const float* mask_in, float* mask_out, int h,
                   int w) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < static_cast<int64_t>(h) * w; ++i) {
    const bool fg = mask_in[i] != 0.0f;
    mask_out[i] = fg ? 1.0f : 0.0f;
    if (!fg) {
      img[i * 3 + 0] = 0.0f;
      img[i * 3 + 1] = 0.0f;
      img[i * 3 + 2] = 0.0f;
    }
  }
}

// ---------------------------------------------------------------- prefetch
// A worker pool that calls back into the host (Python releases the GIL via
// ctypes) to load sample indices ahead of consumption, preserving order.
typedef void (*kp_load_fn)(int64_t index, void* user);

struct KpPrefetcher {
  std::vector<std::thread> workers;
  std::deque<int64_t> pending;       // indices not yet picked up
  std::queue<int64_t> done;          // completed indices, arbitrary order
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::atomic<bool> stop{false};
  kp_load_fn fn = nullptr;
  void* user = nullptr;
};

void* kp_prefetch_create(kp_load_fn fn, void* user, int n_threads) {
  auto* p = new KpPrefetcher();
  p->fn = fn;
  p->user = user;
  for (int t = 0; t < n_threads; ++t) {
    p->workers.emplace_back([p]() {
      for (;;) {
        int64_t idx;
        {
          std::unique_lock<std::mutex> lk(p->mu);
          p->cv_work.wait(lk, [p] { return p->stop || !p->pending.empty(); });
          if (p->stop && p->pending.empty()) return;
          idx = p->pending.front();
          p->pending.pop_front();
        }
        p->fn(idx, p->user);
        {
          std::lock_guard<std::mutex> lk(p->mu);
          p->done.push(idx);
        }
        p->cv_done.notify_all();
      }
    });
  }
  return p;
}

void kp_prefetch_submit(void* handle, const int64_t* indices, int n) {
  auto* p = static_cast<KpPrefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    for (int i = 0; i < n; ++i) p->pending.push_back(indices[i]);
  }
  p->cv_work.notify_all();
}

// Blocks until one completed index is available; returns it.
int64_t kp_prefetch_wait(void* handle) {
  auto* p = static_cast<KpPrefetcher*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [p] { return !p->done.empty(); });
  int64_t idx = p->done.front();
  p->done.pop();
  return idx;
}

void kp_prefetch_destroy(void* handle) {
  auto* p = static_cast<KpPrefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_work.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
