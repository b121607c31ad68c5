// Native host-side image preprocessing for the TPU feed pipeline.
//
// The reference's loader bottoms out in OpenCV's native resize/pad
// (reference utils/augmentations.py:136-140 letterbox; SURVEY.md §2.9 item 4
// lists those C++ kernels as ones our build must own). This is our
// first-party replacement: one pass per image doing INTER_LINEAR resize +
// 114-gray letterbox padding + BGR->RGB channel swap, written directly into
// the caller's preallocated NHWC uint8 batch, fanned out over a std::thread
// pool (no GIL — callers invoke through ctypes with the GIL released).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        preproc.cpp -o libpreproc.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Straight row copy with optional R/B channel swap (vectorizes under -O3).
inline void copy_swap_row(const uint8_t* src, uint8_t* dst, int w, bool swap_rb) {
  if (!swap_rb) {
    std::memcpy(dst, src, static_cast<size_t>(w) * 3);
    return;
  }
  for (int x = 0; x < w; ++x) {
    dst[x * 3 + 0] = src[x * 3 + 2];
    dst[x * 3 + 1] = src[x * 3 + 1];
    dst[x * 3 + 2] = src[x * 3 + 0];
  }
}

// Bilinear sample matching cv2.INTER_LINEAR geometry (half-pixel centers).
// Identity scale degenerates to a row copy — the hot case in the eval
// pipeline, where sources are pre-resized and this pass only pads+swaps.
inline void resize_bilinear_into(
    const uint8_t* src, int sh, int sw,            // src HWC (3ch)
    uint8_t* dst, int dh, int dw, int dst_stride,  // dst row stride in px*3
    int off_y, int off_x, bool swap_rb) {
  if (dh == sh && dw == sw) {
    for (int dy = 0; dy < dh; ++dy)
      copy_swap_row(src + static_cast<size_t>(dy) * sw * 3,
                    dst + (static_cast<size_t>(dy + off_y) * dst_stride + off_x) * 3, dw, swap_rb);
    return;
  }
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  // horizontal taps are identical for every row: compute once
  std::vector<int> xt0(dw), xt1(dw);
  std::vector<float> xw(dw);
  for (int dx = 0; dx < dw; ++dx) {
    float fx = (dx + 0.5f) * scale_x - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    xw[dx] = fx - x0;
    xt1[dx] = std::min(x0 + 1, sw - 1) * 3;
    xt0[dx] = std::max(x0, 0) * 3;
  }
  for (int dy = 0; dy < dh; ++dy) {
    float fy = (dy + 0.5f) * scale_y - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    uint8_t* out_row = dst + (static_cast<size_t>(dy + off_y) * dst_stride + off_x) * 3;
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
    for (int dx = 0; dx < dw; ++dx) {
      const float wx = xw[dx];
      const int x0 = xt0[dx], x1 = xt1[dx];
      const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx), w11 = wy * wx;
      for (int c = 0; c < 3; ++c) {
        int cc = swap_rb ? 2 - c : c;
        float v = w00 * row0[x0 + cc] + w01 * row0[x1 + cc] +
                  w10 * row1[x0 + cc] + w11 * row1[x1 + cc];
        out_row[dx * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

struct Job {
  const uint8_t* src;
  int sh, sw;
  uint8_t* dst;  // start of this image's (out_h, out_w, 3) slab
};

}  // namespace

extern "C" {

// Letterbox a batch of images into dst (n, out_h, out_w, 3) uint8.
// srcs: array of n pointers to HWC uint8 BGR images; shapes: n*(h, w) int32.
// Writes per-image (gain, pad_x, pad_y) into geom (n*3 float32) so callers
// can invert boxes exactly like the reference's letterbox return values.
void letterbox_batch(const uint8_t** srcs, const int32_t* shapes, int n,
                     uint8_t* dst, int out_h, int out_w, int swap_rb,
                     int scaleup, float* geom, int num_threads) {
  std::atomic<int> next{0};
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      const int sh = shapes[i * 2], sw = shapes[i * 2 + 1];
      float r = std::min(static_cast<float>(out_h) / sh, static_cast<float>(out_w) / sw);
      if (!scaleup) r = std::min(r, 1.0f);
      const int nw = static_cast<int>(std::lround(sw * r));
      const int nh = static_cast<int>(std::lround(sh * r));
      const float dwf = (out_w - nw) / 2.0f, dhf = (out_h - nh) / 2.0f;
      // reference rounds pad as round(d - 0.1) on the leading side
      const int off_x = static_cast<int>(std::lround(dwf - 0.1f));
      const int off_y = static_cast<int>(std::lround(dhf - 0.1f));
      uint8_t* slab = dst + static_cast<size_t>(i) * out_h * out_w * 3;
      std::memset(slab, 114, static_cast<size_t>(out_h) * out_w * 3);
      resize_bilinear_into(srcs[i], sh, sw, slab, nh, nw, out_w, off_y, off_x, swap_rb != 0);
      if (geom) {
        geom[i * 3 + 0] = r;
        geom[i * 3 + 1] = dwf;
        geom[i * 3 + 2] = dhf;
      }
    }
  };
  const int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Mosaic canvas assembly: fill dst (dh, dw, 3) with `fill`, then copy n_tiles
// rectangles src[sy:sy+h, sx:sx+w] -> dst[dy:dy+h, dx:dx+w]. This is the
// GIL-held numpy part of the train mosaic path (canvas np.full + four slice
// assignments were ~40% of the GIL-bound time capping the augmenting loader
// at ~50 img/s); a ctypes call releases the GIL so loader threads overlap.
// rects6: n_tiles * (dy, dx, sy, sx, h, w); shapes: n_tiles * (sh, sw).
void assemble_tiles(const uint8_t** srcs, const int32_t* shapes,
                    const int32_t* rects6, int n_tiles,
                    uint8_t* dst, int dh, int dw, int fill) {
  std::memset(dst, fill, static_cast<size_t>(dh) * dw * 3);
  for (int t = 0; t < n_tiles; ++t) {
    const int dy = rects6[t * 6 + 0], dx = rects6[t * 6 + 1];
    const int sy = rects6[t * 6 + 2], sx = rects6[t * 6 + 3];
    int h = rects6[t * 6 + 4], w = rects6[t * 6 + 5];
    const int sh = shapes[t * 2 + 0], sw = shapes[t * 2 + 1];
    // clip defensively to both buffers
    h = std::min({h, sh - sy, dh - dy});
    w = std::min({w, sw - sx, dw - dx});
    if (h <= 0 || w <= 0 || dy < 0 || dx < 0 || sy < 0 || sx < 0) continue;
    const size_t row_bytes = static_cast<size_t>(w) * 3;
    for (int y = 0; y < h; ++y) {
      std::memcpy(dst + ((static_cast<size_t>(dy + y) * dw) + dx) * 3,
                  srcs[t] + ((static_cast<size_t>(sy + y) * sw) + sx) * 3, row_bytes);
    }
  }
}

// Plain multithreaded bilinear resize batch (same-size sources), NHWC uint8.
void resize_batch(const uint8_t* src, int n, int sh, int sw, uint8_t* dst,
                  int dh, int dw, int num_threads) {
  std::atomic<int> next{0};
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      resize_bilinear_into(src + static_cast<size_t>(i) * sh * sw * 3, sh, sw,
                           dst + static_cast<size_t>(i) * dh * dw * 3, dh, dw, dw, 0, 0, false);
    }
  };
  const int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
