// Native host-side data-path kernels for ecologysemanticsegmentation_tpu.
//
// The reference delegates all native compute to pip dependencies (SURVEY.md
// §2: "no C++/Rust/CUDA source in the repo").  This framework ships its own
// native host path for the operations the input pipeline hammers on a
// CPU-starved TPU host:
//
//   * scanline polygon rasterization (COCO-txt / DeepFish polygon -> mask),
//   * box-filtered uint8 resize (mask downscale),
//   * mask binarize + area count in one pass,
//   * batched HWC->NHWC float conversion with /255 normalization.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Scanline-fill a polygon into a uint8 mask (value 255), even-odd rule.
// xs/ys: polygon vertices (n points). Mask is h x w, row-major.
void fill_polygon_u8(uint8_t* mask, int64_t h, int64_t w,
                     const int32_t* xs, const int32_t* ys, int64_t n) {
  if (n < 3) return;
  for (int64_t y = 0; y < h; ++y) {
    // gather x-intersections of polygon edges with scanline y+0.5
    double yc = static_cast<double>(y) + 0.5;
    std::vector<double> inters;
    inters.reserve(8);
    for (int64_t i = 0; i < n; ++i) {
      int64_t j = (i + 1) % n;
      double y0 = ys[i], y1 = ys[j];
      double x0 = xs[i], x1 = xs[j];
      if ((y0 <= yc && y1 > yc) || (y1 <= yc && y0 > yc)) {
        double t = (yc - y0) / (y1 - y0);
        inters.push_back(x0 + t * (x1 - x0));
      }
    }
    std::sort(inters.begin(), inters.end());
    for (size_t k = 0; k + 1 < inters.size(); k += 2) {
      int64_t x_start = std::max<int64_t>(0, (int64_t)std::max(0.0, inters[k] + 0.5));
      int64_t x_end = std::min<int64_t>(w, (int64_t)std::max(0.0, inters[k + 1] + 0.5));
      if (x_end > x_start)
        std::memset(mask + y * w + x_start, 255, (size_t)(x_end - x_start));
    }
  }
}

// Area-averaged uint8 resize (box filter): src (sh, sw) -> dst (dh, dw).
void resize_area_u8(const uint8_t* src, int64_t sh, int64_t sw,
                    uint8_t* dst, int64_t dh, int64_t dw) {
  for (int64_t y = 0; y < dh; ++y) {
    int64_t y0 = y * sh / dh;
    int64_t y1 = std::max(y0 + 1, (y + 1) * sh / dh);
    for (int64_t x = 0; x < dw; ++x) {
      int64_t x0 = x * sw / dw;
      int64_t x1 = std::max(x0 + 1, (x + 1) * sw / dw);
      uint64_t acc = 0;
      for (int64_t yy = y0; yy < y1; ++yy)
        for (int64_t xx = x0; xx < x1; ++xx)
          acc += src[yy * sw + xx];
      dst[y * dw + x] =
          static_cast<uint8_t>(acc / (uint64_t)((y1 - y0) * (x1 - x0)));
    }
  }
}

// Binarize in place at threshold (v > thr -> 255 else 0); returns positive count.
int64_t binarize_count_u8(uint8_t* mask, int64_t n, uint8_t thr) {
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (mask[i] > thr) {
      mask[i] = 255;
      ++count;
    } else {
      mask[i] = 0;
    }
  }
  return count;
}

// uint8 HWC image -> float32 /255 (contiguous, same layout).
void u8_to_f32_norm(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kInv = 1.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * kInv;
}

}  // extern "C"
