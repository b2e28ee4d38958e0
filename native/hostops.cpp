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
//   * batched HWC->NHWC float conversion with /255 normalization,
//   * fused image decode + bilinear resize (libjpeg-turbo + libpng,
//     magic-byte sniffed) and a threaded decode ring that overlaps file
//     I/O + decode with device compute — the TPU-native form of the
//     reference's 3 DataLoader worker processes
//     (train_multiclass.py:374-376): worker *threads* into preallocated
//     slots, no forks, no tensor pickling.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: see native/build.sh (g++ -O3 -shared -fPIC -ljpeg -lpng).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#ifndef HOSTOPS_NO_JPEG
#include <jpeglib.h>
#ifndef HOSTOPS_NO_PNG
#include <png.h>
#endif
#endif

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

// ---------------------------------------------------------------------------
// JPEG decode + resize
// ---------------------------------------------------------------------------

#ifndef HOSTOPS_NO_JPEG

namespace {

// libjpeg's default error handler calls exit(); trampoline back instead.
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void jpeg_err_silent(j_common_ptr, int) {}
void jpeg_err_noop(j_common_ptr) {}

// Bilinear resize, half-pixel centers (cv2 INTER_LINEAR semantics, float
// accumulation instead of cv2's 11-bit fixed point: uint8 results agree
// within +/-1 LSB — same tolerance class the repo's PIL fallback documents,
// data/imops.py:15-16).  C channels interleaved.
void resize_bilinear_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                        uint8_t* dst, int64_t dh, int64_t dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, (size_t)(sh * sw * c));
    return;
  }
  const double sy = (double)sh / (double)dh;
  const double sx = (double)sw / (double)dw;
  std::vector<int64_t> x0s(dw), x1s(dw);
  std::vector<float> fxs(dw);
  for (int64_t x = 0; x < dw; ++x) {
    double fx = (x + 0.5) * sx - 0.5;
    if (fx < 0) fx = 0;
    int64_t x0 = (int64_t)fx;
    if (x0 > sw - 1) x0 = sw - 1;
    x0s[x] = x0;
    x1s[x] = std::min(x0 + 1, sw - 1);
    fxs[x] = (float)(fx - x0);
  }
  for (int64_t y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    if (fy < 0) fy = 0;
    int64_t y0 = (int64_t)fy;
    if (y0 > sh - 1) y0 = sh - 1;
    int64_t y1 = std::min(y0 + 1, sh - 1);
    float wy = (float)(fy - y0);
    const uint8_t* r0 = src + y0 * sw * c;
    const uint8_t* r1 = src + y1 * sw * c;
    uint8_t* out = dst + y * dw * c;
    for (int64_t x = 0; x < dw; ++x) {
      const int64_t o0 = x0s[x] * c, o1 = x1s[x] * c;
      const float wx = fxs[x];
      for (int64_t k = 0; k < c; ++k) {
        float top = r0[o0 + k] + wx * (r0[o1 + k] - r0[o0 + k]);
        float bot = r1[o0 + k] + wx * (r1[o1 + k] - r1[o0 + k]);
        float v = top + wy * (bot - top);
        out[x * c + k] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// Decode a JPEG from memory into a full-resolution BGR buffer.
// Returns true on success; fills rows/cols.  `fast_scale_to` > 0 enables
// libjpeg DCT-domain prescaling to the smallest scale >= that many pixels on
// the short side (perf mode; slightly different pixels than full decode).
bool decode_jpeg_bgr(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                     int64_t* rows, int64_t* cols, int64_t fast_scale_to) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  jerr.mgr.emit_message = jpeg_err_silent;
  jerr.mgr.output_message = jpeg_err_noop;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
#ifdef JCS_EXTENSIONS
  cinfo.out_color_space = JCS_EXT_BGR;  // libjpeg-turbo: BGR straight out
#else
  cinfo.out_color_space = JCS_RGB;  // plain libjpeg: swap to BGR below
#endif
  if (fast_scale_to > 0) {
    // Pick the smallest of libjpeg's M/8 scales whose output short side
    // still covers the target (IDCT does the first downscale for free).
    unsigned src_short = std::min(cinfo.image_width, cinfo.image_height);
    for (unsigned num = 1; num <= 8; ++num) {
      if ((unsigned long)src_short * num / 8 >= (unsigned long)fast_scale_to ||
          num == 8) {
        cinfo.scale_num = num;
        cinfo.scale_denom = 8;
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  *rows = cinfo.output_height;
  *cols = cinfo.output_width;
  out->resize((size_t)(*rows) * (size_t)(*cols) * 3);
  const size_t stride = (size_t)(*cols) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data() + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
#ifndef JCS_EXTENSIONS
  for (size_t i = 0; i + 2 < out->size(); i += 3)
    std::swap((*out)[i], (*out)[i + 2]);
#endif
  return true;
}

#ifndef HOSTOPS_NO_PNG
// Decode a PNG from memory into a full-resolution BGR buffer (libpng
// simplified API).  Alpha, if present, is composited against black — a
// documented deviation from cv2.imread(IMREAD_COLOR), which simply drops
// the alpha channel; identical for the opaque PNGs the datasets use.
bool decode_png_bgr(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                    int64_t* rows, int64_t* cols) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, len)) return false;
  image.format = PNG_FORMAT_BGR;
  out->resize(PNG_IMAGE_SIZE(image));
  png_color black = {0, 0, 0};
  if (!png_image_finish_read(&image, &black, out->data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  *rows = image.height;
  *cols = image.width;
  return true;
}
#endif  // HOSTOPS_NO_PNG

// Magic-byte dispatch: JPEG or (when built with libpng) PNG.
bool decode_image_bgr(const uint8_t* data, size_t len,
                      std::vector<uint8_t>* out, int64_t* rows, int64_t* cols,
                      int64_t fast_scale_to) {
  if (len >= 3 && data[0] == 0xFF && data[1] == 0xD8 && data[2] == 0xFF)
    return decode_jpeg_bgr(data, len, out, rows, cols, fast_scale_to);
#ifndef HOSTOPS_NO_PNG
  if (len >= 4 && data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' &&
      data[3] == 'G')
    return decode_png_bgr(data, len, out, rows, cols);
#endif
  return false;
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  buf->resize((size_t)n);
  size_t got = std::fread(buf->data(), 1, (size_t)n, f);
  std::fclose(f);
  return got == (size_t)n;
}

}  // namespace

extern "C" {

// Decode a JPEG byte buffer and bilinear-resize to (oh, ow) BGR u8.
// fast_scale_to: 0 = exact full decode; >0 = DCT prescale perf mode.
// Returns 0 on success, -1 on decode failure.
int64_t jpeg_decode_resize_bgr(const uint8_t* data, int64_t len, uint8_t* out,
                               int64_t oh, int64_t ow, int64_t fast_scale_to) {
  std::vector<uint8_t> full;
  int64_t rows = 0, cols = 0;
  if (!decode_jpeg_bgr(data, (size_t)len, &full, &rows, &cols, fast_scale_to))
    return -1;
  resize_bilinear_u8(full.data(), rows, cols, 3, out, oh, ow);
  return 0;
}

// Read a JPEG file and decode+resize as above.  Returns 0 / -1.
int64_t jpeg_read_resize_bgr(const char* path, uint8_t* out, int64_t oh,
                             int64_t ow, int64_t fast_scale_to) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  return jpeg_decode_resize_bgr(buf.data(), (int64_t)buf.size(), out, oh, ow,
                                fast_scale_to);
}

// Read ANY supported image file (magic-byte sniffed: JPEG, and PNG when
// built with libpng) and decode+resize to (oh, ow) BGR u8.  Returns 0 / -1.
int64_t image_read_resize_bgr(const char* path, uint8_t* out, int64_t oh,
                              int64_t ow, int64_t fast_scale_to) {
  std::vector<uint8_t> buf, full;
  int64_t rows = 0, cols = 0;
  if (!read_file(path, &buf)) return -1;
  if (!decode_image_bgr(buf.data(), buf.size(), &full, &rows, &cols,
                        fast_scale_to))
    return -1;
  resize_bilinear_u8(full.data(), rows, cols, 3, out, oh, ow);
  return 0;
}

// 1 when PNG decode is compiled in (libpng linked), else 0.
int64_t hostops_has_png(void) {
#ifndef HOSTOPS_NO_PNG
  return 1;
#else
  return 0;
#endif
}

// ---------------------------------------------------------------------------
// Threaded decode ring.
//
// submit(path) -> seq (non-blocking; queued paths are tiny);
// worker threads read + decode + resize into result slots;
// get(seq, out) blocks until that item is ready and releases its slot.
// Backpressure sits at the DECODE stage: workers stall while `capacity`
// decoded items are unconsumed, so an epoch's whole file list can be
// submitted up front and pixel memory stays O(capacity + n_threads).
// Consequence: results must be consumed roughly in submit order — a get()
// more than `capacity` items ahead of the oldest unconsumed one deadlocks
// (batch iteration consumes in order, so this never arises in practice).
// ---------------------------------------------------------------------------

namespace {

struct RingItem {
  std::vector<uint8_t> pixels;  // oh*ow*3, empty on decode failure
  bool ok = false;
};

struct Ring {
  int64_t oh, ow, capacity, fast_scale_to;
  std::mutex mu;
  std::condition_variable cv_done;  // waits: get (item ready)
  std::condition_variable cv_work;  // waits: workers (job ready + slot free)
  std::deque<std::pair<int64_t, std::string>> jobs;
  std::unordered_map<int64_t, RingItem> done;
  int64_t next_seq = 0;
  bool closed = false;
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      std::pair<int64_t, std::string> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] {
          return closed || (!jobs.empty() && (int64_t)done.size() < capacity);
        });
        if (closed && jobs.empty()) return;
        if (jobs.empty() || (int64_t)done.size() >= capacity) continue;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      RingItem item;
      std::vector<uint8_t> buf;
      int64_t rows = 0, cols = 0;
      std::vector<uint8_t> full;
      if (read_file(job.second.c_str(), &buf) &&
          decode_image_bgr(buf.data(), buf.size(), &full, &rows, &cols,
                           fast_scale_to)) {
        item.pixels.resize((size_t)(oh * ow * 3));
        resize_bilinear_u8(full.data(), rows, cols, 3, item.pixels.data(), oh,
                           ow);
        item.ok = true;
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        done.emplace(job.first, std::move(item));
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

// Create a decode ring producing (oh, ow, 3) BGR u8 images.
void* ring_create(int64_t oh, int64_t ow, int64_t capacity, int64_t n_threads,
                  int64_t fast_scale_to) {
  Ring* r = new Ring();
  r->oh = oh;
  r->ow = ow;
  r->capacity = std::max<int64_t>(1, capacity);
  r->fast_scale_to = fast_scale_to;
  n_threads = std::max<int64_t>(1, n_threads);
  for (int64_t i = 0; i < n_threads; ++i)
    r->workers.emplace_back(&Ring::worker, r);
  return r;
}

// Enqueue a file (non-blocking).  Returns the item's sequence number
// (pass to ring_get), or -1 after close.
int64_t ring_submit(void* ring, const char* path) {
  Ring* r = static_cast<Ring*>(ring);
  int64_t seq;
  {
    std::lock_guard<std::mutex> lk(r->mu);
    if (r->closed) return -1;
    seq = r->next_seq++;
    r->jobs.emplace_back(seq, std::string(path));
  }
  r->cv_work.notify_one();
  return seq;
}

// Block until item `seq` is decoded; copy into out (oh*ow*3 bytes).
// Returns 1 on success, 0 if that file failed to read/decode.
int64_t ring_get(void* ring, int64_t seq, uint8_t* out) {
  Ring* r = static_cast<Ring*>(ring);
  RingItem item;
  {
    std::unique_lock<std::mutex> lk(r->mu);
    r->cv_done.wait(lk, [&] { return r->done.count(seq) != 0; });
    auto it = r->done.find(seq);
    item = std::move(it->second);
    r->done.erase(it);
  }
  // A result slot freed: decode-stage backpressure may release.
  r->cv_work.notify_all();
  if (!item.ok) return 0;
  std::memcpy(out, item.pixels.data(), item.pixels.size());
  return 1;
}

// Stop accepting submits, drain workers, join threads, free the ring.
void ring_destroy(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  {
    std::lock_guard<std::mutex> lk(r->mu);
    r->closed = true;
    // Resolve undecoded work as failures so a straggling ring_get returns 0
    // instead of blocking forever.
    for (auto& job : r->jobs) r->done.emplace(job.first, RingItem());
    r->jobs.clear();
  }
  r->cv_work.notify_all();
  r->cv_done.notify_all();
  for (auto& t : r->workers) t.join();
  delete r;
}

}  // extern "C"

#endif  // HOSTOPS_NO_JPEG
