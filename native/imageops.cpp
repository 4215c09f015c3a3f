// Native image pipeline: JPEG decode + PIL-compatible bicubic resampling.
//
// Replaces the reference's host-side torchvision/PIL image work (the per-batch
// "PIL open + image_processor" in every collator,
// /root/reference/src/vlrlhf/models/Llava/__init__.py:435-471), which is the
// host-side bottleneck feeding a TPU training step. C API consumed via ctypes
// (vlrlhf_tpu/data/native_image.py); a thread pool decodes a whole batch in
// parallel while the previous device step runs.
//
// Resampling matches PIL's convolution resampler (cubic a=-0.5, support 2.0,
// scale-widened kernel when downscaling) so outputs are interchangeable with
// the PIL fallback path (tolerance ~1 LSB from PIL's fixed-point arithmetic).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC, links -ljpeg).

#include <cstdio>  // must precede jpeglib.h (it needs FILE declared)

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to RGB8. Returns true on success. If min_target > 0,
// uses libjpeg's DCT scaling (M/8) to decode at the smallest size whose
// shortest edge still covers min_target — skipping most IDCT + resample work
// when downscaling (a fast path PIL only offers via draft mode).
bool decode_jpeg(const char* path, std::vector<uint8_t>& out, int& w, int& h,
                 int min_target = 0) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (min_target > 0) {
    int short_edge = std::min<int>(cinfo.image_width, cinfo.image_height);
    int m = 8;
    while (m > 1 && (short_edge * (m - 1)) / 8 >= min_target) --m;
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  out.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

inline double cubic_filter(double x) {
  // PIL's bicubic: Catmull-Rom-like with a = -0.5, support 2.0
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// PIL-style separable resample along one axis (horizontal when `horizontal`).
// in: (h, w, 3) uint8 or float32 planar-interleaved RGB; we work in float.
void resample_axis(const std::vector<float>& in, int in_w, int in_h,
                   std::vector<float>& out, int out_size, bool horizontal) {
  const double support_base = 2.0;
  int in_size = horizontal ? in_w : in_h;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = support_base * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  std::vector<int> bounds(out_size * 2);
  std::vector<double> kk(static_cast<size_t>(out_size) * ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &kk[static_cast<size_t>(xx) * ksize];
    for (int x = 0; x < xmax; ++x) {
      double wgt = cubic_filter((x + xmin - center + 0.5) * ss);
      k[x] = wgt;
      ww += wgt;
    }
    for (int x = 0; x < xmax; ++x)
      if (ww != 0.0) k[x] /= ww;
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }

  int out_w = horizontal ? out_size : in_w;
  int out_h = horizontal ? in_h : out_size;
  out.assign(static_cast<size_t>(out_w) * out_h * 3, 0.0f);
  if (horizontal) {
    // gather along x; float kernels, channel-unrolled inner loop
    std::vector<float> kf(kk.size());
    for (size_t i = 0; i < kk.size(); ++i) kf[i] = static_cast<float>(kk[i]);
    for (int y = 0; y < in_h; ++y) {
      const float* row = &in[static_cast<size_t>(y) * in_w * 3];
      float* orow = &out[static_cast<size_t>(y) * out_size * 3];
      for (int xx = 0; xx < out_size; ++xx) {
        int xmin = bounds[xx * 2], xmax = bounds[xx * 2 + 1];
        const float* k = &kf[static_cast<size_t>(xx) * ksize];
        float a0 = 0.f, a1 = 0.f, a2 = 0.f;
        const float* px = row + static_cast<size_t>(xmin) * 3;
        for (int x = 0; x < xmax; ++x, px += 3) {
          a0 += px[0] * k[x];
          a1 += px[1] * k[x];
          a2 += px[2] * k[x];
        }
        orow[xx * 3] = a0;
        orow[xx * 3 + 1] = a1;
        orow[xx * 3 + 2] = a2;
      }
    }
  } else {
    // vertical: accumulate whole rows (contiguous, auto-vectorizes)
    size_t row_elems = static_cast<size_t>(in_w) * 3;
    for (int yy = 0; yy < out_size; ++yy) {
      int ymin = bounds[yy * 2], ymax = bounds[yy * 2 + 1];
      const double* k = &kk[static_cast<size_t>(yy) * ksize];
      float* orow = &out[static_cast<size_t>(yy) * row_elems];
      for (int y = 0; y < ymax; ++y) {
        float w = static_cast<float>(k[y]);
        const float* irow = &in[static_cast<size_t>(ymin + y) * row_elems];
        for (size_t i = 0; i < row_elems; ++i) orow[i] += irow[i] * w;
      }
    }
  }
}

void resize_bicubic(const uint8_t* in, int in_w, int in_h, uint8_t* out,
                    int out_w, int out_h) {
  std::vector<float> a(static_cast<size_t>(in_w) * in_h * 3);
  for (size_t i = 0; i < a.size(); ++i) a[i] = in[i];
  std::vector<float> b;
  resample_axis(a, in_w, in_h, b, out_w, /*horizontal=*/true);
  std::vector<float> c;
  resample_axis(b, out_w, in_h, c, out_h, /*horizontal=*/false);
  for (size_t i = 0; i < c.size(); ++i) {
    float v = c[i];
    out[i] = static_cast<uint8_t>(v < 0.f ? 0 : (v > 255.f ? 255 : v + 0.5f));
  }
}

// mode 0: squash to (size, size)
// mode 1: resize shortest edge to `size`, center-crop (size, size)
bool load_one(const char* path, int size, int mode, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, rgb, w, h, size)) return false;
  if (mode == 0) {
    resize_bicubic(rgb.data(), w, h, out, size, size);
    return true;
  }
  double scale = static_cast<double>(size) / std::min(w, h);
  int nw = static_cast<int>(std::lround(w * scale));
  int nh = static_cast<int>(std::lround(h * scale));
  std::vector<uint8_t> resized(static_cast<size_t>(nw) * nh * 3);
  resize_bicubic(rgb.data(), w, h, resized.data(), nw, nh);
  int left = (nw - size) / 2;
  int top = (nh - size) / 2;
  for (int y = 0; y < size; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * size * 3,
                resized.data() + ((static_cast<size_t>(top + y) * nw) + left) * 3,
                static_cast<size_t>(size) * 3);
  }
  return true;
}

}  // namespace

extern "C" {

// Decode+resize one image. Returns 0 on success, -1 on failure.
int vlr_load_image(const char* path, int size, int mode, uint8_t* out) {
  return load_one(path, size, mode, out) ? 0 : -1;
}

// Batch decode with a thread pool. `paths` are NUL-separated in one buffer
// with offsets. out is (n, size, size, 3) uint8. Returns count of failures.
int vlr_load_batch(const char** paths, int n, int size, int mode,
                   uint8_t* out, int n_threads) {
  std::atomic<int> next(0), failures(0);
  size_t stride = static_cast<size_t>(size) * size * 3;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (!paths[i] || paths[i][0] == '\0') continue;  // empty slot
      if (!load_one(paths[i], size, mode, out + stride * i))
        failures.fetch_add(1);
    }
  };
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  int spawn = std::min(n_threads, n);
  for (int t = 0; t < spawn; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Raw decode (for anyres tiling where python needs the full image).
// out_buf must hold max_bytes; returns bytes written (w*h*3) with w,h set,
// or -1 on failure / overflow.
long vlr_decode_jpeg(const char* path, uint8_t* out_buf, long max_bytes,
                     int* w, int* h) {
  std::vector<uint8_t> rgb;
  if (!decode_jpeg(path, rgb, *w, *h)) return -1;
  if (static_cast<long>(rgb.size()) > max_bytes) return -1;
  std::memcpy(out_buf, rgb.data(), rgb.size());
  return static_cast<long>(rgb.size());
}

// Resize an in-memory RGB8 image (PIL-compatible bicubic).
int vlr_resize(const uint8_t* in, int in_w, int in_h, uint8_t* out, int out_w,
               int out_h) {
  resize_bicubic(in, in_w, in_h, out, out_w, out_h);
  return 0;
}
}
