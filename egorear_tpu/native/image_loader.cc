// Native image-decode + resample pipeline for the Ego4View data loader.
//
// Replaces the role of the reference's torch DataLoader worker processes
// (PIL decode + BICUBIC resize per sample, pl_wrappers/.../heatmap.py:178-213)
// with a C++ thread-pool: JPEG (libjpeg) / PNG (libpng) decode, PIL-equivalent
// antialiased bicubic resampling (separable Catmull-Rom a=-0.5 filter with
// support scaled by the downscale ratio -- the same coefficient scheme PIL's
// ImagingResample uses), and optional fused ImageNet normalization straight
// into CHW float32, so Python only hands paths in and gets model-ready
// tensors out.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode JPEG bytes to RGB8. Returns true on success; fills w/h/pixels.
bool decode_jpeg(const uint8_t* buf, size_t len, std::vector<uint8_t>* out,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->pos + n > st->size) {
    png_error(png, "png: read past end");
  }
  memcpy(out, st->data + st->pos, n);
  st->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, std::vector<uint8_t>* out,
                int* w, int* h) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState st{buf, len, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  out->resize(size_t(*w) * *h * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = out->data() + size_t(y) * *w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const uint8_t* buf, size_t len, std::vector<uint8_t>* out,
                int* w, int* h) {
  if (len >= 3 && buf[0] == 0xFF && buf[1] == 0xD8) {
    return decode_jpeg(buf, len, out, w, h);
  }
  if (len >= 8 && !png_sig_cmp(buf, 0, 8)) {
    return decode_png(buf, len, out, w, h);
  }
  return decode_jpeg(buf, len, out, w, h);  // last resort
}

// ---------------------------------------------------------------------------
// PIL-equivalent bicubic resampling (separable, antialiased)
// ---------------------------------------------------------------------------

double bicubic_filter(double x) {  // Keys cubic, a = -0.5 (PIL BICUBIC)
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct ResampleCoeffs {
  std::vector<int> bounds_min;
  std::vector<int> bounds_size;
  std::vector<double> weights;  // [out][kmax]
  int kmax;
};

ResampleCoeffs precompute(int in_size, int out_size) {
  ResampleCoeffs rc;
  const double scale = double(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;
  rc.kmax = int(std::ceil(support)) * 2 + 1;
  rc.bounds_min.resize(out_size);
  rc.bounds_size.resize(out_size);
  rc.weights.assign(size_t(out_size) * rc.kmax, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double* w = &rc.weights[size_t(xx) * rc.kmax];
    double ww = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      const double v = bicubic_filter((x - center + 0.5) / filterscale);
      w[x - xmin] = v;
      ww += v;
    }
    if (ww != 0.0) {
      for (int x = 0; x < xmax - xmin; ++x) w[x] /= ww;
    }
    rc.bounds_min[xx] = xmin;
    rc.bounds_size[xx] = xmax - xmin;
  }
  return rc;
}

inline uint8_t clip8(double v) {
  if (v <= 0.0) return 0;
  if (v >= 255.0) return 255;
  return uint8_t(v + 0.5);
}

// uint8 HWC RGB -> uint8 HWC RGB at (out, out); PIL-style two-pass with an
// 8-bit intermediate (horizontal first), matching Image.resize(BICUBIC).
void resize_bicubic(const uint8_t* src, int in_w, int in_h, uint8_t* dst,
                    int out_size) {
  const ResampleCoeffs rx = precompute(in_w, out_size);
  const ResampleCoeffs ry = precompute(in_h, out_size);

  std::vector<uint8_t> tmp(size_t(in_h) * out_size * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = src + size_t(y) * in_w * 3;
    uint8_t* trow = tmp.data() + size_t(y) * out_size * 3;
    for (int xx = 0; xx < out_size; ++xx) {
      const double* w = &rx.weights[size_t(xx) * rx.kmax];
      const int xmin = rx.bounds_min[xx];
      const int n = rx.bounds_size[xx];
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const uint8_t* px = row + size_t(xmin + k) * 3;
        acc[0] += w[k] * px[0];
        acc[1] += w[k] * px[1];
        acc[2] += w[k] * px[2];
      }
      trow[xx * 3 + 0] = clip8(acc[0]);
      trow[xx * 3 + 1] = clip8(acc[1]);
      trow[xx * 3 + 2] = clip8(acc[2]);
    }
  }
  for (int yy = 0; yy < out_size; ++yy) {
    const double* w = &ry.weights[size_t(yy) * ry.kmax];
    const int ymin = ry.bounds_min[yy];
    const int n = ry.bounds_size[yy];
    uint8_t* drow = dst + size_t(yy) * out_size * 3;
    for (int xx = 0; xx < out_size; ++xx) {
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const uint8_t* px =
            tmp.data() + (size_t(ymin + k) * out_size + xx) * 3;
        acc[0] += w[k] * px[0];
        acc[1] += w[k] * px[1];
        acc[2] += w[k] * px[2];
      }
      drow[xx * 3 + 0] = clip8(acc[0]);
      drow[xx * 3 + 1] = clip8(acc[1]);
      drow[xx * 3 + 2] = clip8(acc[2]);
    }
  }
}

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* pool = nullptr;
int pool_size = 0;
std::mutex pool_mu;

ThreadPool* get_pool(int n_threads) {
  std::lock_guard<std::mutex> lk(pool_mu);
  if (!pool || pool_size != n_threads) {
    delete pool;
    pool = new ThreadPool(n_threads);
    pool_size = n_threads;
  }
  return pool;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  const bool ok = fread(out->data(), 1, n, f) == size_t(n);
  fclose(f);
  return ok;
}

// One sample: file -> decoded -> resized -> (optional) normalized CHW f32.
int process_one(const char* path, int out_size, uint8_t* out_u8,
                float* out_f32) {
  std::vector<uint8_t> bytes;
  if (!read_file(path, &bytes)) return 1;
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_any(bytes.data(), bytes.size(), &rgb, &w, &h)) return 2;
  std::vector<uint8_t> resized(size_t(out_size) * out_size * 3);
  const uint8_t* final_rgb;
  if (w == out_size && h == out_size) {
    final_rgb = rgb.data();
  } else {
    resize_bicubic(rgb.data(), w, h, resized.data(), out_size);
    final_rgb = resized.data();
  }
  if (out_u8) {
    memcpy(out_u8, final_rgb, size_t(out_size) * out_size * 3);
  }
  if (out_f32) {
    const size_t plane = size_t(out_size) * out_size;
    for (size_t i = 0; i < plane; ++i) {
      for (int c = 0; c < 3; ++c) {
        out_f32[c * plane + i] =
            (final_rgb[i * 3 + c] / 255.0f - kMean[c]) / kStd[c];
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Decode + resize a batch of image files into uint8 HWC batches.
// paths: array of C strings; out: (count, out_size, out_size, 3) uint8.
// Returns the number of failures.
int er_load_u8_batch(const char** paths, int count, int out_size, uint8_t* out,
                     int n_threads) {
  ThreadPool* tp = get_pool(std::max(1, n_threads));
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = size_t(out_size) * out_size * 3;
  for (int i = 0; i < count; ++i) {
    tp->submit([&, i] {
      if (process_one(paths[i], out_size, out + size_t(i) * stride, nullptr)) {
        failures.fetch_add(1);
      }
      if (done.fetch_add(1) + 1 == count) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == count; });
  return failures.load();
}

// Decode + resize + ImageNet-normalize into float32 CHW batches.
// out: (count, 3, out_size, out_size) float32. Returns failure count.
int er_load_f32_batch(const char** paths, int count, int out_size, float* out,
                      int n_threads) {
  ThreadPool* tp = get_pool(std::max(1, n_threads));
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = size_t(3) * out_size * out_size;
  for (int i = 0; i < count; ++i) {
    tp->submit([&, i] {
      if (process_one(paths[i], out_size, nullptr, out + size_t(i) * stride)) {
        failures.fetch_add(1);
      }
      if (done.fetch_add(1) + 1 == count) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == count; });
  return failures.load();
}

}  // extern "C"
