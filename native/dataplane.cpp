// Native data-plane for the pretraining input pipeline.
//
// The reference's input path is pure Python (PIL decode + transform per
// sample; dataset/pretrain_dataset.py). At 128+ images/step/host the Python
// decode becomes the host-side bottleneck feeding the TPU. This library moves
// the hot loop to C++: base64 → JPEG/PNG decode (libjpeg/libpng) → bilinear
// resize → CLIP-normalized float32 NHWC, batched over a std::thread pool.
//
// Exposed C ABI (ctypes-friendly):
//   dp_decode_batch_b64(...)  — batch of base64 strings → (N, res, res, 3) f32
//   dp_decode_batch_raw(...)  — batch of raw encoded bytes → same
//   dp_b64_decode(...)        — standalone base64 decoder
// All functions return 0 on success; per-item failures zero-fill that item and
// set the corresponding status byte (broken-sample skip semantics).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------- base64 ----------------

int b64_value(unsigned char c) {
  if (c >= 'A' && c <= 'Z') return c - 'A';
  if (c >= 'a' && c <= 'z') return c - 'a' + 26;
  if (c >= '0' && c <= '9') return c - '0' + 52;
  if (c == '+') return 62;
  if (c == '/') return 63;
  return -1;
}

// Returns decoded length, or -1 on error.
int64_t b64_decode(const char* in, int64_t len, uint8_t* out) {
  int64_t o = 0;
  uint32_t acc = 0;
  int bits = 0;
  for (int64_t i = 0; i < len; ++i) {
    unsigned char c = (unsigned char)in[i];
    if (c == '=' || c == '\n' || c == '\r' || c == ' ') continue;
    int v = b64_value(c);
    if (v < 0) return -1;
    acc = (acc << 6) | (uint32_t)v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out[o++] = (uint8_t)((acc >> bits) & 0xFF);
    }
  }
  return o;
}

// ---------------- JPEG ----------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = (JpegErrorMgr*)cinfo->err;
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG to RGB8. Returns true on success; fills w/h and pixel vector.
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>& pixels,
                 int& w, int& h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  pixels.resize((size_t)w * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------- PNG ----------------

struct PngReadState {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* st = (PngReadState*)png_get_io_ptr(png);
  if (st->pos + n > st->len) {
    png_error(png, "eof");
    return;
  }
  memcpy(out, st->data + st->pos, n);
  st->pos += n;
}

bool decode_png(const uint8_t* data, size_t len, std::vector<uint8_t>& pixels,
                int& w, int& h) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
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
  PngReadState st{data, len, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // drop alpha
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);
  pixels.resize((size_t)w * h * 3);
  std::vector<png_bytep> rows(h);
  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> rowbuf;
  if (rowbytes != (size_t)w * 3) {
    // unexpected layout; bail
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  for (int y = 0; y < h; ++y) rows[y] = pixels.data() + (size_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---------------- resize + normalize ----------------

// Separable triangle-filter resample (PIL BILINEAR semantics: the filter
// support scales with the downscale factor, i.e. proper antialiasing), then
// CLIP-normalize: RGB8 (h, w) → float32 (res, res, 3).
struct ResampleTaps {
  std::vector<int> lo;        // first source index per output pixel
  std::vector<int> count;     // taps per output pixel
  std::vector<float> weights; // max_taps per output pixel, row-major
  int max_taps;
};

// filter: 0 = triangle (PIL BILINEAR), 1 = Catmull-Rom-style cubic a=-0.5
// (PIL BICUBIC). Both antialias by scaling support with the downscale factor.
static double filter_weight(double x, int filter) {
  if (filter == 0) {
    if (x < 0) x = -x;
    return x < 1.0 ? 1.0 - x : 0.0;
  }
  const double a = -0.5;
  if (x < 0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

void build_taps(int src, int dst, ResampleTaps& t, int filter) {
  const double scale = (double)src / dst;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double fsupport = filter == 0 ? 1.0 : 2.0;
  const double support = fsupport * filterscale;
  t.max_taps = (int)ceil(support) * 2 + 1;
  t.lo.resize(dst);
  t.count.resize(dst);
  t.weights.assign((size_t)dst * t.max_taps, 0.0f);
  for (int i = 0; i < dst; ++i) {
    double center = (i + 0.5) * scale;
    int lo = (int)(center - support + 0.5);
    int hi = (int)(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > src) hi = src;
    double total = 0.0;
    float* wrow = &t.weights[(size_t)i * t.max_taps];
    for (int j = lo; j < hi; ++j) {
      double x = (j - center + 0.5) / filterscale;
      double wv = filter_weight(x, filter);
      wrow[j - lo] = (float)wv;
      total += wv;
    }
    if (total > 0) {
      for (int j = 0; j < hi - lo; ++j) wrow[j] = (float)(wrow[j] / total);
    }
    t.lo[i] = lo;
    t.count[i] = hi - lo;
  }
}

void resize_normalize(const std::vector<uint8_t>& pixels, int w, int h, int res,
                      const float* mean, const float* stdev, float* out,
                      int filter) {
  ResampleTaps tx, ty;
  build_taps(w, res, tx, filter);
  build_taps(h, res, ty, filter);

  // horizontal pass: (h, w, 3) u8 → (h, res, 3) f32
  std::vector<float> tmp((size_t)h * res * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = &pixels[(size_t)y * w * 3];
    float* dst = &tmp[(size_t)y * res * 3];
    for (int ox = 0; ox < res; ++ox) {
      const float* wrow = &tx.weights[(size_t)ox * tx.max_taps];
      int lo = tx.lo[ox];
      float r = 0, g = 0, b = 0;
      for (int j = 0; j < tx.count[ox]; ++j) {
        const uint8_t* p = src + (size_t)(lo + j) * 3;
        float wv = wrow[j];
        r += wv * p[0];
        g += wv * p[1];
        b += wv * p[2];
      }
      dst[ox * 3 + 0] = r;
      dst[ox * 3 + 1] = g;
      dst[ox * 3 + 2] = b;
    }
  }
  // vertical pass + normalize: (h, res, 3) → (res, res, 3)
  const float inv255 = 1.0f / 255.0f;
  for (int oy = 0; oy < res; ++oy) {
    const float* wrow = &ty.weights[(size_t)oy * ty.max_taps];
    int lo = ty.lo[oy];
    float* o = out + (size_t)oy * res * 3;
    for (int ox = 0; ox < res; ++ox) {
      float acc[3] = {0, 0, 0};
      for (int j = 0; j < ty.count[oy]; ++j) {
        const float* p = &tmp[((size_t)(lo + j) * res + ox) * 3];
        float wv = wrow[j];
        acc[0] += wv * p[0];
        acc[1] += wv * p[1];
        acc[2] += wv * p[2];
      }
      for (int c = 0; c < 3; ++c)
        o[ox * 3 + c] = (acc[c] * inv255 - mean[c]) / stdev[c];
    }
  }
}

bool decode_any(const uint8_t* data, size_t len, std::vector<uint8_t>& pixels,
                int& w, int& h) {
  if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data, len, pixels, w, h);
  if (len >= 8 && !png_sig_cmp(data, 0, 8))
    return decode_png(data, len, pixels, w, h);
  // try jpeg anyway (some files lack clean magic handling)
  return decode_jpeg(data, len, pixels, w, h);
}

}  // namespace

extern "C" {

int64_t dp_b64_decode(const char* in, int64_t len, uint8_t* out) {
  return b64_decode(in, len, out);
}

// inputs: concatenated raw bytes with offsets (n+1 entries).
// out: (n, res, res, 3) float32. status: n bytes, 1 = ok, 0 = broken.
int dp_decode_batch_raw(const uint8_t* blob, const int64_t* offsets, int n,
                        int res, const float* mean, const float* stdev,
                        float* out, uint8_t* status, int num_threads,
                        int filter) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<uint8_t> pixels;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const uint8_t* data = blob + offsets[i];
      size_t len = (size_t)(offsets[i + 1] - offsets[i]);
      int w = 0, h = 0;
      float* dst = out + (size_t)i * res * res * 3;
      if (decode_any(data, len, pixels, w, h) && w > 0 && h > 0) {
        resize_normalize(pixels, w, h, res, mean, stdev, dst, filter);
        status[i] = 1;
      } else {
        memset(dst, 0, sizeof(float) * (size_t)res * res * 3);
        status[i] = 0;
      }
    }
  };
  if (num_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return 0;
}

// base64 inputs: concatenated chars with offsets (n+1 entries).
int dp_decode_batch_b64(const char* blob, const int64_t* offsets, int n,
                        int res, const float* mean, const float* stdev,
                        float* out, uint8_t* status, int num_threads,
                        int filter) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<uint8_t> raw;
    std::vector<uint8_t> pixels;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const char* in = blob + offsets[i];
      int64_t len = offsets[i + 1] - offsets[i];
      raw.resize((size_t)(len * 3 / 4 + 4));
      int64_t rlen = b64_decode(in, len, raw.data());
      float* dst = out + (size_t)i * res * res * 3;
      int w = 0, h = 0;
      if (rlen > 0 && decode_any(raw.data(), (size_t)rlen, pixels, w, h) &&
          w > 0 && h > 0) {
        resize_normalize(pixels, w, h, res, mean, stdev, dst, filter);
        status[i] = 1;
      } else {
        memset(dst, 0, sizeof(float) * (size_t)res * res * 3);
        status[i] = 0;
      }
    }
  };
  if (num_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return 0;
}

}  // extern "C"
