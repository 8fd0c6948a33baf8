// fedvit_loader — native threaded image decode for the input pipeline.
//
// The reference feeds its GPU from Python DataLoader worker *processes*
// doing PIL decode (reference data.py:212-234, num_workers=8). The TPU-native
// equivalent is this small C++ runtime component: a thread pool that decodes
// JPEG/PNG with libjpeg/libpng and bilinearly resizes to the pipeline's fixed
// canvas, writing straight into a caller-provided contiguous uint8 batch
// buffer (zero Python-object churn, no GIL during decode). Exposed through a
// plain C ABI consumed via ctypes (fedvit_tpu/data/native_loader.py).
//
// Build: make -C native   (produces libfedvit_loader.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
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

// Bilinear resize RGB/gray uint8 (H,W,C) -> (S,S,C).
void resize_bilinear(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                     int s) {
  for (int y = 0; y < s; ++y) {
    float fy = (y + 0.5f) * h / s - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    if (y0 > h - 2) y0 = h - 2 < 0 ? 0 : h - 2;
    float dy = fy - y0;
    if (dy < 0) dy = 0;
    int y1 = y0 + 1 < h ? y0 + 1 : y0;
    for (int x = 0; x < s; ++x) {
      float fx = (x + 0.5f) * w / s - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      if (x0 > w - 2) x0 = w - 2 < 0 ? 0 : w - 2;
      float dx = fx - x0;
      if (dx < 0) dx = 0;
      int x1 = x0 + 1 < w ? x0 + 1 : x0;
      for (int ch = 0; ch < c; ++ch) {
        float v00 = src[(y0 * w + x0) * c + ch];
        float v01 = src[(y0 * w + x1) * c + ch];
        float v10 = src[(y1 * w + x0) * c + ch];
        float v11 = src[(y1 * w + x1) * c + ch];
        float v = (1 - dy) * ((1 - dx) * v00 + dx * v01) +
                  dy * ((1 - dx) * v10 + dx * v11);
        dst[(y * s + x) * c + ch] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Nearest resize (masks must stay binary).
void resize_nearest(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                    int s) {
  for (int y = 0; y < s; ++y) {
    int sy = static_cast<int>((y + 0.5f) * h / s);
    if (sy >= h) sy = h - 1;
    for (int x = 0; x < s; ++x) {
      int sx = static_cast<int>((x + 0.5f) * w / s);
      if (sx >= w) sx = w - 1;
      for (int ch = 0; ch < c; ++ch)
        dst[(y * s + x) * c + ch] = src[(sy * w + sx) * c + ch];
    }
  }
}

// Decode one JPEG file to RGB uint8; returns true on success.
bool decode_jpeg(const char* path, std::vector<uint8_t>* out, int* h, int* w) {
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
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize(size_t(*h) * (*w) * 3);
  JSAMPROW row;
  while (cinfo.output_scanline < cinfo.output_height) {
    row = out->data() + size_t(cinfo.output_scanline) * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Decode one PNG to grayscale uint8.
bool decode_png_gray(const char* path, std::vector<uint8_t>* out, int* h,
                     int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(f); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE) {
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  }
  png_read_update_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  out->resize(size_t(*h) * (*w));
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = out->data() + size_t(y) * (*w);
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Decode `n` JPEGs into out (n, canvas, canvas, 3) uint8, `threads` workers.
// ok[i] = 1 on success else 0 (row left zeroed). Returns #succeeded.
int fedvit_decode_jpeg_batch(const char** paths, int n, int canvas,
                             uint8_t* out, uint8_t* ok, int threads) {
  std::atomic<int> next(0), succeeded(0);
  const size_t stride = size_t(canvas) * canvas * 3;
  auto worker = [&]() {
    std::vector<uint8_t> buf;
    int h, w;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (decode_jpeg(paths[i], &buf, &h, &w)) {
        resize_bilinear(buf.data(), h, w, 3, out + stride * i, canvas);
        ok[i] = 1;
        succeeded.fetch_add(1);
      } else {
        std::memset(out + stride * i, 0, stride);
        ok[i] = 0;
      }
    }
  };
  if (threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return succeeded.load();
}

// Decode `n` grayscale mask PNGs into out (n, canvas, canvas) uint8.
int fedvit_decode_png_mask_batch(const char** paths, int n, int canvas,
                                 uint8_t* out, uint8_t* ok, int threads) {
  std::atomic<int> next(0), succeeded(0);
  const size_t stride = size_t(canvas) * canvas;
  auto worker = [&]() {
    std::vector<uint8_t> buf;
    int h, w;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (paths[i] && decode_png_gray(paths[i], &buf, &h, &w)) {
        resize_nearest(buf.data(), h, w, 1, out + stride * i, canvas);
        ok[i] = 1;
        succeeded.fetch_add(1);
      } else {
        std::memset(out + stride * i, 0, stride);
        ok[i] = 0;
      }
    }
  };
  if (threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return succeeded.load();
}

}  // extern "C"
