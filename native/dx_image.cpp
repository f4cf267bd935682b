// detectax native host-side image loader.
//
// The reference's input path decodes JPEGs one at a time through TF ops
// (FCOS/data_preprocess.py:5-9). On TPU the host CPU is the input
// bottleneck, so this library provides multithreaded JPEG decode +
// bilinear resize behind a tiny C ABI consumed via ctypes
// (detectax/data/native_loader.py). No Python objects cross the boundary;
// batches are written straight into caller-allocated float32 buffers.
//
// Build: make -C native   (g++ -O3 -fopenmp -shared, links libjpeg)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to interleaved RGB8. Returns true on success.
bool decode_jpeg_file(const char* path, std::vector<uint8_t>* pixels,
                      int* width, int* height) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int stride = cinfo.output_width * cinfo.output_components;
  pixels->resize(static_cast<size_t>(stride) * cinfo.output_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() +
                   static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Bilinear resize RGB8 -> float32 (half-pixel-center sampling, matching
// cv2.INTER_LINEAR / jax.image.resize "linear" conventions). Column
// indices and weights are precomputed so the inner loop is branch-free
// and auto-vectorizable.
void resize_bilinear(const uint8_t* src, int sh, int sw, float* dst,
                     int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;

  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> wxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    wxs[x] = fx - x0;
    int x1 = x0 + 1;
    x0s[x] = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
    x1s[x] = x1 < 0 ? 0 : (x1 >= sw ? sw - 1 : x1);
  }

  // Per-row horizontal interpolation scratch: two source rows -> dw*3.
  std::vector<float> row0(dw * 3), row1(dw * 3);
  int cached_y0 = -1, cached_y1 = -1;

  auto hinterp = [&](const uint8_t* srow, float* out_row) {
    for (int x = 0; x < dw; ++x) {
      const uint8_t* a = srow + static_cast<size_t>(x0s[x]) * 3;
      const uint8_t* b = srow + static_cast<size_t>(x1s[x]) * 3;
      const float wx = wxs[x];
      out_row[x * 3 + 0] = a[0] + (b[0] - a[0]) * wx;
      out_row[x * 3 + 1] = a[1] + (b[1] - a[1]) * wx;
      out_row[x * 3 + 2] = a[2] + (b[2] - a[2]) * wx;
    }
  };

  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    const float wy = fy - y0;
    int y1 = y0 + 1;
    y0 = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
    y1 = y1 < 0 ? 0 : (y1 >= sh ? sh - 1 : y1);

    if (y0 != cached_y0) {
      if (y0 == cached_y1) {
        row0.swap(row1);
        cached_y0 = y0;
        cached_y1 = -1;
      } else {
        hinterp(src + static_cast<size_t>(y0) * sw * 3, row0.data());
        cached_y0 = y0;
      }
    }
    if (y1 != cached_y1) {
      hinterp(src + static_cast<size_t>(y1) * sw * 3, row1.data());
      cached_y1 = y1;
    }

    float* out = dst + static_cast<size_t>(y) * dw * 3;
    const float* r0 = row0.data();
    const float* r1 = row1.data();
    for (int i = 0; i < dw * 3; ++i) {
      out[i] = r0[i] + (r1[i] - r0[i]) * wy;
    }
  }
}

}  // namespace

extern "C" {

// Read only the header; returns 0 on success.
int dx_image_info(const char* path, int* width, int* height) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *width = cinfo.image_width;
  *height = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

// Decode `path` and bilinear-resize into out[out_h*out_w*3] float32
// (0..255 range). Returns 0 on success.
int dx_decode_resize(const char* path, int out_h, int out_w, float* out) {
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  if (!decode_jpeg_file(path, &pixels, &w, &h)) return -1;
  resize_bilinear(pixels.data(), h, w, out, out_h, out_w);
  return 0;
}

// Batch variant: decode n files in parallel (OpenMP), each resized to its
// own (out_h[i], out_w[i]) and written at out + offsets[i] floats.
// Returns the number of failures.
int dx_decode_resize_batch(const char** paths, int n, const int* out_h,
                           const int* out_w, const int64_t* offsets,
                           float* out, int num_threads) {
  int failures = 0;
#if defined(_OPENMP)
  if (num_threads > 0) omp_set_num_threads(num_threads);
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
#endif
  for (int i = 0; i < n; ++i) {
    if (dx_decode_resize(paths[i], out_h[i], out_w[i], out + offsets[i]) !=
        0) {
      ++failures;
    }
  }
  return failures;
}

}  // extern "C"
