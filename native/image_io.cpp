// flowmap_tpu native image I/O: threaded JPEG/PNG decode + bilinear resize.
//
// The reference eager-loads every frame of a scene through PIL
// (flowmap/dataset/dataset_images.py:41, dataset_llff.py:84-90), which is a
// noticeable share of per-scene wall-clock (the reference even caches resized
// LLFF images on disk to hide it). This library decodes batches of images in
// parallel with libjpeg/libpng and returns packed float32 CHW tensors ready
// for device upload. Exposed via a C ABI consumed through ctypes
// (flowmap_tpu/utils/native_io.py), with a PIL fallback when unavailable.
//
// Build: see native/Makefile (produces libflowmap_io.so).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ImageU8 {
  std::vector<unsigned char> data;  // HWC, RGB
  int h = 0;
  int w = 0;
  bool ok = false;
};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

ImageU8 decode_jpeg(const unsigned char* buf, size_t len) {
  ImageU8 out;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = static_cast<int>(cinfo.output_width);
  out.h = static_cast<int>(cinfo.output_height);
  out.data.resize(static_cast<size_t>(out.w) * out.h * 3);
  const int stride = out.w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out.data.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out.ok = true;
  return out;
}

struct PngReadState {
  const unsigned char* data;
  size_t size;
  size_t offset;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t count) {
  auto* state = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (state->offset + count > state->size) {
    png_error(png, "read past end");
  }
  std::memcpy(out, state->data + state->offset, count);
  state->offset += count;
}

ImageU8 decode_png(const unsigned char* buf, size_t len) {
  ImageU8 out;
  if (len < 8 || png_sig_cmp(buf, 0, 8) != 0) return out;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return out;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return out;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return ImageU8{};
  }
  PngReadState state{buf, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  png_set_expand(png);           // palette/gray -> 8-bit RGB(A)
  png_set_strip_16(png);         // 16-bit -> 8-bit
  png_set_strip_alpha(png);      // drop alpha
  png_set_gray_to_rgb(png);      // gray -> RGB
  png_read_update_info(png, info);

  out.w = static_cast<int>(png_get_image_width(png, info));
  out.h = static_cast<int>(png_get_image_height(png, info));
  out.data.resize(static_cast<size_t>(out.w) * out.h * 3);
  std::vector<png_bytep> rows(out.h);
  const size_t stride = static_cast<size_t>(out.w) * 3;
  for (int y = 0; y < out.h; ++y) rows[y] = out.data.data() + y * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  out.ok = true;
  return out;
}

ImageU8 decode_bytes_impl(const unsigned char* buf, size_t len);

ImageU8 decode_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return ImageU8{};
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(static_cast<size_t>(size));
  size_t read = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (read != buf.size()) return ImageU8{};
  return decode_bytes_impl(buf.data(), buf.size());
}

ImageU8 decode_bytes_impl(const unsigned char* buf, size_t len) {
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len);
  if (len >= 8 && png_sig_cmp(buf, 0, 8) == 0) return decode_png(buf, len);
  return ImageU8{};
}

// Bilinear resize (half-pixel centers, border clamp — torch
// F.interpolate(align_corners=False) semantics) into float32 CHW [0, 1].
void resize_to_chw_float(const ImageU8& src, int out_h, int out_w, float* dst) {
  const float sy = static_cast<float>(src.h) / out_h;
  const float sx = static_cast<float>(src.w) / out_w;
  const size_t plane = static_cast<size_t>(out_h) * out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float ty = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= src.h ? src.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= src.h ? src.h - 1 : y0 + 1);
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float tx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= src.w ? src.w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= src.w ? src.w - 1 : x0 + 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = src.data[(static_cast<size_t>(y0c) * src.w + x0c) * 3 + c];
        float v01 = src.data[(static_cast<size_t>(y0c) * src.w + x1c) * 3 + c];
        float v10 = src.data[(static_cast<size_t>(y1c) * src.w + x0c) * 3 + c];
        float v11 = src.data[(static_cast<size_t>(y1c) * src.w + x1c) * 3 + c];
        float top = v00 * (1 - tx) + v01 * tx;
        float bot = v10 * (1 - tx) + v11 * tx;
        dst[c * plane + static_cast<size_t>(oy) * out_w + ox] =
            (top * (1 - ty) + bot * ty) / 255.0f;
      }
    }
  }
}

void copy_to_chw_float(const ImageU8& src, float* dst) {
  const size_t plane = static_cast<size_t>(src.h) * src.w;
  for (size_t i = 0; i < plane; ++i) {
    dst[0 * plane + i] = src.data[i * 3 + 0] / 255.0f;
    dst[1 * plane + i] = src.data[i * 3 + 1] / 255.0f;
    dst[2 * plane + i] = src.data[i * 3 + 2] / 255.0f;
  }
}

}  // namespace

extern "C" {

// Probe an image's dimensions. Returns 0 on success.
int fmio_image_shape(const char* path, int* h, int* w) {
  ImageU8 img = decode_file(path);
  if (!img.ok) return 1;
  *h = img.h;
  *w = img.w;
  return 0;
}

// Decode `n` images in parallel into a preallocated float32 buffer of shape
// (n, 3, out_h, out_w), CHW, values in [0, 1]. If out_h/out_w are <= 0, all
// images must share the native shape given by fmio_image_shape of the first.
// Returns the number of images that failed to decode.
int fmio_load_batch(const char** paths, int n, int out_h, int out_w,
                    int num_threads, float* out) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const bool resize = out_h > 0 && out_w > 0;

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      ImageU8 img = decode_file(paths[i]);
      if (!img.ok) {
        failures.fetch_add(1);
        continue;
      }
      if (resize) {
        float* dst = out + static_cast<size_t>(i) * 3 * out_h * out_w;
        if (img.h == out_h && img.w == out_w) {
          copy_to_chw_float(img, dst);
        } else {
          resize_to_chw_float(img, out_h, out_w, dst);
        }
      } else {
        float* dst = out + static_cast<size_t>(i) * 3 * img.h * img.w;
        copy_to_chw_float(img, dst);
      }
    }
  };

  int threads = num_threads > 0 ? num_threads : 1;
  if (threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  return failures.load();
}

// Decode a single in-memory buffer (e.g. RE10k chunk JPEG bytes) into a
// float32 CHW image at native resolution. Caller provides the shape from
// fmio_bytes_shape. Returns 0 on success.
int fmio_bytes_shape(const unsigned char* buf, long len, int* h, int* w) {
  ImageU8 img = decode_bytes_impl(buf, static_cast<size_t>(len));
  if (!img.ok) return 1;
  *h = img.h;
  *w = img.w;
  return 0;
}

int fmio_decode_bytes(const unsigned char* buf, long len, float* out) {
  ImageU8 img = decode_bytes_impl(buf, static_cast<size_t>(len));
  if (!img.ok) return 1;
  copy_to_chw_float(img, out);
  return 0;
}

}  // extern "C"
