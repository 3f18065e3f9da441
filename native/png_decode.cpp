// Native PNG decode (libpng) for the synthetic-sample read-back path.
//
// The augmentation eval harness re-reads every generated sample
// (thousands of PNGs per run — AugmentedPolypDataset.py:33-39 semantics);
// this is that decode in C++ behind a C ABI. Returns RGB8 regardless of
// the file's bit depth/palette/alpha (libpng transforms).

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Returns 0 on success. On success *out_h/*out_w are set and `dst` (caller
// buffer of capacity dst_capacity bytes) holds h*w*3 RGB bytes.
// Call with dst == nullptr to query dimensions only.
int polyp_png_decode(const char* path, uint8_t* dst, int64_t dst_capacity,
                     int32_t* out_h, int32_t* out_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return 2;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 4;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const png_uint_32 w = png_get_image_width(png, info);
  const png_uint_32 h = png_get_image_height(png, info);
  const png_byte color = png_get_color_type(png, info);
  const png_byte depth = png_get_bit_depth(png, info);

  // normalize everything to 8-bit RGB
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA ||
      png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  *out_h = static_cast<int32_t>(h);
  *out_w = static_cast<int32_t>(w);
  if (dst == nullptr) {  // dimension query
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
  }
  const int64_t needed = static_cast<int64_t>(h) * w * 3;
  if (dst_capacity < needed) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 5;
  }
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = dst + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

}  // extern "C"

namespace {

struct MemSink {
  uint8_t* dst;
  int64_t capacity;
  int64_t size;
  bool overflow;
};

void mem_write(png_structp png, png_bytep data, png_size_t len) {
  MemSink* sink = static_cast<MemSink*>(png_get_io_ptr(png));
  if (sink->size + static_cast<int64_t>(len) > sink->capacity) {
    sink->overflow = true;
    png_error(png, "polyp_png_encode: dst buffer too small");
    return;
  }
  std::memcpy(sink->dst + sink->size, data, len);
  sink->size += static_cast<int64_t>(len);
}

void mem_flush(png_structp) {}

}  // namespace

extern "C" {

// Encode uint8 RGB HWC -> PNG bytes in a caller-provided buffer.
//
// This is the serving response path (serve.py base64-PNG payloads) and the
// generate_to_dir sample writer; PIL's default encode (zlib level 6 +
// adaptive filtering) dominates host time on 1-core serving hosts, so this
// encoder trades a little file size for encode speed: zlib `level` (0-9,
// callers default to 1) with filtering off at level<=1, SUB filtering above.
// Returns 0 on success with *out_size set; 1 on bad args; 2 if dst_capacity
// is too small (caller sizes it at h*(3w+1) + 1KiB slack — deflate stored
// blocks bound expansion well under that).
int polyp_png_encode(const uint8_t* src, int32_t h, int32_t w, int32_t level,
                     uint8_t* dst, int64_t dst_capacity, int64_t* out_size) {
  if (!src || !dst || !out_size || h <= 0 || w <= 0) return 1;
  if (level < 0) level = 0;
  if (level > 9) level = 9;
  MemSink sink{dst, dst_capacity, 0, false};
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    png_destroy_write_struct(&png, &info);
    return 1;
  }
  if (setjmp(png_jmpbuf(png))) {
    const bool overflow = sink.overflow;
    png_destroy_write_struct(&png, &info);
    return overflow ? 2 : 1;
  }
  png_set_write_fn(png, &sink, mem_write, mem_flush);
  png_set_IHDR(png, info, static_cast<png_uint_32>(w),
               static_cast<png_uint_32>(h), 8, PNG_COLOR_TYPE_RGB,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_set_compression_level(png, level);
  png_set_filter(png, 0, level <= 1 ? PNG_FILTER_NONE : PNG_FILTER_SUB);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int32_t y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(src) + static_cast<size_t>(y) * w * 3;
  png_write_image(png, rows.data());
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  *out_size = sink.size;
  return 0;
}

}  // extern "C"
