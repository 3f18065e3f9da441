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
