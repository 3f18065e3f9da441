// Native baseline-TIFF decode for the corpus ingestion path.
//
// The reference corpus is CSV-listed .tif images (PolypDataset.py:48-53,
// 788 train / 113 val / 225 test files), decoded per epoch by PIL in the
// reference. polyp-tpu decodes once into the uint8 cache (data/cache.py);
// this is that decode in C++ behind the same C ABI pattern as
// png_decode.cpp. No libtiff dependency — a self-contained reader for the
// profile that covers PIL- and scanner-written polyp TIFFs:
//   * little/big endian classic TIFF (II*/MM*)
//   * 8-bit samples, chunky planar config, 1/3/4 samples per pixel
//     (grayscale expanded, alpha dropped → RGB8 out)
//   * strip-based layout (RowsPerStrip, StripOffsets/ByteCounts)
//   * Compression: 1 (none), 5 (LZW w/ early-change + horizontal
//     predictor), 32773 (PackBits)
// Anything outside the profile returns a nonzero code and the Python side
// falls back to PIL (data/io.py) — never wrong, just slower.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  std::vector<uint8_t> data;
  bool big_endian = false;
  // Sticky out-of-bounds marker: any read past the file poisons the parse,
  // so truncated/corrupt files fail (→ PIL fallback) instead of decoding
  // from silently-zero header values.
  mutable bool oob = false;

  uint16_t u16(size_t off) const {
    if (off + 2 > data.size()) {
      oob = true;
      return 0;
    }
    return big_endian ? (data[off] << 8) | data[off + 1]
                      : (data[off + 1] << 8) | data[off];
  }
  uint32_t u32(size_t off) const {
    if (off + 4 > data.size()) {
      oob = true;
      return 0;
    }
    return big_endian
               ? ((uint32_t)data[off] << 24) | ((uint32_t)data[off + 1] << 16) |
                     ((uint32_t)data[off + 2] << 8) | data[off + 3]
               : ((uint32_t)data[off + 3] << 24) |
                     ((uint32_t)data[off + 2] << 16) |
                     ((uint32_t)data[off + 1] << 8) | data[off];
  }
};

struct Entry {
  uint16_t tag = 0, type = 0;
  uint32_t count = 0;
  size_t value_off = 0;  // offset of the value field itself (4 bytes)
};

// type sizes: BYTE=1,ASCII=1,SHORT=2,LONG=4,RATIONAL=8
int type_size(uint16_t t) {
  switch (t) {
    case 1: case 2: case 6: case 7: return 1;
    case 3: case 8: return 2;
    case 4: case 9: case 11: return 4;
    case 5: case 10: case 12: return 8;
    default: return 0;
  }
}

// Read the i-th integer value of an entry. Every integer tag consumed here
// is SHORT(3) or LONG(4) per the TIFF6 spec; any other type (BYTE, SSHORT,
// rationals, …) is rejected rather than misread as u32, and out-of-range
// indices/offsets poison the Reader's sticky oob flag.
uint32_t entry_value(const Reader& r, const Entry& e, uint32_t i) {
  if ((e.type != 3 && e.type != 4) || i >= e.count) {
    r.oob = true;
    return 0;
  }
  int ts = type_size(e.type);
  size_t total = (size_t)ts * e.count;
  size_t base = total <= 4 ? e.value_off : r.u32(e.value_off);
  size_t off = base + (size_t)ts * i;
  return e.type == 3 ? r.u16(off) : r.u32(off);
}

bool unpackbits(const uint8_t* src, size_t n, std::vector<uint8_t>& dst,
                size_t expect) {
  size_t i = 0;
  while (i < n && dst.size() < expect) {
    int8_t c = (int8_t)src[i++];
    if (c >= 0) {
      size_t run = (size_t)c + 1;
      if (i + run > n) return false;
      dst.insert(dst.end(), src + i, src + i + run);
      i += run;
    } else if (c != -128) {
      if (i >= n) return false;
      dst.insert(dst.end(), (size_t)(-c) + 1, src[i++]);
    }
  }
  return dst.size() >= expect;
}

// TIFF LZW: MSB-first bit packing, 9→12-bit codes, early change.
bool lzw_decode(const uint8_t* src, size_t n, std::vector<uint8_t>& dst,
                size_t expect) {
  constexpr int kClear = 256, kEoi = 257;
  std::vector<std::vector<uint8_t>> table;
  auto reset = [&] {
    table.clear();
    table.reserve(4096);
    for (int i = 0; i < 256; i++) table.push_back({(uint8_t)i});
    table.push_back({});  // 256 clear
    table.push_back({});  // 257 eoi
  };
  reset();
  int bits = 9;
  size_t bitpos = 0;
  int prev = -1;
  auto next_code = [&]() -> int {
    if ((bitpos + bits + 7) / 8 > n) return -1;
    uint32_t v = 0;
    for (int b = 0; b < bits; b++) {
      size_t byte = (bitpos + b) >> 3;
      int bit = 7 - ((bitpos + b) & 7);
      v = (v << 1) | ((src[byte] >> bit) & 1);
    }
    bitpos += bits;
    return (int)v;
  };
  while (dst.size() < expect) {
    int code = next_code();
    if (code < 0 || code == kEoi) break;
    if (code == kClear) {
      reset();
      bits = 9;
      prev = -1;
      continue;
    }
    if (prev < 0) {
      if (code >= (int)table.size() || table[code].empty()) return false;
      dst.insert(dst.end(), table[code].begin(), table[code].end());
      prev = code;
    } else {
      std::vector<uint8_t> entry;
      if (code < (int)table.size() && !table[code].empty()) {
        entry = table[code];
      } else if (code == (int)table.size()) {
        entry = table[prev];
        entry.push_back(table[prev][0]);
      } else {
        return false;
      }
      dst.insert(dst.end(), entry.begin(), entry.end());
      std::vector<uint8_t> added = table[prev];
      added.push_back(entry[0]);
      table.push_back(std::move(added));
      prev = code;
    }
    // TIFF early change: bump width when the NEXT added code would not fit
    if ((int)table.size() >= (1 << bits) - 1 && bits < 12) bits++;
  }
  return dst.size() >= expect;
}

}  // namespace

extern "C" {

// Same contract as polyp_png_decode: 0 on success; dst==nullptr queries
// dimensions only; on success dst holds h*w*3 RGB8.
int polyp_tiff_decode(const char* path, uint8_t* dst, int64_t dst_capacity,
                      int32_t* out_h, int32_t* out_w) {
  Reader r;
  {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return 1;
    std::fseek(fp, 0, SEEK_END);
    long sz = std::ftell(fp);
    std::fseek(fp, 0, SEEK_SET);
    if (sz <= 8) {
      std::fclose(fp);
      return 2;
    }
    r.data.resize((size_t)sz);
    size_t got = std::fread(r.data.data(), 1, (size_t)sz, fp);
    std::fclose(fp);
    if (got != (size_t)sz) return 3;
  }
  if (r.data[0] == 'M' && r.data[1] == 'M') r.big_endian = true;
  else if (!(r.data[0] == 'I' && r.data[1] == 'I')) return 4;
  if (r.u16(2) != 42) return 5;  // classic TIFF only (BigTIFF unsupported)

  size_t ifd = r.u32(4);
  uint16_t nent = r.u16(ifd);
  if (ifd == 0 || nent == 0 || ifd + 2 + 12 * (size_t)nent > r.data.size())
    return 6;

  uint32_t width = 0, height = 0, compression = 1, photometric = 2;
  uint32_t spp = 1, rows_per_strip = 0xFFFFFFFF, planar = 1, predictor = 1;
  Entry strip_offsets, strip_counts, bits_entry;
  for (uint16_t i = 0; i < nent; i++) {
    size_t off = ifd + 2 + 12 * (size_t)i;
    Entry e;
    e.tag = r.u16(off);
    e.type = r.u16(off + 2);
    e.count = r.u32(off + 4);
    e.value_off = off + 8;
    switch (e.tag) {
      case 256: width = entry_value(r, e, 0); break;
      case 257: height = entry_value(r, e, 0); break;
      case 258: bits_entry = e; break;
      case 259: compression = entry_value(r, e, 0); break;
      case 262: photometric = entry_value(r, e, 0); break;
      case 273: strip_offsets = e; break;
      case 277: spp = entry_value(r, e, 0); break;
      case 278: rows_per_strip = entry_value(r, e, 0); break;
      case 279: strip_counts = e; break;
      case 284: planar = entry_value(r, e, 0); break;
      case 317: predictor = entry_value(r, e, 0); break;
      default: break;
    }
  }
  if (r.oob) return 20;  // mistyped or out-of-range IFD entry
  if (width == 0 || height == 0 || strip_offsets.tag == 0) return 7;
  if (planar != 1) return 8;                       // chunky only
  if (spp != 1 && spp != 3 && spp != 4) return 9;  // gray/RGB/RGBA
  if (photometric != 0 && photometric != 1 && photometric != 2) return 10;
  if (compression != 1 && compression != 5 && compression != 32773) return 11;
  if (predictor != 1 && predictor != 2) return 12;
  if (bits_entry.tag != 0)
    for (uint32_t i = 0; i < bits_entry.count && i < spp; i++)
      if (entry_value(r, bits_entry, i) != 8 || r.oob) return 13;  // 8-bit only

  *out_h = (int32_t)height;
  *out_w = (int32_t)width;
  if (dst == nullptr) return 0;
  int64_t need = (int64_t)height * width * 3;
  if (dst_capacity < need) return 14;

  // tag 278 absent → spec default 2^32-1 (one strip); clamp to height so
  // the strip-count arithmetic below cannot wrap.
  if (rows_per_strip == 0 || rows_per_strip > height) rows_per_strip = height;
  uint32_t nstrips = (height + rows_per_strip - 1) / rows_per_strip;
  if (strip_offsets.count < nstrips) return 15;

  size_t row_bytes = (size_t)width * spp;
  std::vector<uint8_t> raw;
  raw.reserve(row_bytes * height);
  for (uint32_t s = 0; s < nstrips; s++) {
    uint32_t rows = s + 1 < nstrips ? rows_per_strip
                                    : height - s * rows_per_strip;
    size_t expect = row_bytes * rows;
    size_t off = entry_value(r, strip_offsets, s);
    size_t cnt = strip_counts.tag ? entry_value(r, strip_counts, s)
                                  : expect;
    if (r.oob || off + cnt > r.data.size()) return 16;
    const uint8_t* src = r.data.data() + off;
    if (compression == 1) {
      if (cnt < expect) return 17;
      raw.insert(raw.end(), src, src + expect);
    } else {
      std::vector<uint8_t> strip;
      strip.reserve(expect);
      bool ok = compression == 5 ? lzw_decode(src, cnt, strip, expect)
                                 : unpackbits(src, cnt, strip, expect);
      if (!ok) return 18;
      strip.resize(expect);
      if (predictor == 2)  // horizontal differencing, per strip row
        for (uint32_t y = 0; y < rows; y++)
          for (size_t x = spp; x < row_bytes; x++)
            strip[y * row_bytes + x] =
                (uint8_t)(strip[y * row_bytes + x] +
                          strip[y * row_bytes + x - spp]);
      raw.insert(raw.end(), strip.begin(), strip.end());
    }
  }
  if (raw.size() < row_bytes * height) return 19;

  // chunky samples → RGB8 (gray expand / alpha drop; photometric 0 invert)
  for (size_t p = 0; p < (size_t)height * width; p++) {
    const uint8_t* s = raw.data() + p * spp;
    uint8_t* d = dst + p * 3;
    if (spp == 1) {
      uint8_t v = photometric == 0 ? (uint8_t)(255 - s[0]) : s[0];
      d[0] = d[1] = d[2] = v;
    } else {
      d[0] = s[0];
      d[1] = s[1];
      d[2] = s[2];
    }
  }
  return 0;
}

}  // extern "C"
