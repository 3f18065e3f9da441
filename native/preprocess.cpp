// polyp-tpu native preprocessing kernels.
//
// The reference does all per-sample pixel work in Python/PIL inside
// DataLoader workers (classifier_model/PolypDataset.py:52-64). Here the
// cache-build hot loop — bilinear resize, binary-mask multiply, and batched
// preprocessing over a thread pool — is native C++ behind a C ABI consumed
// via ctypes (polyp_tpu/data/native.py). Decode stays in PIL (TIFF needs
// libtiff, absent from this image); everything after decode is native.
//
// Build: `make -C native` → libpolyp_preprocess.so
//
// All buffers are uint8 HWC row-major. Bilinear matches PIL's
// Image.BILINEAR within rounding (half-pixel centers, clamped edges).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float src_coord(int dst, float scale) {
  // half-pixel-center mapping (PIL / OpenCV INTER_LINEAR convention)
  return (static_cast<float>(dst) + 0.5f) * scale - 0.5f;
}

void resize_bilinear_one(const uint8_t* src, int sh, int sw, int c,
                         uint8_t* dst, int dh, int dw) {
  const float ys = static_cast<float>(sh) / dh;
  const float xs = static_cast<float>(sw) / dw;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> xw(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = src_coord(x, xs);
    fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
    x0[x] = static_cast<int>(fx);
    x1[x] = std::min(x0[x] + 1, sw - 1);
    xw[x] = fx - x0[x];
  }
  for (int y = 0; y < dh; ++y) {
    float fy = src_coord(y, ys);
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * c;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * c;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      const float wx = xw[x];
      const uint8_t* p00 = row0 + static_cast<size_t>(x0[x]) * c;
      const uint8_t* p01 = row0 + static_cast<size_t>(x1[x]) * c;
      const uint8_t* p10 = row1 + static_cast<size_t>(x0[x]) * c;
      const uint8_t* p11 = row1 + static_cast<size_t>(x1[x]) * c;
      for (int k = 0; k < c; ++k) {
        const float top = p00[k] + (p01[k] - p00[k]) * wx;
        const float bot = p10[k] + (p11[k] - p10[k]) * wx;
        out[static_cast<size_t>(x) * c + k] =
            static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

void mask_multiply_one(uint8_t* img, const uint8_t* mask, int h, int w, int c) {
  // zero pixels where mask == 0 (PolypDataset.py:55-60: mask>0 semantics)
  for (size_t i = 0; i < static_cast<size_t>(h) * w; ++i) {
    if (mask[i] == 0) {
      std::memset(img + i * c, 0, c);
    }
  }
}

template <typename Fn>
void parallel_for(int n, int num_threads, Fn&& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> pool;
  const int workers = std::min(num_threads, n);
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

void polyp_resize_bilinear(const uint8_t* src, int sh, int sw, int c,
                           uint8_t* dst, int dh, int dw) {
  resize_bilinear_one(src, sh, sw, c, dst, dh, dw);
}

void polyp_mask_multiply(uint8_t* img, const uint8_t* mask, int h, int w,
                         int c) {
  mask_multiply_one(img, mask, h, w, c);
}

// Batched: n images with per-image shapes (shapes[2*i], shapes[2*i+1]),
// packed back-to-back in `src` at offsets[i] (bytes); masks optional
// (nullptr or per-image at mask_offsets). Output: n × dh × dw × c.
void polyp_batch_preprocess(const uint8_t* src, const int64_t* offsets,
                            const int32_t* shapes, int n, int c,
                            uint8_t* masks, const int64_t* mask_offsets,
                            uint8_t* dst, int dh, int dw, int num_threads) {
  parallel_for(n, num_threads, [&](int i) {
    const uint8_t* img = src + offsets[i];
    const int sh = shapes[2 * i];
    const int sw = shapes[2 * i + 1];
    uint8_t* out = dst + static_cast<size_t>(i) * dh * dw * c;
    if (masks != nullptr) {
      // copy-then-mask-then-resize preserves the reference's order
      std::vector<uint8_t> tmp(img, img + static_cast<size_t>(sh) * sw * c);
      mask_multiply_one(tmp.data(), masks + mask_offsets[i], sh, sw, c);
      resize_bilinear_one(tmp.data(), sh, sw, c, out, dh, dw);
    } else {
      resize_bilinear_one(img, sh, sw, c, out, dh, dw);
    }
  });
}

// uint8 HWC → float32 normalized ((x/255 - mean)/std per channel), batched.
void polyp_normalize_f32(const uint8_t* src, float* dst, int64_t n_pixels,
                         int c, const float* mean, const float* std_dev) {
  std::vector<float> scale(c), bias(c);
  for (int k = 0; k < c; ++k) {
    scale[k] = 1.0f / (255.0f * std_dev[k]);
    bias[k] = -mean[k] / std_dev[k];
  }
  for (int64_t i = 0; i < n_pixels; ++i) {
    for (int k = 0; k < c; ++k) {
      dst[i * c + k] = src[i * c + k] * scale[k] + bias[k];
    }
  }
}

}  // extern "C"
