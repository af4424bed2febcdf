// Antialiased separable image resampling + normalization (C++ runtime piece).
//
// The reference stack does per-sample PIL resize + torchvision Normalize on
// the Python side of the data loader (transform.py eval path; PACL utils.py) —
// the dataloader hot spot. This implements the same convolution-based
// resampling Pillow uses (scale-aware support, bilinear/bicubic kernels,
// a = -0.5) in multithreaded C++, fused with the (x/255 - mean)/std
// normalization, writing float32 channels-last ready for device_put.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kBicubicA = -0.5;

double bilinear_filter(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

double bicubic_filter(double x) {
  x = std::fabs(x);
  if (x < 1.0) return ((kBicubicA + 2.0) * x - (kBicubicA + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * kBicubicA;
  return 0.0;
}

struct Taps {
  std::vector<int> xmin;      // first source index per output position
  std::vector<int> count;     // taps per output position
  std::vector<double> weight; // flattened weights, stride = max_count
  int max_count = 0;
};

// Pillow-compatible coefficient table: support widens by the scale factor
// when downsampling (antialiasing).
Taps build_taps(int in_size, int out_size, bool bicubic) {
  const double support_base = bicubic ? 2.0 : 1.0;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = support_base * filterscale;
  const int max_count = static_cast<int>(std::ceil(support)) * 2 + 1;

  Taps taps;
  taps.xmin.resize(out_size);
  taps.count.resize(out_size);
  taps.weight.assign(static_cast<size_t>(out_size) * max_count, 0.0);
  taps.max_count = max_count;

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;

    double* w = &taps.weight[static_cast<size_t>(xx) * max_count];
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      const double arg = (x - center + 0.5) / filterscale;
      const double val = bicubic ? bicubic_filter(arg) : bilinear_filter(arg);
      w[x - xmin] = val;
      total += val;
    }
    if (total != 0.0) {
      for (int i = 0; i < xmax - xmin; ++i) w[i] /= total;
    }
    taps.xmin[xx] = xmin;
    taps.count[xx] = xmax - xmin;
  }
  return taps;
}

// One image: uint8 HWC -> float32 HWC resized + normalized.
void resize_one(const uint8_t* in, int in_h, int in_w, float* out, int out_h,
                int out_w, const float* mean, const float* inv_std,
                bool bicubic) {
  const Taps h_taps = build_taps(in_w, out_w, bicubic);
  const Taps v_taps = build_taps(in_h, out_h, bicubic);

  // Pass 1: horizontal -> [in_h, out_w, 3] float
  std::vector<float> tmp(static_cast<size_t>(in_h) * out_w * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = in + static_cast<size_t>(y) * in_w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      const double* w = &h_taps.weight[static_cast<size_t>(xx) * h_taps.max_count];
      const int xmin = h_taps.xmin[xx];
      const int count = h_taps.count[xx];
      double acc0 = 0.0, acc1 = 0.0, acc2 = 0.0;
      for (int i = 0; i < count; ++i) {
        const uint8_t* px = row + static_cast<size_t>(xmin + i) * 3;
        acc0 += w[i] * px[0];
        acc1 += w[i] * px[1];
        acc2 += w[i] * px[2];
      }
      // Pillow's 8bpc pipeline rounds and clamps the horizontal-pass
      // intermediate to uint8; bicubic overshoot then clips. Reproduce it for
      // bit-near parity with the torchvision/PIL eval transforms.
      trow[xx * 3 + 0] = std::nearbyintf(
          std::min(255.0f, std::max(0.0f, static_cast<float>(acc0))));
      trow[xx * 3 + 1] = std::nearbyintf(
          std::min(255.0f, std::max(0.0f, static_cast<float>(acc1))));
      trow[xx * 3 + 2] = std::nearbyintf(
          std::min(255.0f, std::max(0.0f, static_cast<float>(acc2))));
    }
  }

  // Pass 2: vertical -> [out_h, out_w, 3], fused normalize.
  for (int yy = 0; yy < out_h; ++yy) {
    const double* w = &v_taps.weight[static_cast<size_t>(yy) * v_taps.max_count];
    const int ymin = v_taps.xmin[yy];
    const int count = v_taps.count[yy];
    float* orow = out + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      double acc0 = 0.0, acc1 = 0.0, acc2 = 0.0;
      for (int i = 0; i < count; ++i) {
        const float* px =
            tmp.data() + (static_cast<size_t>(ymin + i) * out_w + xx) * 3;
        acc0 += w[i] * px[0];
        acc1 += w[i] * px[1];
        acc2 += w[i] * px[2];
      }
      // Final uint8 quantization like Pillow, before ToTensor's /255.
      const double c0 = std::nearbyint(std::min(255.0, std::max(0.0, acc0)));
      const double c1 = std::nearbyint(std::min(255.0, std::max(0.0, acc1)));
      const double c2 = std::nearbyint(std::min(255.0, std::max(0.0, acc2)));
      orow[xx * 3 + 0] = (static_cast<float>(c0) / 255.0f - mean[0]) * inv_std[0];
      orow[xx * 3 + 1] = (static_cast<float>(c1) / 255.0f - mean[1]) * inv_std[1];
      orow[xx * 3 + 2] = (static_cast<float>(c2) / 255.0f - mean[2]) * inv_std[2];
    }
  }
}

}  // namespace

extern "C" {

// Batch of same-sized images, threaded across the batch.
void resize_normalize_batch(const uint8_t* in, int n, int in_h, int in_w,
                            float* out, int out_h, int out_w,
                            const float* mean, const float* std_dev,
                            int use_bicubic, int num_threads) {
  float inv_std[3] = {1.0f / std_dev[0], 1.0f / std_dev[1], 1.0f / std_dev[2]};
  const size_t in_stride = static_cast<size_t>(in_h) * in_w * 3;
  const size_t out_stride = static_cast<size_t>(out_h) * out_w * 3;

  if (num_threads <= 1 || n == 1) {
    for (int i = 0; i < n; ++i) {
      resize_one(in + i * in_stride, in_h, in_w, out + i * out_stride, out_h,
                 out_w, mean, inv_std, use_bicubic != 0);
    }
    return;
  }
  std::vector<std::thread> workers;
  std::atomic_int next{0};
  auto work = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      resize_one(in + i * in_stride, in_h, in_w, out + i * out_stride, out_h,
                 out_w, mean, inv_std, use_bicubic != 0);
    }
  };
  const int t = std::min(num_threads, n);
  workers.reserve(t);
  for (int i = 0; i < t; ++i) workers.emplace_back(work);
  for (auto& th : workers) th.join();
}

// Single image of arbitrary size (for ragged batches).
void resize_normalize_one(const uint8_t* in, int in_h, int in_w, float* out,
                          int out_h, int out_w, const float* mean,
                          const float* std_dev, int use_bicubic) {
  float inv_std[3] = {1.0f / std_dev[0], 1.0f / std_dev[1], 1.0f / std_dev[2]};
  resize_one(in, in_h, in_w, out, out_h, out_w, mean, inv_std,
             use_bicubic != 0);
}

}  // extern "C"
