// Host-side data-path kernels for the ucd_tpu input pipeline.
//
// TPU-native replacement for the CPU-bound parts of the reference's data
// layer: per-pixel label remapping via torch `tensor.apply_` Python lambdas
// (reference dataset/voc.py:186-207) and torchvision per-sample tensor
// transforms (reference dataset/transform.py). On a TPU host the input
// pipeline shares one core with the training loop, so these run as tight
// C++ loops exposed through ctypes (no pybind11 dependency).
//
// Build: scripts/build_native.sh -> native/libucd_data_ops.so

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// lbl[i] = lut[lbl[i]] for a 256-entry LUT; any value >= 256 maps through
// lut[255]. In-place over an int32 buffer.
void remap_labels_i32(int32_t* lbl, int64_t n, const int32_t* lut) {
  for (int64_t i = 0; i < n; ++i) {
    uint32_t v = static_cast<uint32_t>(lbl[i]);
    lbl[i] = lut[v < 256u ? v : 255u];
  }
}

// uint8 label buffer -> remapped int32 output.
void remap_labels_u8_to_i32(const uint8_t* src, int32_t* dst, int64_t n,
                            const int32_t* lut) {
  for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

// uint8 HWC image -> float32 HWC, x/255 then (x - mean) / std per channel.
// (reference run.py:51-54 ToTensor+Normalize, fused single pass)
void normalize_u8_to_f32(const uint8_t* src, float* dst, int64_t pixels,
                         int channels, const float* mean, const float* std_) {
  float scale[8], shift[8];
  for (int c = 0; c < channels && c < 8; ++c) {
    scale[c] = 1.0f / (255.0f * std_[c]);
    shift[c] = -mean[c] / std_[c];
  }
  for (int64_t p = 0; p < pixels; ++p) {
    const uint8_t* s = src + p * channels;
    float* d = dst + p * channels;
    for (int c = 0; c < channels; ++c) d[c] = s[c] * scale[c] + shift[c];
  }
}

// Paired crop + optional horizontal flip: image uint8 HWC + label uint8 HW
// from (H, W) to (ch, cw) starting at (top, left).
void crop_flip_pair_u8(const uint8_t* img, const uint8_t* lbl,
                       uint8_t* img_out, uint8_t* lbl_out,
                       int H, int W, int C, int top, int left, int ch, int cw,
                       int flip) {
  for (int y = 0; y < ch; ++y) {
    const uint8_t* irow = img + (static_cast<int64_t>(top + y) * W + left) * C;
    const uint8_t* lrow = lbl + static_cast<int64_t>(top + y) * W + left;
    uint8_t* io = img_out + static_cast<int64_t>(y) * cw * C;
    uint8_t* lo = lbl_out + static_cast<int64_t>(y) * cw;
    if (!flip) {
      std::memcpy(io, irow, static_cast<size_t>(cw) * C);
      std::memcpy(lo, lrow, static_cast<size_t>(cw));
    } else {
      for (int x = 0; x < cw; ++x) {
        const uint8_t* s = irow + (cw - 1 - x) * C;
        for (int c = 0; c < C; ++c) io[x * C + c] = s[c];
        lo[x] = lrow[cw - 1 - x];
      }
    }
  }
}

// Bilinear resize uint8 HWC image (half-pixel centers) + nearest resize of
// the paired uint8 HW label — the geometric core of RandomResizedCrop
// (reference dataset/transform.py paired semantics: NEAREST for labels).
void resize_pair_u8(const uint8_t* img, const uint8_t* lbl,
                    uint8_t* img_out, uint8_t* lbl_out,
                    int H, int W, int C, int OH, int OW) {
  const float sy = static_cast<float>(H) / OH;
  const float sx = static_cast<float>(W) / OW;
  for (int y = 0; y < OH; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(H - 1)));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, H - 1);
    float wy = fy - y0;
    int yn = std::min(static_cast<int>(y * sy), H - 1);
    for (int x = 0; x < OW; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(W - 1)));
      int x0 = static_cast<int>(fx);
      int x1 = std::min(x0 + 1, W - 1);
      float wx = fx - x0;
      for (int c = 0; c < C; ++c) {
        float v00 = img[(static_cast<int64_t>(y0) * W + x0) * C + c];
        float v01 = img[(static_cast<int64_t>(y0) * W + x1) * C + c];
        float v10 = img[(static_cast<int64_t>(y1) * W + x0) * C + c];
        float v11 = img[(static_cast<int64_t>(y1) * W + x1) * C + c];
        float v = (1 - wy) * ((1 - wx) * v00 + wx * v01)
                + wy * ((1 - wx) * v10 + wx * v11);
        img_out[(static_cast<int64_t>(y) * OW + x) * C + c] =
            static_cast<uint8_t>(v + 0.5f);
      }
      int xn = std::min(static_cast<int>(x * sx), W - 1);
      lbl_out[static_cast<int64_t>(y) * OW + x] =
          lbl[static_cast<int64_t>(yn) * W + xn];
    }
  }
}

// Streaming confusion-matrix accumulation on the host (for CPU-side eval
// paths; the device path uses the jit bincount). hist is n x n int64.
void confusion_update_i32(const int32_t* lbl, const int32_t* pred, int64_t n,
                          int n_classes, int64_t* hist) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t t = lbl[i];
    if (t >= 0 && t < n_classes) {
      hist[static_cast<int64_t>(t) * n_classes + pred[i]] += 1;
    }
  }
}

}  // extern "C"
