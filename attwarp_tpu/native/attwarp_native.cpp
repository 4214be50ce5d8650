// attwarp_native: host-side image ops for the data pipeline and drivers.
//
// The reference delegates its host-side image work to OpenCV's compiled C++
// (cv2.resize / cv2.remap / box filter); this is the framework's own native
// equivalent so the input pipeline does not depend on OpenCV. Semantics:
//  - resize_bilinear: half-pixel-center bilinear (cv2 INTER_LINEAR).
//  - remap_separable: separable bilinear warp with BORDER_REPLICATE.
//  - resize_nearest:  cv2 INTER_NEAREST convention (floor of src index).
//  - box_filter:      k x k mean with replicate padding.
//
// Built as a shared library by attwarp_tpu/native/__init__.py via g++;
// exposed over the C ABI and bound with ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Bilinear sample of one row-major HxWxC float image at (x, y), replicate.
inline void sample_bilinear(const float* src, int h, int w, int c, float x,
                            float y, float* out) {
    float x0f = std::floor(x), y0f = std::floor(y);
    float fx = x - x0f, fy = y - y0f;
    int x0 = clampi((int)x0f, 0, w - 1);
    int x1 = clampi((int)x0f + 1, 0, w - 1);
    int y0 = clampi((int)y0f, 0, h - 1);
    int y1 = clampi((int)y0f + 1, 0, h - 1);
    const float* p00 = src + ((size_t)y0 * w + x0) * c;
    const float* p01 = src + ((size_t)y0 * w + x1) * c;
    const float* p10 = src + ((size_t)y1 * w + x0) * c;
    const float* p11 = src + ((size_t)y1 * w + x1) * c;
    float w00 = (1 - fx) * (1 - fy), w01 = fx * (1 - fy);
    float w10 = (1 - fx) * fy, w11 = fx * fy;
    for (int k = 0; k < c; ++k) {
        out[k] = p00[k] * w00 + p01[k] * w01 + p10[k] * w10 + p11[k] * w11;
    }
}

}  // namespace

extern "C" {

// HxWxC float32 -> OHxOWxC float32, half-pixel-center bilinear.
void resize_bilinear_f32(const float* src, int h, int w, int c, float* dst,
                         int oh, int ow) {
    const float sx = (float)w / ow;
    const float sy = (float)h / oh;
    for (int i = 0; i < oh; ++i) {
        float y = (i + 0.5f) * sy - 0.5f;
        for (int j = 0; j < ow; ++j) {
            float x = (j + 0.5f) * sx - 0.5f;
            sample_bilinear(src, h, w, c, x, y, dst + ((size_t)i * ow + j) * c);
        }
    }
}

// Nearest-neighbor resize (cv2 INTER_NEAREST: floor(i * in/out)).
void resize_nearest_f32(const float* src, int h, int w, int c, float* dst,
                        int oh, int ow) {
    const float sx = (float)w / ow;
    const float sy = (float)h / oh;
    for (int i = 0; i < oh; ++i) {
        int yi = clampi((int)(i * sy), 0, h - 1);
        for (int j = 0; j < ow; ++j) {
            int xi = clampi((int)(j * sx), 0, w - 1);
            std::memcpy(dst + ((size_t)i * ow + j) * c,
                        src + ((size_t)yi * w + xi) * c, sizeof(float) * c);
        }
    }
}

// Separable remap: per-axis source coordinate vectors (the warp grid).
void remap_separable_f32(const float* src, int h, int w, int c,
                         const float* map_x, int ow, const float* map_y,
                         int oh, float* dst) {
    // x-pass into a temp (h x ow x c), then y-pass — same two-pass structure
    // as the TPU kernel, cache-friendlier than per-pixel 2-D sampling.
    std::vector<float> tmp((size_t)h * ow * c);
    for (int j = 0; j < ow; ++j) {
        float x = map_x[j];
        float x0f = std::floor(x);
        float fx = x - x0f;
        int x0 = clampi((int)x0f, 0, w - 1);
        int x1 = clampi((int)x0f + 1, 0, w - 1);
        for (int i = 0; i < h; ++i) {
            const float* a = src + ((size_t)i * w + x0) * c;
            const float* b = src + ((size_t)i * w + x1) * c;
            float* o = tmp.data() + ((size_t)i * ow + j) * c;
            for (int k = 0; k < c; ++k) o[k] = a[k] * (1 - fx) + b[k] * fx;
        }
    }
    for (int i = 0; i < oh; ++i) {
        float y = map_y[i];
        float y0f = std::floor(y);
        float fy = y - y0f;
        int y0 = clampi((int)y0f, 0, h - 1);
        int y1 = clampi((int)y0f + 1, 0, h - 1);
        const float* a = tmp.data() + (size_t)y0 * ow * c;
        const float* b = tmp.data() + (size_t)y1 * ow * c;
        float* o = dst + (size_t)i * ow * c;
        for (size_t t = 0; t < (size_t)ow * c; ++t)
            o[t] = a[t] * (1 - fy) + b[t] * fy;
    }
}

// k x k box filter with replicate padding, single-channel float32.
void box_filter_f32(const float* src, int h, int w, int k, float* dst) {
    int r = k / 2;
    float inv = 1.0f / (k * k);
    for (int i = 0; i < h; ++i) {
        for (int j = 0; j < w; ++j) {
            float s = 0.0f;
            for (int di = -r; di <= r; ++di) {
                int yi = clampi(i + di, 0, h - 1);
                for (int dj = -r; dj <= r; ++dj) {
                    int xj = clampi(j + dj, 0, w - 1);
                    s += src[(size_t)yi * w + xj];
                }
            }
            dst[(size_t)i * w + j] = s * inv;
        }
    }
}

// uint8 HxWxC -> float32 [0,1]
void u8_to_f32(const uint8_t* src, size_t n, float* dst) {
    for (size_t i = 0; i < n; ++i) dst[i] = src[i] * (1.0f / 255.0f);
}

// float32 -> uint8 with round-half-to-even saturate (cv2 saturate_cast).
void f32_to_u8(const float* src, size_t n, uint8_t* dst) {
    for (size_t i = 0; i < n; ++i) {
        float v = std::nearbyint(src[i]);
        dst[i] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
}

int attwarp_native_abi_version() { return 1; }

}  // extern "C"
