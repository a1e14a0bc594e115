// framehost implementation. See framehost.h for the component map to the
// reference (frame queue, PixelFormatConverter, test pattern).

#include "framehost.h"

#include <algorithm>
#include <atomic>
#include <cstring>
#include <mutex>
#include <vector>

// ---- frame ring ----------------------------------------------------------
// Mutex-guarded ring; push/pop copy whole frames. The reference guards its
// queues the same way (Application.h:487-501); contention is negligible at
// video rates and the copy is the cost that matters.

struct rc_ring {
    std::mutex mu;
    std::vector<uint8_t> storage;
    size_t frame_bytes = 0;
    uint32_t capacity = 0;
    uint32_t head = 0;  // index of oldest frame
    uint32_t count = 0;
    uint64_t pushed = 0;
    uint64_t dropped = 0;

    uint8_t *slot(uint32_t i) { return storage.data() + size_t(i) * frame_bytes; }
};

RC_API rc_ring *rc_ring_create(uint32_t capacity, size_t frame_bytes) {
    if (capacity == 0 || frame_bytes == 0) return nullptr;
    auto *r = new rc_ring();
    r->capacity = capacity;
    r->frame_bytes = frame_bytes;
    r->storage.resize(size_t(capacity) * frame_bytes);
    return r;
}

RC_API void rc_ring_destroy(rc_ring *r) { delete r; }

RC_API void rc_ring_push(rc_ring *r, const uint8_t *data) {
    std::lock_guard<std::mutex> lock(r->mu);
    uint32_t idx;
    if (r->count == r->capacity) {
        // drop-oldest (VideoCaptureRemote.h:182-188)
        idx = (r->head + r->count) % r->capacity;  // == head
        r->head = (r->head + 1) % r->capacity;
        r->dropped++;
    } else {
        idx = (r->head + r->count) % r->capacity;
        r->count++;
    }
    std::memcpy(r->slot(idx), data, r->frame_bytes);
    r->pushed++;
}

RC_API int rc_ring_pop(rc_ring *r, uint8_t *out) {
    std::lock_guard<std::mutex> lock(r->mu);
    if (r->count == 0) return 0;
    std::memcpy(out, r->slot(r->head), r->frame_bytes);
    r->head = (r->head + 1) % r->capacity;
    r->count--;
    return 1;
}

RC_API int64_t rc_ring_pop_latest(rc_ring *r, uint8_t *out) {
    std::lock_guard<std::mutex> lock(r->mu);
    if (r->count == 0) return -1;
    uint32_t newest = (r->head + r->count - 1) % r->capacity;
    int64_t discarded = int64_t(r->count) - 1;
    std::memcpy(out, r->slot(newest), r->frame_bytes);
    r->head = (newest + 1) % r->capacity;
    r->count = 0;
    return discarded;
}

RC_API uint32_t rc_ring_size(const rc_ring *r) { return r->count; }
RC_API uint64_t rc_ring_pushed(const rc_ring *r) { return r->pushed; }
RC_API uint64_t rc_ring_dropped(const rc_ring *r) { return r->dropped; }

// ---- pixel-format conversion ---------------------------------------------
// BT.601 limited range, matching ops/colorspace.py bit-for-bit in float
// then rounded: R = 1.164(Y-16) + 1.596(Cr-128), etc. Integer fixed-point
// (<<16) keeps the loop branch-free and auto-vectorizable.

namespace {
constexpr int32_t kYScale = 76309;   // 1.164 * 65536
constexpr int32_t kRCr = 104597;     // 1.596
constexpr int32_t kGCb = -25675;     // -0.392 (rounded from -0.391762)
constexpr int32_t kGCr = -53279;     // -0.813 (rounded from -0.812968)
constexpr int32_t kBCb = 132201;     // 2.017

inline uint8_t clamp_u8(int32_t v) {
    return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

inline void ycbcr_px(int32_t y, int32_t cb, int32_t cr, uint8_t *dst) {
    const int32_t yl = kYScale * (y - 16) + 32768;
    dst[0] = clamp_u8((yl + kRCr * (cr - 128)) >> 16);
    dst[1] = clamp_u8((yl + kGCb * (cb - 128) + kGCr * (cr - 128)) >> 16);
    dst[2] = clamp_u8((yl + kBCb * (cb - 128)) >> 16);
}
}  // namespace

RC_API void rc_yuyv_to_rgb24(const uint8_t *src, uint8_t *dst, uint32_t w, uint32_t h) {
    for (uint32_t row = 0; row < h; ++row) {
        const uint8_t *s = src + size_t(row) * w * 2;
        uint8_t *d = dst + size_t(row) * w * 3;
        for (uint32_t x = 0; x < w; x += 2) {
            const int32_t y0 = s[0], u = s[1], y1 = s[2], v = s[3];
            ycbcr_px(y0, u, v, d);
            ycbcr_px(y1, u, v, d + 3);
            s += 4;
            d += 6;
        }
    }
}

RC_API void rc_uyvy_to_rgb24(const uint8_t *src, uint8_t *dst, uint32_t w, uint32_t h) {
    for (uint32_t row = 0; row < h; ++row) {
        const uint8_t *s = src + size_t(row) * w * 2;
        uint8_t *d = dst + size_t(row) * w * 3;
        for (uint32_t x = 0; x < w; x += 2) {
            const int32_t u = s[0], y0 = s[1], v = s[2], y1 = s[3];
            ycbcr_px(y0, u, v, d);
            ycbcr_px(y1, u, v, d + 3);
            s += 4;
            d += 6;
        }
    }
}

RC_API void rc_nv12_to_rgb24(const uint8_t *yp, const uint8_t *uv, uint8_t *dst,
                             uint32_t w, uint32_t h) {
    for (uint32_t row = 0; row < h; ++row) {
        const uint8_t *y = yp + size_t(row) * w;
        const uint8_t *c = uv + size_t(row / 2) * w;
        uint8_t *d = dst + size_t(row) * w * 3;
        for (uint32_t x = 0; x < w; ++x) {
            const uint32_t cx = (x / 2) * 2;
            ycbcr_px(y[x], c[cx], c[cx + 1], d + size_t(x) * 3);
        }
    }
}

RC_API void rc_bgra_to_rgb24(const uint8_t *src, uint8_t *dst, uint32_t w, uint32_t h) {
    const size_t n = size_t(w) * h;
    for (size_t i = 0; i < n; ++i) {
        dst[i * 3 + 0] = src[i * 4 + 2];
        dst[i * 3 + 1] = src[i * 4 + 1];
        dst[i * 3 + 2] = src[i * 4 + 0];
    }
}

RC_API void rc_rgba_to_rgb24(const uint8_t *src, uint8_t *dst, uint32_t w, uint32_t h) {
    const size_t n = size_t(w) * h;
    for (size_t i = 0; i < n; ++i) {
        dst[i * 3 + 0] = src[i * 4 + 0];
        dst[i * 3 + 1] = src[i * 4 + 1];
        dst[i * 3 + 2] = src[i * 4 + 2];
    }
}

// ---- test pattern ---------------------------------------------------------

RC_API void rc_testpattern_fill(uint8_t *buf, uint32_t w, uint32_t h,
                                uint64_t frame_index) {
    static const uint8_t bars[8][3] = {
        {255, 255, 255}, {255, 255, 0}, {0, 255, 255}, {0, 255, 0},
        {255, 0, 255},   {255, 0, 0},   {0, 0, 255},   {16, 16, 16},
    };
    const uint32_t bw = std::max(w / 8, 1u);
    for (uint32_t y = 0; y < h; ++y) {
        uint8_t *row = buf + size_t(y) * w * 3;
        for (uint32_t x = 0; x < w; ++x) {
            const uint32_t b = std::min(x / bw, 7u);
            row[x * 3 + 0] = bars[b][0];
            row[x * 3 + 1] = bars[b][1];
            row[x * 3 + 2] = bars[b][2];
        }
    }
    // moving marker band on a dark strip (temporal-aliveness signal,
    // visible over every bar including the white one)
    const uint32_t band_h = std::max(h / 10, 1u);
    const uint32_t mw = std::max(w / 100, 2u);
    const uint32_t mx = uint32_t((frame_index * mw) % w);
    for (uint32_t y = h - band_h; y < h; ++y) {
        uint8_t *row = buf + size_t(y) * w * 3;
        for (uint32_t x = 0; x < w; ++x) {
            const uint8_t v = (x >= mx && x < std::min(mx + mw, w)) ? 255 : 32;
            row[x * 3 + 0] = row[x * 3 + 1] = row[x * 3 + 2] = v;
        }
    }
}
