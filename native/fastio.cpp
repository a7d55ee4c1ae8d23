// fastio — host-side frame conversion for the moca_tpu IO path.
//
// TPU-native replacement for the host-side roles the reference delegates to
// native third-party code (decord's C++ frame pipeline, torch's vectorized
// uint8<->float casts; SURVEY §2.4): the streaming FIFO decode emits one
// frame per denoise iteration and the [-1,1]<->uint8 conversion sits on the
// host critical path between device transfer and the video encoder.
//
// Exposed via ctypes (moca_tpu/io/fastio.py). Build: `make -C native`.

#include <cstddef>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline uint8_t clamp_u8(float v) {
    v = (v + 1.0f) * 127.5f;
    if (v < 0.0f) v = 0.0f;
    if (v > 255.0f) v = 255.0f;
    return static_cast<uint8_t>(v);
}

template <typename Fn>
void parallel_chunks(size_t n, Fn fn) {
    unsigned hw = std::thread::hardware_concurrency();
    size_t nthreads = hw ? hw : 1;
    if (n < (1u << 16) || nthreads == 1) {
        fn(0, n);
        return;
    }
    std::vector<std::thread> threads;
    size_t chunk = (n + nthreads - 1) / nthreads;
    for (size_t t = 0; t < nthreads; ++t) {
        size_t lo = t * chunk;
        if (lo >= n) break;
        size_t hi = lo + chunk < n ? lo + chunk : n;
        threads.emplace_back([=] { fn(lo, hi); });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// [-1,1] float32 -> uint8, ((x+1)*127.5) with clamp (funcs.py:630-640).
void float_to_uint8(const float* src, uint8_t* dst, size_t n) {
    parallel_chunks(n, [=](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) dst[i] = clamp_u8(src[i]);
    });
}

// uint8 -> [-1,1] float32, (x/255 - 0.5) * 2 (funcs.py:565).
void uint8_to_float(const uint8_t* src, float* dst, size_t n) {
    constexpr float kScale = 2.0f / 255.0f;
    parallel_chunks(n, [=](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i)
            dst[i] = static_cast<float>(src[i]) * kScale - 1.0f;
    });
}

// Interleave per-frame planes into a contiguous clip buffer (t axis outer),
// used when assembling streamed FIFO frames for the encoder without a
// python-level copy loop. frames: array of t pointers, each h*w*c uint8.
void pack_frames(const uint8_t* const* frames, uint8_t* dst, size_t t,
                 size_t frame_bytes) {
    parallel_chunks(t, [=](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            const uint8_t* s = frames[i];
            uint8_t* d = dst + i * frame_bytes;
            for (size_t j = 0; j < frame_bytes; ++j) d[j] = s[j];
        }
    });
}

int fastio_abi_version() { return 1; }

}  // extern "C"
