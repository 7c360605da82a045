// Native AVX oracle for trajectory-parity tests.
//
// Independent reimplementation of the physics of the reference CPU backend
// (reference: src/lib/sim_cpu.c:100-194 PackParticles/PackedUpdate and
// src/lib/world.c:99-110 UpdateWorld_CPU), written fresh against the
// TPU framework's SoA state layout:
//
//   * per substep, snapshot the massive particles' (x, y, m) into 8-wide
//     zero-padded SoA packs (Jacobi semantics — every target sees the same
//     pre-step source positions; zero-mass padding lanes contribute nothing);
//   * per target: 8-wide AVX accumulation of
//       r2 = (dx^2 + dy^2) + radius_target;  a += d * G*m / (sqrt(r2)*r2)
//     with separate mul/add (no FMA contraction) to mirror plain AVX math;
//   * semi-implicit Euler: v += a*dt; x += v*dt.
//
// Exposed via a C ABI and loaded from Python with ctypes
// (nbody_tpu/utils/cpp_oracle.py). Used only as a parity oracle; the Pallas
// kernel is the production path.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <immintrin.h>

namespace {

constexpr float kG = 10.0f;
constexpr int kLanes = 8;  // AVX: 8 floats

struct Packs {
    float* x;
    float* y;
    float* gm;  // pre-multiplied G * mass
    uint32_t n_packs;
};

Packs alloc_packs(uint32_t mass_len) {
    uint32_t n = (mass_len + kLanes - 1) / kLanes;
    if (n == 0) n = 1;
    size_t bytes = size_t(n) * kLanes * sizeof(float);
    Packs p;
    p.x = static_cast<float*>(std::aligned_alloc(32, bytes));
    p.y = static_cast<float*>(std::aligned_alloc(32, bytes));
    p.gm = static_cast<float*>(std::aligned_alloc(32, bytes));
    p.n_packs = n;
    return p;
}

void free_packs(Packs& p) {
    std::free(p.x);
    std::free(p.y);
    std::free(p.gm);
}

inline float hsum256(__m256 v) {
    alignas(32) float f[kLanes];
    _mm256_store_ps(f, v);
    float s = 0.0f;
    for (int i = 0; i < kLanes; ++i) s += f[i];
    return s;
}

}  // namespace

extern "C" {

// One batched update: n_steps substeps of size dt over SoA state arrays.
// pos/vel/acc are [n][2] interleaved (x, y); mass/radius are [n].
// Requires the massive-first partition: sources are rows [0, mass_len).
void nb_oracle_update(float* pos, float* vel, float* acc,
                      const float* mass, const float* radius,
                      uint32_t total_len, uint32_t mass_len,
                      float dt, uint32_t n_steps) {
    Packs packs = alloc_packs(mass_len);
    const __m256 vdt = _mm256_set1_ps(dt);
    (void)vdt;

    for (uint32_t step = 0; step < n_steps; ++step) {
        // snapshot sources before the substep (world.c:101-107 order)
        {
            // gather strided x/y into temporaries for pack fill
            // (pos is interleaved [x0 y0 x1 y1 ...])
            size_t padded = size_t(packs.n_packs) * kLanes;
            std::memset(packs.x, 0, padded * sizeof(float));
            std::memset(packs.y, 0, padded * sizeof(float));
            std::memset(packs.gm, 0, padded * sizeof(float));
            for (uint32_t j = 0; j < mass_len; ++j) {
                packs.x[j] = pos[2 * j];
                packs.y[j] = pos[2 * j + 1];
                packs.gm[j] = kG * mass[j];
            }
        }

        #pragma omp parallel for schedule(static)
        for (uint32_t i = 0; i < total_len; ++i) {
            const __m256 xi = _mm256_set1_ps(pos[2 * i]);
            const __m256 yi = _mm256_set1_ps(pos[2 * i + 1]);
            const __m256 ri = _mm256_set1_ps(radius[i]);
            __m256 ax = _mm256_setzero_ps();
            __m256 ay = _mm256_setzero_ps();

            for (uint32_t k = 0; k < packs.n_packs; ++k) {
                __m256 sx = _mm256_load_ps(packs.x + size_t(k) * kLanes);
                __m256 sy = _mm256_load_ps(packs.y + size_t(k) * kLanes);
                __m256 gm = _mm256_load_ps(packs.gm + size_t(k) * kLanes);

                __m256 dx = _mm256_sub_ps(sx, xi);
                __m256 dy = _mm256_sub_ps(sy, yi);
                __m256 d2 = _mm256_add_ps(_mm256_mul_ps(dx, dx),
                                          _mm256_mul_ps(dy, dy));
                __m256 r2 = _mm256_add_ps(d2, ri);   // softening: + target radius
                __m256 r1 = _mm256_sqrt_ps(r2);
                __m256 r3 = _mm256_mul_ps(r1, r2);
                __m256 f = _mm256_div_ps(gm, r3);
                ax = _mm256_add_ps(ax, _mm256_mul_ps(dx, f));
                ay = _mm256_add_ps(ay, _mm256_mul_ps(dy, f));
            }

            float a0 = hsum256(ax);
            float a1 = hsum256(ay);
            acc[2 * i] = a0;
            acc[2 * i + 1] = a1;
            vel[2 * i] += a0 * dt;
            vel[2 * i + 1] += a1 * dt;
            pos[2 * i] += vel[2 * i] * dt;
            pos[2 * i + 1] += vel[2 * i + 1] * dt;
        }
    }

    free_packs(packs);
}

// Scalar (non-SIMD) variant, for cross-checking the AVX path itself.
void nb_oracle_update_scalar(float* pos, float* vel, float* acc,
                             const float* mass, const float* radius,
                             uint32_t total_len, uint32_t mass_len,
                             float dt, uint32_t n_steps) {
    float* sx = static_cast<float*>(std::malloc(sizeof(float) * (mass_len ? mass_len : 1)));
    float* sy = static_cast<float*>(std::malloc(sizeof(float) * (mass_len ? mass_len : 1)));
    float* sgm = static_cast<float*>(std::malloc(sizeof(float) * (mass_len ? mass_len : 1)));

    for (uint32_t step = 0; step < n_steps; ++step) {
        for (uint32_t j = 0; j < mass_len; ++j) {
            sx[j] = pos[2 * j];
            sy[j] = pos[2 * j + 1];
            sgm[j] = kG * mass[j];
        }
        for (uint32_t i = 0; i < total_len; ++i) {
            float ax = 0.0f, ay = 0.0f;
            for (uint32_t j = 0; j < mass_len; ++j) {
                float dx = sx[j] - pos[2 * i];
                float dy = sy[j] - pos[2 * i + 1];
                float d2 = dx * dx + dy * dy;
                float r2 = d2 + radius[i];
                float r1 = std::sqrt(r2);
                float f = sgm[j] / (r1 * r2);
                ax += dx * f;
                ay += dy * f;
            }
            acc[2 * i] = ax;
            acc[2 * i + 1] = ay;
            vel[2 * i] += ax * dt;
            vel[2 * i + 1] += ay * dt;
            pos[2 * i] += vel[2 * i] * dt;
            pos[2 * i + 1] += vel[2 * i + 1] * dt;
        }
    }
    std::free(sx);
    std::free(sy);
    std::free(sgm);
}

}  // extern "C"
