// Native spiral-galaxy scene generator.
//
// Independent C++ implementation of the procedural-galaxy algorithm
// (reference: src/lib/galaxy.c:31-221, constants include/galaxy.h:10-61),
// exposed via a C ABI for ctypes. Deterministic given a seed (std::mt19937,
// so scenes are reproducible across platforms but intentionally NOT
// bit-matched to either libc rand() or numpy's Generator — each generator
// family defines its own golden scenes).
//
// Used as (a) a second, host-native scene source and (b) a structural
// cross-check oracle for the Python generators in the test suite.

#include <cmath>
#include <cstdint>
#include <random>
#include <vector>

namespace {

constexpr float kPi = 3.1415927f;
constexpr float kG = 10.0f;
constexpr int kMinSpirals = 2;
constexpr int kMaxSpirals = 4;
constexpr float kGcMinR = 200.0f;
constexpr float kGcMaxR = 600.0f;
constexpr float kGcDensity = 30.0f;
constexpr float kNpMinR = 1.5f;
constexpr float kNpMaxR = 9.5f;
constexpr float kNpDensity = 10.0f;
constexpr uint32_t kMinPerGalaxy = 100;
constexpr float kMinDistCrF = 5.0f;
constexpr float kMaxDistCrF = 10.0f;
constexpr float kMaxDistPcF = 300.0f;
constexpr float kMinSep = 1.4f;
constexpr float kMaxSep = 2.0f;
constexpr float kTracerRadius = 0.5f;

float r_to_m(float r, float density) {
    return (4.0f * kPi * density / 3.0f) * r * r * r;
}

struct Rng {
    std::mt19937 gen;
    explicit Rng(uint64_t seed) : gen(seed) {}
    float uniform(float lo, float hi) {
        return std::uniform_real_distribution<float>(lo, hi)(gen);
    }
    uint32_t randint(uint32_t lo, uint32_t hi) {  // [lo, hi)
        return std::uniform_int_distribution<uint32_t>(lo, hi - 1)(gen);
    }
    float sign() { return (gen() & 1u) ? 1.0f : -1.0f; }
};

}  // namespace

extern "C" {

// Fill caller-allocated SoA arrays (pos[2n] interleaved, vel[2n], mass[n],
// radius[n]) with a galaxy_count-galaxy scene. Returns 0 on success.
int nb_make_galaxies(uint64_t seed, uint32_t particle_count,
                     uint32_t galaxy_count, float* pos, float* vel,
                     float* mass, float* radius) {
    if (galaxy_count < 1) {
        return 2;
    }
    if (particle_count < galaxy_count * kMinPerGalaxy) {
        return 1;
    }
    Rng rng(seed);
    const uint32_t g = galaxy_count;

    // particle budget (sequential carving, galaxy.c:42-65)
    std::vector<uint32_t> sizes(g), offsets(g);
    uint32_t spare = particle_count - g * kMinPerGalaxy;
    for (uint32_t i = 0; i < g; ++i) {
        uint32_t extra = (i == g - 1) ? spare : rng.randint(0, spare + 1);
        if (i != g - 1) spare -= extra;
        sizes[i] = kMinPerGalaxy + extra;
        offsets[i] = (i == 0) ? 0 : offsets[i - 1] + sizes[i - 1];
    }

    // cores (galaxy.c:68-79)
    std::vector<float> core_r(g), min_d(g), max_d(g), core_m(g);
    std::vector<float> cx(g, 0.0f), cy(g, 0.0f), cvx(g, 0.0f), cvy(g, 0.0f);
    for (uint32_t i = 0; i < g; ++i) {
        core_r[i] = rng.uniform(kGcMinR, kGcMaxR);
        min_d[i] = core_r[i] * kMinDistCrF;
        max_d[i] = core_r[i] * kMaxDistCrF +
                   std::sqrt(float(sizes[i])) * kMaxDistPcF;
        core_m[i] = r_to_m(core_r[i], kGcDensity);
    }

    // rejection-sampled placement (galaxy.c:82-118)
    for (uint32_t i = 1; i < g; ++i) {
        bool collision = true;
        while (collision) {
            uint32_t parent = rng.randint(0, i);
            float lo = kMinSep * (max_d[i] + max_d[parent]);
            float hi = kMaxSep * (max_d[i] + max_d[parent]);
            float dist = std::sqrt(rng.uniform(lo * lo, hi * hi));
            float ang = rng.uniform(0.0f, 2.0f * kPi);
            float px = cx[parent] + dist * std::cos(ang);
            float py = cy[parent] + dist * std::sin(ang);
            collision = false;
            for (uint32_t j = 0; j < i; ++j) {
                if (j == parent) continue;
                float sep = kMinSep * (max_d[i] + max_d[j]);
                float dx = px - cx[j], dy = py - cy[j];
                if (dx * dx + dy * dy < sep * sep) { collision = true; break; }
            }
            if (!collision) { cx[i] = px; cy[i] = py; }
        }
    }

    // tangential velocity kicks (galaxy.c:121-142)
    for (uint32_t i = 1; i < g; ++i) {
        for (uint32_t j = 0; j < i; ++j) {
            float abx = cx[j] - cx[i], aby = cy[j] - cy[i];
            float dist = std::hypot(abx, aby);
            float ux = abx / dist, uy = aby / dist;
            float sa = 0.3f * std::sqrt(kG * core_m[j] / dist);
            float sb = 0.3f * std::sqrt(kG * core_m[i] / dist);
            cvx[i] += sa * uy;  cvy[i] += -sa * ux;
            cvx[j] += -sb * uy; cvy[j] += sb * ux;
        }
    }

    // particles (galaxy.c:146-216)
    for (uint32_t i = 0; i < g; ++i) {
        uint32_t o = offsets[i], sz = sizes[i];
        pos[2 * o] = cx[i];     pos[2 * o + 1] = cy[i];
        vel[2 * o] = cvx[i];    vel[2 * o + 1] = cvy[i];
        mass[o] = core_m[i];    radius[o] = core_r[i];

        float init_off = rng.uniform(0.0f, 2.0f * kPi);
        uint32_t spirals = rng.randint(kMinSpirals, kMaxSpirals + 1);
        float sp_ang = 2.0f * kPi / float(spirals);
        float t1 = 2.0f * kPi;
        float b = max_d[i] / t1;
        float t0 = min_d[i] / b;
        float dist_range = max_d[i] - min_d[i];

        for (uint32_t k = o + 1; k < o + sz; ++k) {
            float t = rng.uniform(t0, t1);
            float r = b * t;
            float t_off = rng.uniform(0.0f, 0.6f * std::sqrt(sp_ang));
            float r_off = rng.uniform(
                0.0f, 0.6f * std::sqrt(std::fmax(std::fmin(b, r - min_d[i]), 0.0f)));
            float dist = r + rng.sign() * r_off * r_off;
            float ang = t + rng.sign() * t_off * t_off;
            float arm = init_off + float(rng.randint(0, spirals)) * sp_ang;
            float dx = dist * std::cos(ang + arm);
            float dy = dist * std::sin(ang + arm);
            pos[2 * k] = cx[i] + dx;
            pos[2 * k + 1] = cy[i] + dy;

            if (rng.uniform(0.0f, 1.0f) < (dist - min_d[i]) / dist_range) {
                radius[k] = kTracerRadius;
                mass[k] = 0.0f;
            } else {
                radius[k] = rng.uniform(kNpMinR, kNpMaxR);
                mass[k] = r_to_m(radius[k], kNpDensity);
            }
            float speed = std::sqrt(kG * core_m[i] / dist);
            vel[2 * k] = cvx[i] + speed * (dy / dist);
            vel[2 * k + 1] = cvy[i] + speed * (-dx / dist);
        }
    }
    return 0;
}

}  // extern "C"
