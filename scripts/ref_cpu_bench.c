/* Measurement harness: runs the REFERENCE's own CPU backend under its own
 * bench protocol (/root/reference/src/bench.c:22-35 — 10 warmup + 100 timed
 * substeps, dt=1.0, seed 11037, N ladder) by linking the reference sources
 * directly (sim_cpu.c + galaxy.c, compiled with -DUSE_AVX -mavx -fopenmp).
 *
 * The reference's CreateWorld always builds the Vulkan pipeline
 * (world.c:52), so it cannot run here; this driver reproduces only the
 * UpdateWorld_CPU composition (world.c:99-110: per substep PackParticles
 * then an OMP loop of PackedUpdate over all particles) and the
 * massive-first partition semantics (world.c:33-46) needed to call it.
 * No reference code is copied into the framework — this file exists solely
 * to produce a measured same-machine baseline for docs/BENCHMARKS.md.
 *
 * Build & run (from /root/repo):
 *   bash scripts/ref_cpu_bench.sh
 */
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

#include <nbody.h>
#include <galaxy.h>
#include "sim_cpu.h"

static int64_t us_now(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (int64_t)ts.tv_sec * 1000000 + ts.tv_nsec / 1000;
}

/* Partition: massive particles first; returns mass_len. Same observable
 * result as the reference's two-pointer swap (world.c:33-46). */
static uint32_t partition_massive_first(Particle *arr, uint32_t n) {
    uint32_t lo = 0, hi = n;
    while (1) {
        while (lo < hi && arr[lo].mass > 0) lo++;
        while (lo < hi && arr[hi - 1].mass <= 0) hi--;
        if (lo >= hi) break;
        Particle tmp = arr[lo];
        arr[lo] = arr[hi - 1];
        arr[hi - 1] = tmp;
    }
    return lo;
}

/* UpdateWorld_CPU composition, minus the World wrapper. */
static void cpu_update(Particle *arr, uint32_t total_len, uint32_t mass_len,
                       ParticlePack *pack, uint32_t pack_len,
                       float dt, uint32_t n) {
    for (uint32_t it = 0; it < n; it++) {
        PackParticles(mass_len, arr, pack);
        #pragma omp parallel for schedule(static, 20)
        for (uint32_t i = 0; i < total_len; i++)
            PackedUpdate(&arr[i], dt, pack_len, pack);
    }
}

#define UPDATE_STEP 1.f
#define WARMUP_ITER 10
#define BENCH_ITER  100

static const int SIZES[] = {250, 500, 800, 1200, 2000, 4000,
                            10000, 20000, 50000, 100000};
static const int SIZES_LEN = (int)(sizeof(SIZES) / sizeof(SIZES[0]));

int main(void) {
    srand(11037);
    printf("%7s %9s %12s %14s\n", "N", "mass_len", "us/update", "pairs/s");
    for (int s = 0; s < SIZES_LEN; s++) {
        uint32_t n = (uint32_t)SIZES[s];
        Particle *arr = MakeGalaxies(n, 2);
        uint32_t mass_len = partition_massive_first(arr, n);

        ParticlePack *pack;
        uint32_t pack_len;
        AllocPackArray(&pack, &pack_len, mass_len);

        cpu_update(arr, n, mass_len, pack, pack_len, UPDATE_STEP, WARMUP_ITER);
        int64_t t0 = us_now();
        cpu_update(arr, n, mass_len, pack, pack_len, UPDATE_STEP, BENCH_ITER);
        int64_t us = (us_now() - t0) / BENCH_ITER;

        double pairs = (double)n * (double)mass_len / (us * 1e-6);
        printf("%7u %9u %12ld %14.3e\n", n, mass_len, (long)us, pairs);

        FreePackArray(pack);
        free(arr);
    }
    return 0;
}
