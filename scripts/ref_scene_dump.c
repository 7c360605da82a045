/* Dump the reference's MakeGalaxies output bit-exactly (hex floats), or
 * step that scene with the reference's own CPU simulator and dump the
 * result.
 *
 * Built against the reference sources compiled FROM /root/reference in
 * place (nothing copied into this repo), like scripts/ref_cpu_bench.sh:
 *
 *   gcc -O2 -DUSE_AVX -mavx -DNDEBUG -I$REF/include -I$REF/src/lib \
 *       scripts/ref_scene_dump.c $REF/src/lib/galaxy.c \
 *       $REF/src/lib/sim_cpu.c -lm -o /tmp/ref_scene_dump
 *
 * Usage:
 *   ref_scene_dump N GALAXIES SEED              # hex particles, one/line
 *   ref_scene_dump N _ SEED --rand              # raw rand() stream instead
 *   ref_scene_dump N GALAXIES SEED --steps K DT # state after K substeps of
 *                                               # the reference CPU backend
 *                                               # (world.c:99-110 loop), in
 *                                               # generation order
 *
 * tests/test_libc_scene.py compares the scene against
 * nbody_tpu.models.galaxy_ref.make_galaxies_libc bit for bit, and the
 * stepped state against the framework's precise backend to fp32 tolerance.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "galaxy.h"
#include "sim_cpu.h"

/* Massive-first partition with an index map so output can be restored to
 * generation order (same observable layout as the reference's two-pointer
 * swap, world.c:33-46, applied to indices). */
static uint32_t partition_indices(const Particle *ps, uint32_t n,
                                  uint32_t *perm) {
    for (uint32_t i = 0; i < n; i++)
        perm[i] = i;
    uint32_t lo = 0, hi = n;
    while (1) {
        while (lo < hi && ps[perm[lo]].mass > 0) lo++;
        while (lo < hi && ps[perm[hi - 1]].mass <= 0) hi--;
        if (lo >= hi) break;
        uint32_t tmp = perm[lo];
        perm[lo] = perm[hi - 1];
        perm[hi - 1] = tmp;
    }
    return lo;
}

static void print_particle(const Particle *p) {
    printf("%a %a %a %a %a %a\n",
           (double)p->pos.x, (double)p->pos.y,
           (double)p->vel.x, (double)p->vel.y,
           (double)p->mass, (double)p->radius);
}

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: %s N GALAXIES SEED [--rand | --steps K DT]\n",
                argv[0]);
        return 2;
    }
    unsigned long n = strtoul(argv[1], NULL, 10);
    unsigned long g = strtoul(argv[2], NULL, 10);
    unsigned long seed = strtoul(argv[3], NULL, 10);

    srand((unsigned int)seed);

    if (argc > 4 && strcmp(argv[4], "--rand") == 0) {
        for (unsigned long i = 0; i < n; i++)
            printf("%d\n", rand());
        return 0;
    }

    Particle *p = MakeGalaxies((uint32_t)n, (uint32_t)g);

    if (argc > 6 && strcmp(argv[4], "--steps") == 0) {
        unsigned long steps = strtoul(argv[5], NULL, 10);
        float dt = strtof(argv[6], NULL);

        uint32_t *perm = malloc(n * sizeof(uint32_t));
        Particle *arr = malloc(n * sizeof(Particle));
        uint32_t mass_len = partition_indices(p, (uint32_t)n, perm);
        for (uint32_t i = 0; i < n; i++)
            arr[i] = p[perm[i]];

        ParticlePack *pack;
        uint32_t pack_len;
        AllocPackArray(&pack, &pack_len, mass_len);

        /* The reference's UpdateWorld_CPU substep loop (world.c:99-110):
         * re-pack massive particles, then PackedUpdate every particle. */
        for (unsigned long it = 0; it < steps; it++) {
            PackParticles(mass_len, arr, pack);
            for (uint32_t i = 0; i < n; i++)
                PackedUpdate(&arr[i], dt, pack_len, pack);
        }

        for (uint32_t i = 0; i < n; i++)
            p[perm[i]] = arr[i];  /* back to generation order */
        FreePackArray(pack);
        free(arr);
        free(perm);
    }

    for (unsigned long i = 0; i < n; i++)
        print_particle(&p[i]);
    free(p);
    return 0;
}
