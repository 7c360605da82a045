#!/usr/bin/env bash
# Regenerate tests/data/ref_*.hex from the reference's OWN sources, compiled
# in place from /root/reference (nothing vendored). Every golden the parity
# tests consume is reproducible with this script; tests/test_libc_scene.py
# and tests/test_physics_validation.py also re-derive a subset live when gcc
# is available, so a stale golden cannot hide.
#
# Two build flavors:
#   AVX    — the reference's default SIMD path (sim_cpu.c USE_AVX packs);
#            trajectory goldens come from this build.
#   scalar — SIMD_SIZE=1 fallback; the 10k scalar trajectory is committed as
#            the reference-vs-itself fp32 noise calibration (two correct
#            builds of the same code differ only in summation order).
set -euo pipefail
REF=${REF:-/root/reference}
OUT=${OUT:-$(dirname "$0")/../tests/data}
SRC="$(dirname "$0")/ref_scene_dump.c"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

build() { # $1: exe, rest: extra flags
    local exe=$1; shift
    gcc -O2 -DNDEBUG "$@" -I"$REF/include" -I"$REF/src/lib" \
        "$SRC" "$REF/src/lib/galaxy.c" "$REF/src/lib/sim_cpu.c" \
        -lm -o "$exe"
}

build "$TMP/avx" -DUSE_AVX -mavx
build "$TMP/scalar"

# Scenes (bit-exact MakeGalaxies output; build-flavor independent)
"$TMP/avx" 2000 2 11037      > "$OUT/ref_scene_n2000_g2_seed11037.hex"
"$TMP/avx" 5000 3 1          > "$OUT/ref_scene_n5000_g3_seed1.hex"
"$TMP/avx" 300 1 3017237295  > "$OUT/ref_scene_n300_g1_seed3017237295.hex"

# Trajectories: the reference's real PackParticles/PackedUpdate substep loop
# (world.c:99-110) on the bench scene (bench.c:42,53: seed 11037, 2 galaxies)
"$TMP/avx" 2000 2 11037 --steps 20    0.01 > "$OUT/ref_traj_n2000_g2_seed11037_s20_dt0.01.hex"
"$TMP/avx" 2000 2 11037 --steps 100   0.01 > "$OUT/ref_traj_n2000_g2_seed11037_s100_dt0.01.hex"
"$TMP/avx" 2000 2 11037 --steps 10000 0.01 > "$OUT/ref_traj_n2000_g2_seed11037_s10000_dt0.01.hex"
"$TMP/scalar" 2000 2 11037 --steps 10000 0.01 > "$OUT/ref_traj_scalar_n2000_g2_seed11037_s10000_dt0.01.hex"

echo "goldens written to $OUT"
