#!/bin/bash
# Build + run the reference's CPU backend under its own bench protocol
# (see scripts/ref_cpu_bench.c). Compiles the reference sources from
# /root/reference read-only into /tmp; nothing is copied into the repo.
set -euo pipefail
REF=/root/reference
OUT=/tmp/ref_cpu_bench
mkdir -p "$OUT"
gcc -O2 -DUSE_AVX -mavx -fopenmp -DNDEBUG \
    -I"$REF/include" -I"$REF/src/lib" \
    scripts/ref_cpu_bench.c "$REF/src/lib/sim_cpu.c" "$REF/src/lib/galaxy.c" \
    -lm -o "$OUT/ref_cpu_bench"
exec "$OUT/ref_cpu_bench"
