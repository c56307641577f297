#!/bin/bash
# Paired quality matrix on the SPECULAR synthetic scene family
# (VERDICT r3 next #4): strong view-dependence — the axis the textured
# and cluttered families don't stress. Runs parity / NI=24 slim quality
# pick / NI=16 slim+anneal primary, seeds 0+1, full 30-epoch schedule
# (22320 steps at 504x378 x2 SS), serially (1-core host).
# Usage: bash tools/run_specular_matrix.sh [outdir] [tex]
#   pass "tex" as the 2nd arg to ALSO apply the high-frequency texture
#   (the specular-only blobs converge to ~51-53 dB, partially
#   ceiling-limited; texture+specular stresses both axes at once and
#   discriminates configs like the textured family does)
set -e
OUT=${1:-/tmp/spec_matrix}
TEX=""
[ "${2:-}" = "tex" ] && TEX="--texture"
mkdir -p "$OUT"
STEPS=22320
for SEED in 0 1; do
  echo "=== parity seed $SEED ==="
  python tools/flagship_run.py "$OUT" --steps $STEPS --specular $TEX \
    --seed $SEED 2>&1 | tail -3
  echo "=== quality NI=24 slim seed $SEED ==="
  python tools/flagship_run.py "$OUT" --steps $STEPS --specular $TEX \
    --seed $SEED --fast_sampling --N_importance 24 --n_prop 48 \
    --n_prop_levels 2 --n_prop2 24 --prop_W 48 --prop_D 3 \
    2>&1 | tail -3
  echo "=== primary NI=16 slim+anneal seed $SEED ==="
  python tools/flagship_run.py "$OUT" --steps $STEPS --specular $TEX \
    --seed $SEED --fast_sampling --N_importance 16 --n_prop 48 \
    --n_prop_levels 2 --n_prop2 24 --prop_W 48 --prop_D 3 \
    --prop_pad_anneal 11160 --prop_pad_final 0.0 2>&1 | tail -3
done
