#!/bin/bash
# Round-3 TPU endgame batch — run EXCLUSIVELY (one CPU core: any other
# python job inflates queue-and-fetch frame times ~1.5 ms, CLAUDE.md).
#
#   bash scripts/tpu_endgame_r3.sh > /tmp/endgame_r3.log 2>&1 &
#
# Phase 1 measures the dense-stage micro-variants standalone
# (scripts/pyr_probe.py: window-stacking conv, direct-from-base levels,
# bf16 score).  Phase 2 runs the full bench with each winner flipped on
# via the now-integrated config flags, so adoption is evidence-based.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

python scripts/pyr_probe.py --iters 30

# full-pipeline bench: baseline then each opt-in variant
python bench.py --iters 40
python bench.py --iters 40 --score-dtype bf16
python bench.py --iters 40 --conv-backend mxu2
python bench.py --iters 40 --pyramid-impl direct
python bench.py --iters 40 --score-dtype bf16 --conv-backend mxu2 \
    --pyramid-impl direct
# fused octave kernel, manual-HBM-output form (probe variants F/G decide
# the tile; 96 is the VMEM-safe default)
python bench.py --iters 40 --fused-pyramid pallas_hbm --fused-tile-rows 96

# window-BA anchoring ms delta (VERDICT r2 task 6): newest vs union
python scripts/ba_anchor_probe.py --iters 30
