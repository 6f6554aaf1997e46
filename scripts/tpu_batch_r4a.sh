#!/bin/bash
# Round-4 headline sweep A (exclusive batch — ONE host core, nothing else
# may run): desc-slot trim at the 5120 optimum, batch 12 point, and the
# fused-octave hbm64 kernel measured at the pipeline level.
set -u
cd /root/repo
for args in \
    "--desc-slot-factor 1.10" \
    "--desc-slot-factor 1.175" \
    "--batch 12" \
    "--fused-pyramid pallas_hbm --fused-tile-rows 64"; do
  echo "=== bench $args" >&2
  timeout 900 python bench.py $args 2>>/tmp/bench_r4a.err \
      | sed "s|^|$args :: |"
done
