#!/bin/bash
# Round-3 TPU measurement batch. Run ALONE: one CPU core — any concurrent
# python inflates dispatch gaps and pollutes queue-and-fetch timings.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 4000 python scripts/perf_sweep2.py > /tmp/sweep2.out 2> /tmp/sweep2.err
timeout 4000 python scripts/stage_times.py --batch 16 > /tmp/stages_r3.out 2> /tmp/stages_r3.err
timeout 2000 python bench.py > /tmp/bench_r3_final.out 2> /tmp/bench_r3_final.err
echo BATCH_DONE
