#!/bin/bash
# Round-4 north-star wall-clock batch (exclusive — ONE host core):
# the extract+match+BA streaming loops on the real chip (VERDICT r3
# task 2) plus the KITTI-00-length endurance run (task 7).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== mono 300-frame longrun" >&2
timeout 3000 python scripts/tpu_longrun.py 2>>/tmp/northstar_r4.err
echo "=== stereo+rgbd longrun (2k kpts, chunks 1/8/32)" >&2
timeout 7200 python scripts/tpu_stereo_longrun.py --frames 300 \
    2>>/tmp/northstar_r4.err
echo "=== endurance 4541 frames (stereo, chunk 8)" >&2
timeout 7200 python scripts/endurance.py --frames 4541 --chunk 8 \
    2>>/tmp/northstar_r4.err
