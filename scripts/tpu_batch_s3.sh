#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 3000 python scripts/tpu_longrun.py > /tmp/longrun_r3.out 2> /tmp/longrun_r3.err
timeout 4000 python scripts/pyr_probe.py > /tmp/pyr_probe.out 2> /tmp/pyr_probe.err
echo BATCH_DONE
