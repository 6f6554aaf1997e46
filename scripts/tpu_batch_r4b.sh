#!/bin/bash
# Round-4 headline sweep B (exclusive batch): does a larger Mosaic/XLA
# scoped-VMEM budget let the server-side compiler tile the dense stages
# (pyramid/score fusions) better?  Cheap to test now that the tunnel
# accepts LIBTPU_INIT_ARGS passthrough (found during the hbm bisect).
set -u
cd /root/repo
for kib in 32768 65536; do
  echo "=== bench scoped_vmem=$kib" >&2
  LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=$kib" \
    timeout 900 python bench.py 2>>/tmp/bench_r4b.err \
      | sed "s|^|vmem$kib :: |"
done
