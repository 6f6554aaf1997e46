#!/bin/bash
# Poll the axon tunnel; when it answers AND the host core is otherwise
# idle (CLAUDE.md: one CPU core — concurrent python inflates frame times
# ~1.5 ms), run the round-3 endgame batch exactly once.
#
#   nohup bash scripts/tpu_wait_and_endgame.sh > /tmp/endgame_wait.log 2>&1 &
#
# The probe itself is the cheap part; the guard against other python jobs
# matters more than probe frequency.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

idle_now() {
    # any python/pytest alive? (counting only — never kill by pattern)
    [ "$(pgrep -c -f 'python|pytest' 2>/dev/null)" -le 0 ]
}

while true; do
    if ! idle_now; then
        sleep 120
        continue
    fi
    # require two consecutive idle reads 30 s apart so a gap between
    # test processes can't start the batch into contention
    sleep 30
    if ! idle_now; then
        continue
    fi
    if timeout 60 python -c "import jax; assert jax.devices()" \
        > /dev/null 2>&1; then
        echo "tunnel alive $(date -u +%H:%M:%S) — starting endgame batch"
        bash scripts/tpu_endgame_r3.sh > /tmp/endgame_r3.log 2>&1
        echo "endgame batch done $(date -u +%H:%M:%S)"
        exit 0
    fi
    echo "tunnel still down $(date -u +%H:%M:%S)"
    sleep 240
done
