#!/bin/bash
# Probe the axon TPU pool until a chip claim succeeds, then run bench.py to
# rebuild the compile cache. Each probe is bounded; the pool's claim timeout
# is ~25 min so a 15-min probe bound distinguishes "granted quickly" from
# "pool empty". Logs to stdout (caller redirects).
set -u
cd /root/repo
for i in $(seq 1 40); do
  echo "[$(date -u +%H:%M:%S)] probe $i"
  if timeout 900 python -c "import jax; d = jax.devices(); print('CLAIMED', d)"; then
    echo "[$(date -u +%H:%M:%S)] claim OK; cooldown 150s before bench"
    sleep 150
    echo "[$(date -u +%H:%M:%S)] starting bench"
    python -u bench.py
    rc=$?
    echo "[$(date -u +%H:%M:%S)] bench exit $rc"
    if [ $rc -eq 0 ]; then exit 0; fi
  else
    echo "[$(date -u +%H:%M:%S)] probe failed/timed out; sleeping 180s"
    sleep 180
  fi
done
echo "giving up"
exit 1
