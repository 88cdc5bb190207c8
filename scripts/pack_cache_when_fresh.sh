#!/bin/bash
# Watch the wait_tpu_and_bench.sh log for a successful bench (which rebuilds
# .jax_cache from scratch through the remote-compile tunnel) and then pack
# the fresh cache into the committed seed location so a clean checkout's
# first bench pays cache loads, not XLA compiles. Runs alongside the probe
# loop; does not interfere with it.
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_wait.log}
for i in $(seq 1 720); do
  if grep -q "bench exit 0" "$LOG" 2>/dev/null; then
    sleep 10  # let the last cache writes land
    tar -C .jax_cache -czf scripts/bench_cache.tar.gz .
    echo "[$(date -u +%H:%M:%S)] packed scripts/bench_cache.tar.gz " \
         "($(du -h scripts/bench_cache.tar.gz | cut -f1), " \
         "$(ls .jax_cache | wc -l) entries)"
    exit 0
  fi
  sleep 60
done
echo "timed out waiting for a successful bench"
exit 1
