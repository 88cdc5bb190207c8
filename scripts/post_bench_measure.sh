#!/bin/bash
# After the automated bench rebuild succeeds (wait_tpu_and_bench.sh logs
# "bench exit 0"), run the on-chip measurements that were queued behind the
# pool outage:
#   - eulerab: flash-vs-XLA spatial-attention A/B re-run (the earlier result
#     was invalidated by the engine's inner force_flash(False) overwriting
#     the harness's force_flash(True) during the scan trace — since fixed)
#   - segments: S=2 lockstep segment-parallel aggregate fps
# The tunnel serves one session at a time: wait for the bench process to be
# gone plus a cooldown before claiming the chip.
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_wait.log}
for i in $(seq 1 720); do
  if grep -q "bench exit 0" "$LOG" 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "bench exit 0" "$LOG" 2>/dev/null; then
  echo "timed out waiting for bench"
  exit 1
fi
echo "[$(date -u +%H:%M:%S)] bench done; cooldown 240s before measurements"
sleep 240
echo "[$(date -u +%H:%M:%S)] running tpu_perf eulerab segments"
timeout 5400 python -u scripts/tpu_perf.py cache eulerab segments
rc=$?
echo "[$(date -u +%H:%M:%S)] done rc=$rc"
exit $rc
