#!/bin/bash
# Watch the wait_tpu_and_bench.sh log for a successful bench and then pack
# the compile-cache entries that bench actually USED into the committed seed
# location, so a clean checkout's first bench pays cache loads, not XLA
# compiles. Runs alongside the probe loop; does not interfere with it.
#
# "Used" is decided per entry from timestamps (the repo filesystem mounts
# relatime, and bench.py's tarfile extraction sets atime == mtime):
#   - mtime newer than the bench session  -> compiled fresh this run: keep
#   - atime > mtime                       -> seeded entry that was read: keep
#   - atime == mtime (old)                -> stale seed entry no current
#                                            program hashes to: drop
# Pruning happens only in the tarball; .jax_cache itself is left intact so a
# follow-up tpu_perf session can still hit entries bench.py doesn't run.
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_wait.log}
for i in $(seq 1 720); do
  if grep -q "bench exit 0" "$LOG" 2>/dev/null; then
    sleep 10  # let the last cache writes land
    python3 - <<'EOF'
import tarfile, time
from pathlib import Path

cache = Path(".jax_cache")
fresh_cutoff = time.time() - 6 * 3600  # this bench session, with margin
keep, drop = [], []
for p in sorted(cache.iterdir()):
    st = p.stat()
    if st.st_mtime >= fresh_cutoff or st.st_atime > st.st_mtime + 1:
        keep.append(p)
    else:
        drop.append(p)
out = Path("scripts/bench_cache.tar.gz")
with tarfile.open(out, "w:gz") as tf:
    for p in keep:
        tf.add(p, arcname=p.name)
mb = out.stat().st_size / 1e6
print(f"packed {out} ({mb:.0f} MB, {len(keep)} entries; "
      f"pruned {len(drop)} stale seed entries)", flush=True)
EOF
    exit $?
  fi
  sleep 60
done
echo "timed out waiting for a successful bench"
exit 1
