#!/bin/bash
# Wait for the axon TPU tunnel to recover, then run the round-5 pass-4
# recapture queue (scripts/r5_queue4.sh — idempotent) and re-arm on
# partial success.  Single-owner: atomic `ln -s $$` lock (owner pid in
# the symlink — no empty-pid reap window) so two watchers can never
# interleave on the chip (CLAUDE.md: double queues silently
# under-measure everything).
cd /root/repo
mkdir -p /tmp/r5q
WLOCK=/tmp/r5q/watch4.lock
if ! ln -s "$$" "$WLOCK" 2>/dev/null; then
  owner=$(readlink "$WLOCK" 2>/dev/null || cat "$WLOCK/pid" 2>/dev/null)
  if [ -n "$owner" ] && kill -0 "$owner" 2>/dev/null; then
    echo "another watcher (pid $owner) is live — refusing to start"
    exit 3
  fi
  rm -rf "$WLOCK"
  ln -s "$$" "$WLOCK" || exit 3
  sleep 2
  [ "$(readlink "$WLOCK" 2>/dev/null)" = "$$" ] || exit 3
fi
trap 'rm -rf "$WLOCK"' EXIT

# a log holds a REAL benchmark row (bench.py's LAST-KNOWN-GOOD fallback
# row must NOT count as a capture)
log_row() {
  grep -E '^\{' "$1" 2>/dev/null \
    | grep -v 'LAST-KNOWN-GOOD\|unavailable' | grep -q '"unit"'
}
complete() {
  [ "$(grep -cE '^\{"scene"' benchmarks/series_r5_pool_512_spp16.jsonl \
       2>/dev/null)" -ge 8 ] || return 1
  log_row /tmp/r5q/q4_h64.log || return 1
  log_row /tmp/r5q/q4_h256.log || return 1
  log_row /tmp/r5q/q4_h64b.log || return 1
  return 0
}

attempt=0
while true; do
  n=0
  # probe in a bounded subprocess (a hung tunnel can't wedge the watcher);
  # NEVER probe while a queue could be up — the queue lock check is first
  while true; do
    if [ -e /tmp/r5q/lock ] || [ -L /tmp/r5q/lock ]; then
      echo "queue lock present — not probing" >> /tmp/r5q/watch4.log
      sleep 300; continue
    fi
    n=$((n+1))
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones(3).sum(); x.block_until_ready(); print('alive', float(x))
" >> /tmp/r5q/watch4.log 2>&1; then
      echo "probe $n ok at $(date)" >> /tmp/r5q/watch4.log
      break
    fi
    echo "probe $n dead at $(date)" >> /tmp/r5q/watch4.log
    sleep 240
  done
  attempt=$((attempt+1))
  echo "queue attempt $attempt starting at $(date)" >> /tmp/r5q/watch4.log
  bash scripts/r5_queue4.sh > /tmp/r5q/q4_attempt$attempt.log 2>&1
  if complete; then
    python scripts/update_bench_docs.py >> /tmp/r5q/watch4.log 2>&1
    echo "r5 pass-4 capture COMPLETE at $(date)" >> /tmp/r5q/watch4.log
    break
  fi
  if [ $attempt -ge 6 ]; then
    echo "giving up after $attempt attempts at $(date)" >> /tmp/r5q/watch4.log
    break
  fi
  echo "attempt $attempt incomplete — re-arming" >> /tmp/r5q/watch4.log
  sleep 600
done
