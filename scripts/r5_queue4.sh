#!/bin/bash
# Round-5 TPU queue, pass 4: recapture the canonical numbers with pooled
# path regeneration as the adopted default (benchmarks/pool_ab_r5.json
# measured 1.06-1.66x; RenderConfig.pool_regen now defaults True).
#
# Steps: mega smoke -> full fixture series incl 20k/40k (FIRST: the
# spp64 headline row embeds the geomean of the newest series artifact)
# -> spp64 headline (canonical: refreshes last_good.json) -> spp256
# headline -> regenerate the README bench blocks.
#
# IDEMPOTENT: every step checks its artifact and skips if it already
# landed, so a watcher can re-run the whole queue after a mid-queue
# tunnel drop and only the missing steps execute.
cd /root/repo
mkdir -p /tmp/r5q /tmp/r4q benchmarks

# Single-owner TPU lock, atomic acquire via mkdir (ADVICE r4: pid-file
# check-then-write was TOCTOU).  bench.py's guard reads the r4 pid path.
LOCK=/tmp/r5q/lock
until mkdir "$LOCK" 2>/dev/null; do
  owner=$(cat "$LOCK/pid" 2>/dev/null)
  if [ -n "$owner" ] && kill -0 "$owner" 2>/dev/null; then
    echo "$(date +%T) waiting for lock (pid $owner)..."
    sleep 60
  else
    echo "reaping stale lock (owner ${owner:-unknown} is dead)"
    rm -rf "$LOCK"
  fi
done
echo $$ > "$LOCK/pid"
echo $$ > /tmp/r4q/queue.running
export BENCH_QUEUE_OWNER=1
trap 'rm -rf "$LOCK" /tmp/r4q/queue.running' EXIT

has_row() {
  grep -E '^\{' "$1" 2>/dev/null \
    | grep -v 'LAST-KNOWN-GOOD\|unavailable' | grep -q '"unit"'
}

echo "=== [0/4] pooled-mega smoke (256^2 spp4) ==="
if has_row /tmp/r5q/q4_smoke.log; then
  echo "smoke already captured — skip"
else
  timeout 900 env BENCH_SIZE=256 BENCH_SPP=4 BENCH_WAIT_S=60 python bench.py \
      2>&1 | tee /tmp/r5q/q4_smoke.log
fi
if ! has_row /tmp/r5q/q4_smoke.log; then
  echo "smoke failed (tunnel still down?) — aborting queue"
  exit 2
fi
if grep -q 'falling back' /tmp/r5q/q4_smoke.log; then
  echo "pooled mega failed on silicon — NOT recapturing; investigate first"
  exit 4
fi

echo "=== [1/4] fixture series 512^2 spp16 incl 20k + 40k (pooled) ==="
if [ "$(grep -cE '^\{"scene"' benchmarks/series_r5_pool_512_spp16.jsonl \
        2>/dev/null)" -ge 8 ]; then
  echo "series already captured — skip"
else
  timeout 7200 python scripts/bench_series.py --size 512 --spp 16 \
      2>&1 | tee /tmp/r5q/q4_series.log
  grep -E '^\{"scene"' /tmp/r5q/q4_series.log \
      > benchmarks/series_r5_pool_512_spp16.jsonl
fi

echo "=== [2/4] spp64 headline (canonical — refreshes last_good) ==="
if has_row /tmp/r5q/q4_h64.log; then
  echo "already captured — skip"
else
  timeout 2400 python bench.py 2>&1 | tee /tmp/r5q/q4_h64.log
  grep -E '^\{' /tmp/r5q/q4_h64.log \
      | grep -v 'LAST-KNOWN-GOOD\|unavailable' | tail -1 \
      >> benchmarks/headline_spp64_r5.json || true
fi

echo "=== [3/4] spp256 headline ==="
if has_row /tmp/r5q/q4_h256.log; then
  echo "already captured — skip"
else
  timeout 3600 env BENCH_SPP=256 python bench.py 2>&1 \
      | tee /tmp/r5q/q4_h256.log
  grep -E '^\{' /tmp/r5q/q4_h256.log \
      | grep -v 'LAST-KNOWN-GOOD\|unavailable' | tail -1 \
      >> benchmarks/headline_spp256_r5.json || true
fi

echo "=== [4/4] regenerate README bench blocks ==="
python scripts/update_bench_docs.py
echo "r5 queue pass 4 DONE"
