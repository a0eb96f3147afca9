#!/bin/bash
# Round-5 TPU queue, pass 3: the DECISIVE tau_bf16 e2e decision pair.
#
# Pass 2's three captures disagree: the kernel microbench says bf16 is
# 0.90x (slower), the golden A/B wall-clocks say 1.8x (but its timing
# includes compile), and the spp16 bf16 e2e (14.205) has no same-spp f32
# comparator.  bench.py warms up with the IDENTICAL config, so its timed
# run is compile-free — two back-to-back pairs (spp64 + spp16, f32 vs
# bf16) under one lock are the trustworthy decision numbers.
#
# IDEMPOTENT: each step checks its artifact and skips.
cd /root/repo
mkdir -p /tmp/r5q /tmp/r4q benchmarks

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
echo $$ > /tmp/r4q/queue.running     # bench.py's guard reads this path
export BENCH_QUEUE_OWNER=1
trap 'rm -rf "$LOCK" /tmp/r4q/queue.running' EXIT

has_row() {
  grep -E '^\{' "$1" 2>/dev/null \
    | grep -v 'LAST-KNOWN-GOOD\|unavailable' | grep -q '}'
}

run_bench() {  # $1 artifact  $2 spp  $3 tau_bf16  $4 log
  if has_row "$1"; then echo "already captured — skip"; return; fi
  timeout 2400 env BENCH_SPP="$2" BENCH_TAU_BF16="$3" python bench.py \
      2>&1 | tee "$4"
  grep -E '^\{' "$4" | grep -v 'LAST-KNOWN-GOOD\|unavailable' | tail -1 \
      > "$1" || true
}

echo "=== [0/3] f32 spp64 headline (re-pin under this lock) ==="
run_bench benchmarks/tau_pair_spp64_f32_r5.json 64 0 /tmp/r5q/p64f32.log
echo "=== [1/3] bf16 spp64 headline ==="
run_bench benchmarks/tau_pair_spp64_bf16_r5.json 64 1 /tmp/r5q/p64bf16.log
echo "=== [2/3] f32 spp16 comparator ==="
run_bench benchmarks/tau_pair_spp16_f32_r5.json 16 0 /tmp/r5q/p16f32.log
echo "=== [3/3] bf16 spp16 (re-run under this lock) ==="
run_bench benchmarks/tau_pair_spp16_bf16_r5.json 16 1 /tmp/r5q/p16bf16.log

echo "=== r5 queue pass 3 done at $(date) ==="
for f in benchmarks/tau_pair_*.json; do echo "$f: $(cat "$f")"; done
