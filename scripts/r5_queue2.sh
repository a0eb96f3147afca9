#!/bin/bash
# Round-5 TPU queue, pass 2 (VERDICT r4 #6/#7): the bf16 tau-sweep A/B
# (kernel ns/ray + golden PSNR + e2e Mrays/s) and the N=50 fit demo
# re-run after the spp-scan memory fix (pass 1's run OOM'd HBM).
#
# WAITS for the pass-1 lock to free instead of refusing, then holds the
# same lock.  IDEMPOTENT: each step checks its artifact and skips.
cd /root/repo
mkdir -p /tmp/r5q /tmp/r4q benchmarks

LOCK=/tmp/r5q/lock
until mkdir "$LOCK" 2>/dev/null; do
  owner=$(cat "$LOCK/pid" 2>/dev/null)
  if [ -n "$owner" ] && kill -0 "$owner" 2>/dev/null; then
    echo "$(date +%T) waiting for queue pass 1 (pid $owner)..."
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

echo "=== [0/3] bf16 tau sweep kernel A/B ==="
if has_row benchmarks/tau_bf16_r5.json; then
  echo "already captured — skip"
else
  timeout 1800 python scripts/ab_tau_bf16.py 2>&1 | tee /tmp/r5q/ab_tau.log
  grep -E '^\{"ns_per_ray"' /tmp/r5q/ab_tau.log | tail -1 \
      > benchmarks/tau_bf16_r5.json || true
fi

echo "=== [1/3] bf16 golden-quality A/B (250_rand_ms, 512^2 spp256) ==="
if has_row benchmarks/tau_bf16_golden_r5.json; then
  echo "already captured — skip"
else
  timeout 3600 python scripts/golden_bf16.py 2>&1 \
      | tee /tmp/r5q/golden_bf16.log
  grep -E '^\{"psnr' /tmp/r5q/golden_bf16.log | tail -1 \
      > benchmarks/tau_bf16_golden_r5.json || true
fi

echo "=== [2/3] bf16 e2e headline A/B (spp16) ==="
if has_row benchmarks/tau_bf16_e2e_r5.json; then
  echo "already captured — skip"
else
  timeout 2400 env BENCH_SPP=16 BENCH_TAU_BF16=1 python bench.py \
      2>&1 | tee /tmp/r5q/bench_bf16.log
  grep -E '^\{' /tmp/r5q/bench_bf16.log \
      | grep -v 'LAST-KNOWN-GOOD\|unavailable' | tail -1 \
      > benchmarks/tau_bf16_e2e_r5.json || true
fi

echo "=== [3/3] reference-scale fit demo (N=50, post memory fix) ==="
if [ -e /tmp/r5q/done.fit50 ]; then
  echo "fit50 already done — skip"
else
  timeout 5400 python scripts/fit_demo.py \
      --scene /root/reference/scenes/gaussians/50_random.txt \
      --size 256 --iters 400 --spp 16 --eval-spp 256 --candidate-k 16 \
      --interrupt-at 200 --out /tmp/fit_demo_r5 \
      2>&1 | tee /tmp/r5q/fit50.log
  [ "${PIPESTATUS[0]}" -eq 0 ] && touch /tmp/r5q/done.fit50
fi

echo "=== r5 queue pass 2 done at $(date) ==="
ls -la benchmarks/tau_bf16_* 2>/dev/null
tail -3 /tmp/r5q/fit50.log 2>/dev/null
