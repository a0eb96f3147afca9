#!/bin/bash
# Round-5 TPU work queue (VERDICT r4 #1/#4/#7/#8): re-capture the headline
# at the swept launch geometry, run the full fixture series INCLUDING the
# 20k/40k rows, re-tune the grid cost model on silicon, and land the
# reference-scale (N=50) fit demo with a mid-run checkpoint/resume.
#
# IDEMPOTENT: every step checks its artifact and skips if it already
# landed, so the watcher can re-run the whole queue after a mid-queue
# tunnel drop and only the missing steps execute.
cd /root/repo
mkdir -p /tmp/r5q /tmp/r4q benchmarks

# Single-owner TPU lock.  ATOMIC acquire via mkdir (ADVICE r4: the r4
# check-then-write pid guard was TOCTOU — two near-simultaneous queues
# could both pass).  The pid file at the r4 path is still written because
# bench.py's _queue_busy() reads it; stale locks (dead owner) are reaped.
LOCK=/tmp/r5q/lock
if ! mkdir "$LOCK" 2>/dev/null; then
  owner=$(cat "$LOCK/pid" 2>/dev/null)
  if [ -n "$owner" ] && kill -0 "$owner" 2>/dev/null; then
    echo "another r5 queue (pid $owner) owns the TPU — refusing to start"
    exit 3
  fi
  echo "reaping stale lock (owner ${owner:-unknown} is dead)"
  rm -rf "$LOCK"
  mkdir "$LOCK" || exit 3
fi
echo $$ > "$LOCK/pid"
echo $$ > /tmp/r4q/queue.running     # bench.py's guard reads this path
export BENCH_QUEUE_OWNER=1
trap 'rm -rf "$LOCK" /tmp/r4q/queue.running' EXIT

# a log holds a REAL benchmark row (not a tunnel-down fallback)?
has_row() {
  grep -E '^\{' "$1" 2>/dev/null \
    | grep -v 'LAST-KNOWN-GOOD\|unavailable' | grep -q '"unit"'
}

echo "=== [0/7] megakernel smoke (256^2 spp4) ==="
if has_row /tmp/r5q/smoke_mega.log; then
  echo "smoke already captured — reusing its verdict"
else
  timeout 900 env BENCH_SIZE=256 BENCH_SPP=4 BENCH_WAIT_S=60 python bench.py \
      2>&1 | tee /tmp/r5q/smoke_mega.log
fi
if has_row /tmp/r5q/smoke_mega.log && \
   ! grep -q 'falling back' /tmp/r5q/smoke_mega.log; then
    WAVE=""
    echo "mega smoke OK"
else
    WAVE="step"
    echo "mega smoke FAILED — falling back to wavefront=step for the queue"
fi

echo "=== [1/7] headline bench (spp64, swept blk256/vmem100 defaults) ==="
if has_row benchmarks/headline_spp64_r5.json; then
  echo "headline already captured — skip"
else
  timeout 2400 env BENCH_WAVEFRONT=$WAVE python bench.py \
      2>&1 | tee /tmp/r5q/bench.log
  grep -E '^\{' /tmp/r5q/bench.log 2>/dev/null \
      | grep -v 'LAST-KNOWN-GOOD\|unavailable' | tail -1 \
      > benchmarks/headline_spp64_r5.json || true
fi

echo "=== [2/7] fixture series 512^2 spp16 incl 20k + 40k ==="
if [ "$(grep -cE '^\{"scene"' benchmarks/series_r5_512_spp16.jsonl \
        2>/dev/null)" -ge 8 ] 2>/dev/null; then
  echo "series already captured — skip"
else
  timeout 7200 env BENCH_WAVEFRONT=$WAVE python scripts/bench_series.py \
      --size 512 --spp 16 2>&1 | tee /tmp/r5q/series.log
  grep -E '^\{"scene"' /tmp/r5q/series.log \
      > benchmarks/series_r5_512_spp16.jsonl
fi

echo "=== [3/7] grid fine-side re-tune (5000 / 10k, on silicon) ==="
if [ -s benchmarks/grid_tune_r5.jsonl ]; then
  echo "grid tune already captured — skip"
else
  { timeout 3600 python scripts/tune_grid.py \
        /root/reference/scenes/gaussians/5000_random.txt 4 6 8 10 12 ;
    timeout 3600 python scripts/tune_grid.py \
        /root/reference/scenes/gaussians/10k_random.txt 6 8 10 12 ;
  } 2>&1 | tee /tmp/r5q/grid_tune.log
  grep -E '^\{"scene"' /tmp/r5q/grid_tune.log \
      > benchmarks/grid_tune_r5.jsonl || true
fi

echo "=== [4/7] 256-spp headline ==="
if has_row benchmarks/headline_spp256_r5.json; then
  echo "256-spp headline already captured — skip"
else
  timeout 3600 env BENCH_SPP=256 BENCH_WAVEFRONT=$WAVE python bench.py \
      2>&1 | tee /tmp/r5q/headline256.log
  grep -E '^\{' /tmp/r5q/headline256.log \
      | grep -v 'LAST-KNOWN-GOOD\|unavailable' | tail -1 \
      > benchmarks/headline_spp256_r5.json || true
fi

echo "=== [5/7] reference-scale fit demo (N=50, ckpt/resume mid-run) ==="
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

echo "=== [6/7] mega midrange A/B at spp64 (N=1000 headline row) ==="
if has_row benchmarks/mega_1000g_spp64_r5.json; then
  echo "1000g spp64 already captured — skip"
else
  timeout 2400 env BENCH_SPP=64 BENCH_WAIT_S=60 \
      BENCH_SCENE=/root/reference/scenes/gaussians/1000_random.txt \
      python bench.py 2>&1 | tee /tmp/r5q/mega1000.log
  grep -E '^\{' /tmp/r5q/mega1000.log \
      | grep -v 'LAST-KNOWN-GOOD\|unavailable' | tail -1 \
      > benchmarks/mega_1000g_spp64_r5.json || true
fi

echo "=== [7/8] full-res parity sweep (incl UNIFORM 512^2 — VERDICT #5) ==="
if [ -e /tmp/r5q/done.parity ]; then
  echo "parity sweep already done — skip"
else
  timeout 5400 env PARITY_SPP=256 python scripts/parity_report.py \
      2>&1 | tee /tmp/r5q/parity.log
  [ "${PIPESTATUS[0]}" -eq 0 ] && touch /tmp/r5q/done.parity
fi

echo "=== [8/8] regenerate README bench section from artifacts ==="
python scripts/update_bench_docs.py || true

echo "=== r5 queue pass done at $(date) ==="
ls -la benchmarks/ | sed -n '1,40p'
