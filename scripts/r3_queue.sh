#!/bin/bash
# Round-3 TPU work queue: fire once when the tunnel is healthy.
# Sequential (only one process may own the TPU); each step logs to /tmp/r3q.
cd /root/repo
mkdir -p /tmp/r3q

echo "=== [0/6] megakernel smoke (256^2 spp4) ==="
timeout 900 env BENCH_SIZE=256 BENCH_SPP=4 python bench.py \
    2>&1 | tee /tmp/r3q/smoke_mega.log
if grep -q '"unit"' /tmp/r3q/smoke_mega.log; then
    WAVE=""
    echo "mega smoke OK"
else
    WAVE="step"
    echo "mega smoke FAILED — falling back to wavefront=step for the queue"
fi

echo "=== [1/6] headline bench ==="
timeout 1800 env BENCH_WAVEFRONT=$WAVE python bench.py \
    2>&1 | tee /tmp/r3q/bench.log

echo "=== [2/6] fixture series 512^2 spp16 ==="
timeout 5400 env BENCH_WAVEFRONT=$WAVE python scripts/bench_series.py \
    --size 512 --spp 16 2>&1 | tee /tmp/r3q/series.log

echo "=== [2b/6] grid-engine per-stage profile ==="
timeout 3600 env PROF_OUT=benchmarks/breakdown_r3_grid.json \
    python scripts/profile_stages.py grid 2>&1 | tee /tmp/r3q/prof_grid.log

echo "=== [3/6] full-res parity sweep (incl. UNIFORM 512^2) ==="
timeout 3600 env PARITY_SPP=256 python scripts/parity_report.py \
    2>&1 | tee /tmp/r3q/parity.log

echo "=== [4/6] reference-scale fit artifact A (2g_altered, 1000 iters) ==="
timeout 3600 python scripts/fit_demo.py --size 512 --iters 1000 --spp 64 \
    --eval-spp 1024 --out /tmp/fit_demo_r3 2>&1 | tee /tmp/r3q/fitA.log

echo "=== [5/6] fit artifact B (250_random 512^2, candidate_k) ==="
timeout 3600 python scripts/fit_demo.py \
    --scene /root/reference/scenes/gaussians/250_random.txt \
    --size 512 --iters 1000 --candidate-k 32 --batch 8192 \
    --eval-spp 512 --out /tmp/fit_demo_250 2>&1 | tee /tmp/r3q/fitB.log

echo "=== queue done ==="
