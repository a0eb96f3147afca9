#!/bin/bash
# Round-4 TPU work queue: fire once when the tunnel is healthy.
# Sequential (only one process may own the TPU); each step logs to /tmp/r4q.
# Goal (VERDICT r3 #1/#6): capture the perf story end-to-end on silicon —
# megakernel vs step, headline, 50->20k series, 256-spp headline.
cd /root/repo
mkdir -p /tmp/r4q benchmarks

echo "=== [0/5] megakernel smoke (256^2 spp4) ==="
timeout 900 env BENCH_SIZE=256 BENCH_SPP=4 BENCH_WAIT_S=60 python bench.py \
    2>&1 | tee /tmp/r4q/smoke_mega.log
if grep -q '"unit"' /tmp/r4q/smoke_mega.log && \
   ! grep -q 'falling back' /tmp/r4q/smoke_mega.log && \
   ! grep -q 'unavailable\|LAST-KNOWN-GOOD' /tmp/r4q/smoke_mega.log; then
    WAVE=""
    echo "mega smoke OK"
else
    WAVE="step"
    echo "mega smoke FAILED — falling back to wavefront=step for the queue"
fi

echo "=== [1/5] headline bench (spp64, default wavefront) ==="
timeout 2400 env BENCH_WAVEFRONT=$WAVE python bench.py \
    2>&1 | tee /tmp/r4q/bench.log

echo "=== [2/5] wavefront A/B: mega vs step @1024^2 spp16 ==="
( timeout 1800 env BENCH_SPP=16 BENCH_WAVEFRONT=mega BENCH_WAIT_S=60 \
      python bench.py 2>&1 | tee /tmp/r4q/wf_mega.log
  timeout 1800 env BENCH_SPP=16 BENCH_WAVEFRONT=step BENCH_WAIT_S=60 \
      python bench.py 2>&1 | tee /tmp/r4q/wf_step.log
  python - <<'EOF'
import json
rows = {}
for name in ("mega", "step"):
    try:
        for ln in open(f"/tmp/r4q/wf_{name}.log"):
            ln = ln.strip()
            if ln.startswith("{"):
                row = json.loads(ln)
                # never file tunnel-down fallback rows as A/B results
                if "LAST-KNOWN-GOOD" in row.get("metric", "") or \
                        "unavailable" in row.get("metric", ""):
                    continue
                rows[name] = row
    except FileNotFoundError:
        pass
with open("benchmarks/wavefront_r4.json", "w") as f:
    json.dump(rows, f, indent=1)
print("wavefront A/B:", json.dumps(rows))
EOF
)

echo "=== [3/5] fixture series 512^2 spp16 ==="
timeout 7200 env BENCH_WAVEFRONT=$WAVE python scripts/bench_series.py \
    --size 512 --spp 16 2>&1 | tee /tmp/r4q/series.log
grep -E '^\{"scene"' /tmp/r4q/series.log > benchmarks/series_r4_512_spp16.jsonl

echo "=== [4/5] 256-spp headline ==="
timeout 3600 env BENCH_SPP=256 BENCH_WAVEFRONT=$WAVE python bench.py \
    2>&1 | tee /tmp/r4q/headline256.log
grep -E '^\{' /tmp/r4q/headline256.log \
    | grep -v 'LAST-KNOWN-GOOD\|unavailable' | tail -1 \
    > benchmarks/headline_spp256_r4.json || true

echo "=== [5/6] full-res parity sweep (incl UNIFORM 512^2, new solver) ==="
timeout 5400 env PARITY_SPP=256 python scripts/parity_report.py \
    2>&1 | tee /tmp/r4q/parity.log

echo "=== [6/6] kernel + stage profiles (production defaults) ==="
timeout 1800 env PROF_OUT=benchmarks/breakdown_kernel_r4.json \
    python scripts/profile_kernel.py 2>&1 | tee /tmp/r4q/prof_kernel.log
timeout 3600 env PROF_OUT=benchmarks/breakdown_r4_grid.json \
    python scripts/profile_stages.py grid 2>&1 | tee /tmp/r4q/prof_grid.log

echo "=== [7/8] (optional) reference-scale fit artifact ==="
timeout 3600 python scripts/fit_demo.py --size 512 --iters 600 --spp 64 \
    --eval-spp 512 --out /tmp/fit_demo_r4 2>&1 | tee /tmp/r4q/fitA.log

echo "=== [8/8] (optional) MXU-vs-VPU coefficient A/B ==="
timeout 900 python scripts/ab_mxu_coeffs.py 2>&1 | tee /tmp/r4q/ab_mxu.log
# end-to-end: same production render with RenderConfig.mxu_coeffs on
# (the [2/5] wf A/B logs provide the off-rows at identical settings)
timeout 1800 env BENCH_SPP=16 BENCH_MXU_COEFFS=1 BENCH_WAIT_S=60 \
    python bench.py 2>&1 | tee /tmp/r4q/mxu_e2e.log
python - <<'EOF'
import json
rows = {}
for name, path in (("kernel_ab", "/tmp/r4q/ab_mxu.log"),
                   ("e2e_mxu", "/tmp/r4q/mxu_e2e.log"),
                   ("e2e_fma", "/tmp/r4q/wf_mega.log")):
    try:
        for ln in open(path):
            ln = ln.strip()
            if ln.startswith("{") and "LAST-KNOWN-GOOD" not in ln \
                    and "unavailable" not in ln:
                rows.setdefault(name, []).append(json.loads(ln))
    except FileNotFoundError:
        pass
with open("benchmarks/mxu_coeffs_r4.json", "w") as f:
    json.dump(rows, f, indent=1)
print("mxu A/B rows:", json.dumps(rows))
EOF

echo "=== queue done at $(date) ==="
