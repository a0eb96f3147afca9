"""Post-capture decision report for the round-4 TPU queue.

Reads the artifacts the queue (scripts/r4_queue.sh) files under
benchmarks/ + /tmp/r4q and prints the adoption decisions with their
evidence, executing the rules recorded when the queue was built:

  1. MXU coefficients — flip ``RenderConfig.mxu_coeffs`` default iff the
     e2e mega render with BENCH_MXU_COEFFS=1 beats the FMA-chain run at
     identical settings by >2% AND the kernel-level A/B reports a tiny
     interval/coefficient rel-diff (the quadratics are precision-critical
     geometry, docs/PERF_STUDIES.md #4).
  2. Launch geometry — change ``kernels/pathtrace.auto_block`` /
     ``_VMEM_LIMIT`` iff the sweep's best (block, vmem) beats the current
     default by >5%, confirmed by the blk256 e2e row vs wf_mega.
  3. Re-run bench.py after adopting anything (new headline).

Prints PROPOSED ACTIONS — it never edits code itself.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _mrays(rows):
    """Last bench.py row's Mrays/s value from a mxu_coeffs_r4.json list."""
    if not rows:
        return None
    for row in reversed(rows):
        if isinstance(row, dict) and "value" in row:
            return float(row["value"])
    return None


def _scan_json_objects(path):
    """Every decodable JSON object in a log, including multi-line
    json.dumps(indent=1) blocks (brace-balance scan)."""
    try:
        text = open(path).read()
    except FileNotFoundError:
        return []
    objs, depth, start = [], 0, None
    in_str = esc = False
    for i, ch in enumerate(text):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}" and depth:
            depth -= 1
            if depth == 0:
                try:
                    objs.append(json.loads(text[start:i + 1]))
                except json.JSONDecodeError:
                    pass
    return objs


def main() -> int:
    b = lambda *p: os.path.join(REPO, "benchmarks", *p)
    actions, evidence = [], []

    # ---- 1. MXU coefficients --------------------------------------------
    mxu = _load(b("mxu_coeffs_r4.json")) or {}
    e2e_mxu = _mrays(mxu.get("e2e_mxu"))
    e2e_fma = _mrays(mxu.get("e2e_fma"))
    rel = speedup = None
    for obj in _scan_json_objects("/tmp/r4q/ab_mxu.log"):
        if "max_rel_diff_rows" in obj:
            rel = max(obj["max_rel_diff_rows"])
        if "mxu_speedup" in obj:
            speedup = obj["mxu_speedup"]
    if e2e_mxu and e2e_fma:
        ratio = e2e_mxu / e2e_fma
        ok_num = rel is not None and rel < 1e-4
        evidence.append(
            f"MXU e2e {e2e_mxu:.2f} vs FMA {e2e_fma:.2f} Mrays/s "
            f"(x{ratio:.3f}); kernel speedup x{speedup if speedup else '?'}"
            f"; max interval rel-diff {rel}")
        if ratio > 1.02 and ok_num:
            actions.append("FLIP RenderConfig.mxu_coeffs default to True "
                           "(config.py) + note in docs/PERF_STUDIES.md #4; "
                           "consider the big-N/grid kernels next (r5)")
        else:
            why = ("rel-diff missing/too big" if not ok_num
                   else "<2% e2e win")
            evidence.append(f"MXU: keep FMA default ({why})")
    else:
        evidence.append("MXU A/B: e2e artifacts not captured yet")

    # ---- 2. Launch geometry ---------------------------------------------
    blk = _load(b("block_sweep_r4.json"))
    if blk and isinstance(blk.get("ns_per_ray"), dict):
        ns = {k: v for k, v in blk["ns_per_ray"].items()
              if isinstance(v, (int, float))}
        best = blk.get("best")
        cur = blk.get("current_default")
        evidence.append(f"block sweep (N={blk.get('N')}): {ns}; "
                        f"best={best}, current={cur}")
        if best and cur and best != cur and cur in ns \
                and ns[best] < 0.95 * ns[cur]:
            actions.append(
                f"ADJUST kernels/pathtrace.auto_block/_VMEM_LIMIT toward "
                f"{best} ({ns[best]:.1f} vs {ns[cur]:.1f} ns/ray) — "
                "confirm with /tmp/r4q/blk256_e2e.log vs wf_mega.log e2e")
        else:
            evidence.append("block sweep: keep current launch geometry")
    else:
        evidence.append("block sweep: artifacts not captured yet")

    # ---- 3. headline refresh --------------------------------------------
    if actions:
        actions.append("RE-RUN bench.py headline after adoption "
                       "(BENCH_r04 + benchmarks/headline_spp64_r4.json) "
                       "and scripts/update_bench_docs.py")

    print("== r4 post-capture evidence ==")
    for e in evidence:
        print(" *", e)
    print("== proposed actions ==")
    if actions:
        for a in actions:
            print(" ->", a)
    else:
        print(" -> none (keep all defaults)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
