"""Round-4 capture completeness check (exit 0 iff every artifact landed).

The TPU watcher (scripts/tpu_watch_r4.sh) re-arms the idempotent queue
(scripts/r4_queue.sh) until this passes, so a tunnel drop mid-queue only
costs the steps that hadn't finished.  Each check mirrors the skip guard
of the corresponding queue step — keep them in sync.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def real_rows(path):
    """Benchmark JSON rows in a log, excluding tunnel-down fallbacks."""
    rows = []
    try:
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if not ln.startswith("{"):
                    continue
                if "LAST-KNOWN-GOOD" in ln or "unavailable" in ln:
                    continue
                try:
                    rows.append(json.loads(ln))
                except json.JSONDecodeError:
                    pass
    except FileNotFoundError:
        pass
    return rows


def check():
    b = lambda *p: os.path.join(REPO, "benchmarks", *p)
    results = {}

    results["headline_spp64"] = bool(real_rows("/tmp/r4q/bench.log"))

    try:
        wf = json.load(open(b("wavefront_r4.json")))
        results["wavefront_ab"] = "mega" in wf and "step" in wf
    except (FileNotFoundError, json.JSONDecodeError):
        results["wavefront_ab"] = False

    try:
        n = sum(1 for ln in open(b("series_r4_512_spp16.jsonl"))
                if ln.strip().startswith("{"))
        results["series_7_fixtures"] = n >= 7
    except FileNotFoundError:
        results["series_7_fixtures"] = False

    results["headline_spp256"] = bool(real_rows(b("headline_spp256_r4.json")))

    results["parity_sweep"] = os.path.exists("/tmp/r4q/done.parity")

    results["profile_kernel"] = os.path.getsize(
        b("breakdown_kernel_r4.json")) > 2 \
        if os.path.exists(b("breakdown_kernel_r4.json")) else False
    results["profile_grid"] = os.path.getsize(
        b("breakdown_r4_grid.json")) > 2 \
        if os.path.exists(b("breakdown_r4_grid.json")) else False

    results["fit_demo"] = os.path.exists("/tmp/r4q/done.fit")

    try:
        mx = json.load(open(b("mxu_coeffs_r4.json")))
        results["mxu_ab"] = bool(mx.get("kernel_ab")) and \
            bool(mx.get("e2e_mxu"))
    except (FileNotFoundError, json.JSONDecodeError):
        results["mxu_ab"] = False

    for k, v in results.items():
        print(f"  {'OK  ' if v else 'MISS'} {k}")
    # the optional steps (fit artifact, profiles, mxu A/B) don't block
    # completeness — the headline story does
    required = ("headline_spp64", "wavefront_ab", "series_7_fixtures",
                "headline_spp256", "parity_sweep")
    ok = all(results[k] for k in required)
    print("r4 capture:", "COMPLETE" if ok else "incomplete",
          f"({sum(results.values())}/{len(results)} artifacts)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(check())
