"""Regenerate the round-4 measured-results section of README.md from the
captured benchmark artifacts (benchmarks/*_r4*).

Owns everything between the `<!-- r4-bench:begin -->` / `<!-- r4-bench:end -->`
markers (inserted at the end of README.md if absent).  Tolerant of partial
captures: rows render only for artifacts that exist, so the TPU watcher can
call this after any queue attempt.

    python scripts/update_bench_docs.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- r4-bench:begin -->", "<!-- r4-bench:end -->"


def _rows(path):
    out = []
    try:
        with open(os.path.join(REPO, path)) as f:
            for ln in f:
                ln = ln.strip()
                if ln.startswith("{") and "LAST-KNOWN-GOOD" not in ln \
                        and "unavailable" not in ln:
                    try:
                        out.append(json.loads(ln))
                    except json.JSONDecodeError:
                        pass
    except FileNotFoundError:
        pass
    return out


def _json(path):
    try:
        with open(os.path.join(REPO, path)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def build_section() -> str:
    lines = [BEGIN, "", "### Round-4 measured results (v5e single chip)", ""]
    have_any = False

    h64 = _rows("benchmarks/headline_spp64_r4.json")
    h256 = _rows("benchmarks/headline_spp256_r4.json")
    for label, rows in (("spp 64 headline", h64), ("spp 256 headline", h256)):
        if rows:
            r = rows[-1]
            lines.append(f"* **{label}**: {r['value']} {r['unit']} "
                         f"({r['metric']}) — {100 * r['vs_baseline']:.1f}% "
                         f"of the 100 Mrays/s north star.")
            have_any = True

    wf = _json("benchmarks/wavefront_r4.json") or {}
    if "mega" in wf and "step" in wf:
        m, s = wf["mega"]["value"], wf["step"]["value"]
        lines.append(f"* **Persistent megakernel vs per-bounce step** "
                     f"(1024², spp 16): {m} vs {s} Mrays/s "
                     f"({m / s:.2f}× from keeping per-ray state "
                     f"VMEM-resident across bounces).")
        have_any = True

    mx = _json("benchmarks/mxu_coeffs_r4.json") or {}
    if mx.get("e2e_mxu") and mx.get("e2e_fma"):
        on = mx["e2e_mxu"][-1]["value"]
        off = mx["e2e_fma"][-1]["value"]
        verdict = "adopted" if on > 1.02 * off else \
            "not adopted (within noise or slower)"
        lines.append(f"* **MXU quadratic-coefficient contraction A/B** "
                     f"(1024², spp 16): {on} vs {off} Mrays/s "
                     f"({on / off:.2f}×) — {verdict}; kernel-level numbers "
                     f"in `benchmarks/mxu_coeffs_r4.json`.")
        have_any = True

    series = _rows("benchmarks/series_r4_512_spp16.jsonl")
    series = [r for r in series if "scene" in r]
    if series:
        prev = {r["scene"]: r for r in
                _rows("benchmarks/series_r2_512_spp16.jsonl")
                if "scene" in r}
        lines += ["", "512² spp16 wall-clock over the 50 → 20k-Gaussian "
                  "fixtures (`benchmarks/series_r4_512_spp16.jsonl`):", "",
                  "| scene | engine | r2 | r4 | speedup | Mrays/s |",
                  "|---|---|---|---|---|---|"]
        for r in series:
            name = r["scene"].replace(".txt", "")
            p = prev.get(r["scene"])
            r2s = f"{p['seconds']}s" if p else "—"
            sp = f"{p['seconds'] / r['seconds']:.1f}×" if p else "—"
            lines.append(f"| {name} | {r.get('engine', '?')} | {r2s} | "
                         f"{r['seconds']}s | {sp} | "
                         f"{r['mrays_per_sec']} |")
        have_any = True

    if not have_any:
        lines.append("*(capture pending — the TPU tunnel was down; "
                     "see `scripts/r4_queue.sh`)*")
    lines += ["", END]
    return "\n".join(lines)


def main():
    path = os.path.join(REPO, "README.md")
    with open(path) as f:
        text = f.read()
    section = build_section()
    if BEGIN in text and END in text:
        pre = text[:text.index(BEGIN)]
        post = text[text.index(END) + len(END):]
        text = pre + section + post
    else:
        text = text.rstrip("\n") + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)
    print("README r4 section updated")


if __name__ == "__main__":
    main()
