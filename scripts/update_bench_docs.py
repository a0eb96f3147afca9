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


BEGIN5, END5 = "<!-- r5-bench:begin -->", "<!-- r5-bench:end -->"


def build_section_r5() -> str:
    """Round-5 measured-results block, rendered from benchmarks/*_r5*."""
    lines = [BEGIN5, "", "### Round-5 measured results (v5e single chip)", ""]
    have_any = False

    h64 = _rows("benchmarks/headline_spp64_r5.json")
    h256 = _rows("benchmarks/headline_spp256_r5.json")
    for label, rows in (("spp 64 headline", h64), ("spp 256 headline", h256)):
        if rows:
            r = rows[-1]
            lines.append(f"* **{label}**: {r['value']} {r['unit']} "
                         f"({r['metric']}) — {100 * r['vs_baseline']:.1f}% "
                         f"of the 100 Mrays/s north star.")
            if "series_geomean_mrays" in r:
                lines.append(f"  * scaling-series geomean "
                             f"{r['series_geomean_mrays']} Mrays/s over "
                             f"{r['series_scenes']} scenes "
                             f"(`benchmarks/{r['series_source']}`).")
            have_any = True

    bs = _json("benchmarks/block_sweep_r5.json")
    if bs:
        best = bs["best"]
        cur = bs["current_default"]
        sw = bs["ns_per_ray"]
        lines.append(f"* **Launch-geometry sweep** (N={bs['N']}, production "
                     f"bounce kernel): best {best} at "
                     f"{sw[best]:.1f} ns/ray vs old default {cur} at "
                     f"{sw[cur]:.1f} ns/ray ({sw[cur] / sw[best]:.2f}×) — "
                     f"**adopted** (`benchmarks/block_sweep_r5.json`).")
        have_any = True

    mx = _json("benchmarks/mxu_coeffs_r5.json")
    if mx and "ns_per_ray" in mx:
        fma, mxu = mx["ns_per_ray"]["fma"], mx["ns_per_ray"]["mxu"]
        verdict = ("adopted" if mxu < 0.98 * fma
                   else "not adopted (within noise or slower)")
        lines.append(f"* **MXU quadratic-coefficient A/B** (bounce kernel): "
                     f"{mxu:.1f} vs {fma:.1f} ns/ray "
                     f"({fma / mxu:.2f}×) — {verdict} "
                     f"(`benchmarks/mxu_coeffs_r5.json`).")
        have_any = True

    mm = _json("benchmarks/mega_midrange_r5.json")
    m1k = _rows("benchmarks/mega_1000g_spp64_r5.json")
    if mm and "mega" in mm and "step_big" in mm:
        m, s = mm["mega"]["value"], mm["step_big"]["value"]
        extra = (f"; spp64: {m1k[-1]['value']} Mrays/s" if m1k else "")
        lines.append(f"* **Megakernel past N=256** (1000 Gaussians, 512², "
                     f"spp 16): mega {m} vs chunk-streaming step {s} "
                     f"Mrays/s ({m / s:.2f}× — the 256–2000 midrange now "
                     f"runs the fastest engine{extra}) "
                     f"(`benchmarks/mega_midrange_r5.json`).")
        have_any = True

    # tau_bf16 decision record: kernel + two compile-free e2e pairs + the
    # golden quality gate (docs/PERF_STUDIES.md §7 has the analysis)
    tk = _json("benchmarks/tau_bf16_r5.json")
    tg = _json("benchmarks/tau_bf16_golden_r5.json")
    p64f = _rows("benchmarks/tau_pair_spp64_f32_r5.json")
    p64b = _rows("benchmarks/tau_pair_spp64_bf16_r5.json")
    p16f = _rows("benchmarks/tau_pair_spp16_f32_r5.json")
    p16b = _rows("benchmarks/tau_bf16_e2e_r5.json")
    if tk and tg and p64f and p64b:
        e64f, e64b = p64f[-1]["value"], p64b[-1]["value"]
        parts = [f"kernel {tk['bf16_speedup']:.2f}×",
                 f"e2e spp64 {e64b / e64f:.2f}× ({e64f} → {e64b} Mrays/s)"]
        if p16f and p16b:
            parts.append(f"e2e spp16 "
                         f"{p16b[-1]['value'] / p16f[-1]['value']:.2f}×")
        verdict = ("**adopted**" if e64b > 1.02 * e64f else "**not adopted**")
        lines.append(
            f"* **Mixed-precision tau sweep** (`RenderConfig.tau_bf16`): "
            f"quality passes the 0.1 dB golden gate "
            f"(Δ{tg['delta_db']} dB at 512² spp{tg['spp']}) but speed: "
            f"{', '.join(parts)} — {verdict}; v5e evaluates `exp` through "
            f"the same f32 transcendental pipeline either way, so bf16 "
            f"only adds converts (docs/PERF_STUDIES.md §7; "
            f"`benchmarks/tau_bf16_r5.json`, "
            f"`benchmarks/tau_pair_spp64_bf16_r5.json`).")
        have_any = True

    pool = _json("benchmarks/pool_ab_r5.json")
    pm = _json("benchmarks/pool_mega_r5.json")
    if pool and "scenes" in pool:
        per = ", ".join(
            f"{k.replace('.txt', '')} {v['speedup']:.2f}×"
            for k, v in pool["scenes"].items())
        mega = ""
        if pm and "scenes" in pm:
            r = next(iter(pm["scenes"].values()))
            mega = (f"; 1024² spp64 mega headline "
                    f"{r['lane_mrays']} → {r['pool_mrays']} Mrays/s "
                    f"({r['speedup']:.2f}×)")
        lines.append(
            f"* **Pooled path regeneration** (dead lanes claim the "
            f"chunk's next (pixel, sample) instead of idling; "
            f"`RenderConfig.pool_regen`, **adopted as default**): grid "
            f"engine at 512² spp16 — {per}{mega}; images agree with the "
            f"per-lane engines to ≤1e-7 mean abs "
            f"(`benchmarks/pool_ab_r5.json`, "
            f"`benchmarks/pool_mega_r5.json`).")
        have_any = True

    if os.path.exists(os.path.join(REPO, "docs/fit_demo/fit50_log.jsonl")):
        lines.append(
            "* **Inverse at reference scale** (50_random, 550 params, "
            "mid-run kill+resume exercised): 14.56 → 25.94 dB in 400 Adam "
            "iterations, 2231 s on one chip (docs/FIT_DEMO.md).")
        have_any = True

    # series table: the pooled recapture when it exists (the adopted
    # default), else the pre-pool r5 capture; prior rounds as comparison
    pooled = [r for r in _rows("benchmarks/series_r5_pool_512_spp16.jsonl")
              if "scene" in r]
    lane5 = [r for r in _rows("benchmarks/series_r5_512_spp16.jsonl")
             if "scene" in r]
    series, src = (pooled, "benchmarks/series_r5_pool_512_spp16.jsonl") \
        if pooled else (lane5, "benchmarks/series_r5_512_spp16.jsonl")
    if series:
        prev = {r["scene"]: r for r in
                _rows("benchmarks/series_r4_512_spp16.jsonl")
                if "scene" in r}
        cols = "| scene | engine | r4 Mrays/s |"
        rule = "|---|---|---|"
        if pooled:
            cols += " r5 per-lane |"
            rule += "---|"
        cols += " r5 Mrays/s | speedup vs r4 |"
        rule += "---|---|"
        lines += ["", f"512² spp16 over the 50 → 40k-Gaussian fixtures "
                  f"(`{src}`):", "", cols, rule]
        lane_by = {r["scene"]: r for r in lane5}
        for r in series:
            name = r["scene"].replace(".txt", "")
            p = prev.get(r["scene"])
            r4m = f"{p['mrays_per_sec']}" if p else "—"
            sp = (f"{r['mrays_per_sec'] / p['mrays_per_sec']:.2f}×"
                  if p else "—")
            row = f"| {name} | {r.get('engine', '?')} | {r4m} | "
            if pooled:
                l = lane_by.get(r["scene"])
                row += (f"{l['mrays_per_sec']} | " if l else "— | ")
            row += f"{r['mrays_per_sec']} | {sp} |"
            lines.append(row)
        have_any = True

    if not have_any:
        lines.append("*(capture pending — the TPU tunnel was down; "
                     "see `scripts/r5_queue.sh`)*")
    lines += ["", END5]
    return "\n".join(lines)


def _splice(text: str, section: str, begin: str, end: str) -> str:
    if begin in text and end in text:
        return (text[:text.index(begin)] + section
                + text[text.index(end) + len(end):])
    return text.rstrip("\n") + "\n\n" + section + "\n"


def main():
    path = os.path.join(REPO, "README.md")
    with open(path) as f:
        text = f.read()
    text = _splice(text, build_section(), BEGIN, END)
    text = _splice(text, build_section_r5(), BEGIN5, END5)
    with open(path, "w") as f:
        f.write(text)
    print("README r4+r5 sections updated")


if __name__ == "__main__":
    main()
