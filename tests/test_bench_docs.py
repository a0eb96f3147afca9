"""update_bench_docs runs UNATTENDED (the TPU watcher regenerates the
README after every capture attempt) — exercise the populated-artifact
path with synthetic benchmarks so a malformed row can't crash the regen
or corrupt the README at capture time."""

import importlib.util
import json
import os

import pytest


def _load(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "ubd", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "update_bench_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.REPO = str(tmp_path)
    os.makedirs(tmp_path / "benchmarks", exist_ok=True)
    return mod


def _write(tmp_path, name, payload):
    with open(tmp_path / "benchmarks" / name, "w") as f:
        f.write(payload)


def test_empty_artifacts_renders_pending(tmp_path):
    mod = _load(tmp_path)
    sec = mod.build_section()
    assert "capture pending" in sec
    assert sec.startswith(mod.BEGIN) and sec.endswith(mod.END)


def test_populated_artifacts_render_rows(tmp_path):
    mod = _load(tmp_path)
    row = {"metric": "Mrays/sec/chip multiscatter X", "value": 30.5,
           "unit": "Mrays/s", "vs_baseline": 0.305}
    _write(tmp_path, "headline_spp64_r4.json", json.dumps(row) + "\n")
    _write(tmp_path, "wavefront_r4.json", json.dumps(
        {"mega": dict(row, value=30.5), "step": dict(row, value=24.0)}))
    _write(tmp_path, "mxu_coeffs_r4.json", json.dumps(
        {"e2e_mxu": [dict(row, value=30.2)],      # < 1.02x of 30.0
         "e2e_fma": [dict(row, value=30.0)]}))
    series = [{"scene": "50_random.txt", "gaussians": 50, "seconds": 0.5,
               "mrays_per_sec": 40.0, "engine": "dense",
               "rays_per_path": 7.7},
              {"scene": "40k_random_generated", "gaussians": 40000,
               "seconds": 60.0, "mrays_per_sec": 0.9, "engine": "grid",
               "rays_per_path": 7.0}]
    _write(tmp_path, "series_r4_512_spp16.jsonl",
           "".join(json.dumps(r) + "\n" for r in series))
    # a fallback line and junk must be ignored, not crash
    _write(tmp_path, "headline_spp256_r4.json",
           '{"metric": "LAST-KNOWN-GOOD (TPU tunnel down): x", "value": 1}\n'
           "not json\n")

    sec = mod.build_section()
    assert "30.5 Mrays/s" in sec                      # headline row
    assert "30.5 vs 24.0" in sec and "1.27×" in sec   # wavefront A/B
    assert "not adopted" in sec                       # 30.2 < 1.02 * 30.0
    assert "40k_random_generated" in sec              # series row, no r2 prev
    assert "LAST-KNOWN-GOOD" not in sec               # fallback filtered
    assert "capture pending" not in sec


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _repo_rows(path):
    rows = []
    with open(os.path.join(REPO, path)) as f:
        for ln in f:
            ln = ln.strip()
            if ln.startswith("{"):
                rows.append(json.loads(ln))
    return rows


def test_checked_in_readme_cites_existing_artifacts():
    """Repo-state test (round-4 shipped a README citing two files the
    snapshot commit had deleted — synthetic-tree tests can't catch that).
    Every `benchmarks/...` path the real README mentions must exist."""
    import re
    text = open(os.path.join(REPO, "README.md")).read()
    cited = set(re.findall(r"benchmarks/[\w.\-]+", text))
    assert cited, "README cites no benchmark artifacts — regen is broken"
    missing = [p for p in cited if not os.path.exists(os.path.join(REPO, p))]
    assert not missing, f"README cites missing artifacts: {missing}"


def test_checked_in_headline_numbers_agree():
    """The README headline, benchmarks/headline_spp64_*.json, and
    last_good.json must all carry the SAME canonical number (round 4
    ended with three different headline values checked in)."""
    import glob
    import re
    heads = sorted(
        glob.glob(os.path.join(REPO, "benchmarks",
                               "headline_spp64_r*.json")),
        key=lambda p: (int(re.search(r"_r(\d+)",
                                     os.path.basename(p)).group(1)), p))
    assert heads, "no headline artifact checked in"
    latest = _repo_rows(os.path.relpath(heads[-1], REPO))[-1]
    text = open(os.path.join(REPO, "README.md")).read()
    # the most recent round section must quote the latest headline value
    assert f"{latest['value']} {latest['unit']}" in text, (
        f"README headline disagrees with {os.path.basename(heads[-1])} "
        f"({latest['value']}) — run scripts/update_bench_docs.py")
    last_good = _repo_rows("benchmarks/last_good.json")[-1]
    # last_good tracks the canonical bench config; it must match the
    # newest headline artifact for that same config (metric spells it out)
    if last_good["metric"] == latest["metric"]:
        assert last_good["value"] == latest["value"], (
            "last_good.json and the newest headline artifact disagree")


def test_main_inserts_and_replaces_idempotently(tmp_path):
    mod = _load(tmp_path)
    readme = tmp_path / "README.md"
    readme.write_text("# repo\n\nbody\n")
    mod.main()
    first = readme.read_text()
    assert mod.BEGIN in first and first.count(mod.BEGIN) == 1
    mod.main()                                        # replace, not append
    second = readme.read_text()
    assert second.count(mod.BEGIN) == 1
    assert second.startswith("# repo")
