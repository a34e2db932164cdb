#!/usr/bin/env python3
"""Mechanical noise-vs-regression verdict for local bench runs.

Usage: python3 tools/bench_noise.py [fresh.json] [ref.json]

Compares a fresh bench artifact (default BENCH_LOCAL.json) against a
reference (default: the last committed BENCH_LOCAL.json via
`git show HEAD:BENCH_LOCAL.json`). If the totals agree within 10% it
prints so and exits. Otherwise it re-runs the 5 biggest per-query movers
through `graft.Bench` on the same sf dir and classifies each:

  - the re-run lands back near the reference  -> host NOISE window
  - the re-run reproduces the fresh delta     -> real REGRESSION

and appends the dated verdict table to SCALING.md so the diagnosis that
was previously done by hand each round is recorded mechanically.
"""
import json
import os
import re
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BAND = 0.10        # totals within this: no action
NEAR_REF = 1.30    # re-run <= 1.3x ref => returned to baseline (noise)


def load(path):
    with open(path) as f:
        return json.load(f)


def git_show(ref_path):
    out = subprocess.run(["git", "show", f"HEAD:{ref_path}"], cwd=REPO,
                         capture_output=True, text=True, check=True).stdout
    return json.loads(out)


def main():
    fresh_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_LOCAL.json")
    fresh = load(fresh_path)
    if len(sys.argv) > 2:
        ref = load(sys.argv[2])
    else:
        ref = git_show("BENCH_LOCAL.json")
    if fresh.get("partial") or ref.get("partial"):
        sys.exit("refusing to compare partial (filtered) bench runs")
    if fresh.get("sf") != ref.get("sf"):
        sys.exit(f"sf mismatch: fresh {fresh.get('sf')} vs ref {ref.get('sf')} "
                 "— totals are not comparable across scale factors")

    t_new, t_ref = fresh["value"], ref["value"]
    dev = abs(t_new - t_ref) / t_ref
    print(f"total: fresh {t_new:.1f}s vs ref {t_ref:.1f}s ({dev:+.0%})")
    if dev <= BAND:
        print(f"within the {BAND:.0%} band — no action")
        return

    common = sorted(set(fresh["queries"]) & set(ref["queries"]),
                    key=lambda q: abs(fresh["queries"][q] - ref["queries"][q]),
                    reverse=True)
    movers = common[:5]
    print(f"movers: {', '.join(movers)} — re-running on {fresh.get('sf')}")

    # graft.Bench overwrites BENCH_LOCAL.json even for filtered runs —
    # snapshot the full-battery artifact and restore it afterwards.
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
        snapshot = f.read()
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=fresh.get("sf", "/root/testdata/sf0.1"))
    try:
        out = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Bench {','.join(movers)}"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=3600).stdout
    finally:
        with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as f:
            f.write(snapshot)
    m = re.search(r'\{"metric":.*\}', out)
    if not m:
        sys.exit("re-run produced no bench JSON line")
    rerun = json.loads(m.group(0))["queries"]

    rows, n_regressed = [], 0
    for q in movers:
        r, f_, rr = ref["queries"][q], fresh["queries"][q], rerun.get(q, -1.0)
        verdict = "noise" if 0 <= rr <= NEAR_REF * r else "REGRESSION"
        if verdict == "REGRESSION":
            n_regressed += 1
        rows.append((q, r, f_, rr, verdict))
    overall = "REGRESSION" if n_regressed else "noise"
    # Whole-run host degradation check: the last/first sentinel RATIO only
    # catches MID-run degradation — if the host is slow for the entire run,
    # both sentinel passes inflate together and the ratio looks healthy.
    # The absolute first-pass level is the cross-run comparable: o3_limit is
    # a constant-cost plan, so a fresh first-pass well above the committed
    # run's means the whole fresh run (and its reproducing re-runs, if the
    # window persists) is host-degraded, not code-regressed.
    s_ref = (ref.get("sentinel") or {}).get("first", -1.0)
    s_new = (fresh.get("sentinel") or {}).get("first", -1.0)
    if overall == "REGRESSION" and s_ref > 0 and s_new > 1.5 * s_ref:
        overall = "HOST-DEGRADED (sustained)"
    print(f"sentinel first-pass: fresh {s_new:.2f}s vs ref {s_ref:.2f}s")
    print(f"verdict: {overall}")

    lines = [
        "",
        f"### bench_noise.py verdict — {date.today().isoformat()}",
        "",
        f"Fresh total {t_new:.1f} s deviated {dev:+.0%} from the committed "
        f"{t_ref:.1f} s; the 5 biggest movers re-ran on a quiet pass:",
        "",
        "| query | ref (s) | fresh (s) | re-run (s) | verdict |",
        "| --- | --- | --- | --- | --- |",
    ]
    for q, r, f_, rr, v in rows:
        lines.append(f"| {q} | {r:.2f} | {f_:.2f} | {rr:.2f} | {v} |")
    lines.append("")
    if overall.startswith("HOST"):
        lines.append(f"**Overall: {overall}** — movers reproduce, but the "
                     f"constant-cost sentinel's first pass ({s_new:.2f} s vs "
                     f"{s_ref:.2f} s committed) shows the whole window is "
                     "host-degraded; re-measure in a quiet window before "
                     "treating any mover as a code regression.")
    else:
        lines.append(f"**Overall: {overall}** — "
                     + ("at least one mover reproduces its fresh delta on re-run."
                        if n_regressed else
                        "every mover returned to its committed baseline; the fresh "
                        "run hit a host noise window."))
    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended verdict to SCALING.md")


if __name__ == "__main__":
    main()
