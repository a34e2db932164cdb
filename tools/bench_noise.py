#!/usr/bin/env python3
"""Mechanical noise-vs-regression verdict for local bench runs.

Usage: python3 tools/bench_noise.py [fresh.json] [ref.json]
       python3 tools/bench_noise.py --selftest

Compares a fresh bench artifact (default BENCH_LOCAL.json) against a
reference (default: the last committed BENCH_LOCAL.json via
`git show HEAD:BENCH_LOCAL.json`). If the totals agree within 10% it
prints so and exits. Otherwise it re-runs the 5 biggest per-query movers
through `graft.Bench` on the same sf dir and classifies each:

  - the re-run lands back near the reference  -> host NOISE window
  - the re-run reproduces the fresh delta     -> real REGRESSION
  - the re-run's OWN window is steal-contended -> rerun-contended
    (retried once; never printed as REGRESSION — round-16 fix: the tool
    once minted a false REGRESSION because its re-run ran on a busy box)

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
MOVER_MIN = 1.5    # a mover is only adjudicated if fresh > 1.5x ref


def steal_contended(wall_s, steal_ms):
    """The mechanical contention rule (a): /proc/stat hypervisor steal of
    >= 1 core-second per wall-second over the query's window. The same
    rule guards movers, the tool's OWN re-run windows, and graft.Bench's
    end-of-battery anchor healing."""
    return (wall_s > 0 and steal_ms is not None and steal_ms >= 0
            and steal_ms >= 1000.0 * wall_s)


def same_plan(sh_f, sh_r):
    """Shuffle bytes within 10% (+4 KB slack) => the fresh run executed the
    same physical plan; wall deltas are then host, not code."""
    return (sh_f is not None and sh_r is not None
            and abs(sh_f - sh_r) <= 0.10 * max(sh_r, 1) + 4096)


def adjudicate_movers(movers, fresh, ref):
    """Split movers into terminally-contended (steal-confirmed; no re-run
    can add information while the window persists) vs to-re-run.

    Round-16 change (ADVICE item): a cpu/wall collapse WITHOUT a steal jump
    is no longer a terminal verdict — a genuine serialization regression
    (skew collapse, single-partition stage, lock contention) shows the
    same signature (matching shuffle, inflated wall, collapsed
    utilization). Rule (a) — the steal counter — is directly measured and
    stays terminal; rule (b) movers are labeled SUSPECT and go through
    the quiet-pass re-run like any other mover.
    """
    contended, suspects = {}, {}
    f_cpu, r_cpu = fresh.get("cpu_ms") or {}, ref.get("cpu_ms") or {}
    f_steal = fresh.get("steal_ms") or {}
    f_sh, r_sh = fresh.get("shuffle_bytes") or {}, ref.get("shuffle_bytes") or {}
    for q in movers:
        fw, rw = fresh["queries"][q], ref["queries"][q]
        if fw <= 0 or rw <= 0 or fw <= MOVER_MIN * rw:
            continue
        if not same_plan(f_sh.get(q), r_sh.get(q)):
            continue
        st = f_steal.get(q, -1)
        if steal_contended(fw, st):
            contended[q] = f"steal {st / 1000.0:.1f}s over {fw:.1f}s wall"
            continue
        fc, rc = f_cpu.get(q, -1), r_cpu.get(q, -1)
        if fc >= 0 and rc >= 0:
            util_f, util_r = fc / 1000.0 / fw, rc / 1000.0 / rw
            if util_f < 0.5 * util_r:
                suspects[q] = (f"cpu/wall {util_f:.1f}x vs anchor "
                               f"{util_r:.1f}x, no steal jump — re-running")
    return contended, suspects


def classify_rerun(ref_wall, rr_wall, rr_steal):
    """Verdict for one re-run row. A re-run that itself ran in a
    steal-contended window proves nothing either way — it must surface as
    rerun-contended, never as REGRESSION (the round-15 false-positive:
    ta_kn_bigram re-ran at 6.19 s on a busy box vs 4.30 s quiet)."""
    if rr_wall is None or rr_wall < 0:
        return "rerun-failed"
    if rr_wall <= NEAR_REF * ref_wall:
        return "noise"
    if steal_contended(rr_wall, rr_steal):
        return "rerun-contended"
    return "REGRESSION"


def selftest():
    """Unit-style probe of the adjudication rules on synthetic inputs —
    no sbt, no Spark (round-16 verdict item 1's 'done' condition)."""
    # classify_rerun: quiet re-run back at baseline -> noise
    assert classify_rerun(4.0, 4.3, 0) == "noise"
    # quiet re-run reproducing the delta -> REGRESSION
    assert classify_rerun(4.0, 9.0, 100) == "REGRESSION"
    # inflated re-run whose own window shows >=1 core-s steal per wall-s
    # -> rerun-contended, NOT REGRESSION (the round-15 false positive)
    assert classify_rerun(4.0, 6.19, 7000) == "rerun-contended"
    # missing/failed re-run
    assert classify_rerun(4.0, -1, 0) == "rerun-failed"
    # steal telemetry unavailable (-1): cannot claim contention
    assert classify_rerun(4.0, 9.0, -1) == "REGRESSION"

    # adjudicate_movers: steal-confirmed -> terminal contended;
    # cpu/wall-collapse-only -> suspect (re-runs); plan change -> neither.
    fresh = {"queries": {"a": 10.0, "b": 10.0, "c": 10.0},
             "cpu_ms": {"a": 20000, "b": 20000, "c": 20000},
             "steal_ms": {"a": 15000, "b": 0, "c": 0},
             "shuffle_bytes": {"a": 1 << 20, "b": 1 << 20, "c": 9 << 20}}
    ref = {"queries": {"a": 2.0, "b": 2.0, "c": 2.0},
           "cpu_ms": {"a": 40000, "b": 40000, "c": 40000},
           "shuffle_bytes": {"a": 1 << 20, "b": 1 << 20, "c": 1 << 20}}
    contended, suspects = adjudicate_movers(["a", "b", "c"], fresh, ref)
    assert set(contended) == {"a"}, contended   # steal 15 core-s / 10 s wall
    assert set(suspects) == {"b"}, suspects     # util 2.0x vs 20x, no steal
    # c changed plans (9x shuffle) -> re-runs as an ordinary mover
    print("selftest: all adjudication-rule probes pass")


def load(path):
    with open(path) as f:
        return json.load(f)


def git_show(ref_path):
    out = subprocess.run(["git", "show", f"HEAD:{ref_path}"], cwd=REPO,
                         capture_output=True, text=True, check=True).stdout
    return json.loads(out)


def run_partial_bench(names, sf_dir):
    """One filtered graft.Bench pass; returns its full JSON (queries +
    steal_ms + ...) read from a private artifact path — SPARK_GRAFT_BENCH_OUT
    keeps the full-battery BENCH_LOCAL.json untouched (the old
    snapshot/restore dance is gone)."""
    art = os.path.join("/tmp", f"bench_noise_rerun_{os.getpid()}.json")
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_OUT=art)
    subprocess.run(["sbt", "-batch", f"runMain graft.Bench {','.join(names)}"],
                   cwd=REPO, env=env, capture_output=True, text=True,
                   timeout=3600)
    if not os.path.exists(art):
        sys.exit("re-run produced no bench JSON artifact")
    with open(art) as f:
        return json.load(f)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        return
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

    contended, suspects = adjudicate_movers(movers, fresh, ref)
    for q, why in contended.items():
        print(f"  {q}: contended window — shuffle bytes match anchor, {why}")
    for q, why in suspects.items():
        print(f"  {q}: SUSPECT — {why}")
    rerun_movers = [q for q in movers if q not in contended]
    print(f"movers: {', '.join(movers)}"
          + (f" — contended (no re-run): {', '.join(contended)}" if contended else "")
          + (f" — re-running {', '.join(rerun_movers)} on {fresh.get('sf')}"
             if rerun_movers else " — all movers contended, no re-run needed"))

    rerun, rerun_steal = {}, {}
    if rerun_movers:
        sf_dir = fresh.get("sf", "/root/testdata/sf0.1")
        art = run_partial_bench(rerun_movers, sf_dir)
        rerun = dict(art.get("queries") or {})
        rerun_steal = dict(art.get("steal_ms") or {})
        # One retry for rows whose re-run window was itself steal-contended:
        # a second pass often lands in a quiet slot; if it doesn't, the row
        # stays rerun-contended rather than faking certainty either way.
        retry = [q for q in rerun_movers
                 if classify_rerun(ref["queries"][q], rerun.get(q),
                                   rerun_steal.get(q)) == "rerun-contended"]
        if retry:
            print(f"re-run window contended for {', '.join(retry)} — retrying once")
            art2 = run_partial_bench(retry, sf_dir)
            for q in retry:
                if q in (art2.get("queries") or {}):
                    rerun[q] = art2["queries"][q]
                    rerun_steal[q] = (art2.get("steal_ms") or {}).get(q, -1)

    rows, n_regressed, n_rerun_contended = [], 0, 0
    for q in movers:
        r, f_ = ref["queries"][q], fresh["queries"][q]
        if q in contended:
            rows.append((q, r, f_, -1.0, None, "contended-host"))
            continue
        rr = rerun.get(q, -1.0)
        rst = rerun_steal.get(q, -1)
        verdict = classify_rerun(r, rr, rst)
        if q in suspects and verdict == "noise":
            verdict = "noise (was suspect)"
        if verdict == "REGRESSION":
            n_regressed += 1
        if verdict == "rerun-contended":
            n_rerun_contended += 1
        rows.append((q, r, f_, rr, rst, verdict))
    if n_regressed:
        overall = "REGRESSION"
    elif n_rerun_contended:
        overall = "INCONCLUSIVE (re-run window contended)"
    else:
        overall = "noise"
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
        f"{t_ref:.1f} s; the 5 biggest movers "
        "(steal-confirmed contended-host rows adjudicated from "
        "steal_ms/shuffle_bytes alone; every other mover — including "
        "cpu/wall-collapse suspects — re-ran, and each re-run window is "
        "itself checked against the same steal rule: a contended re-run "
        "reads rerun-contended, never REGRESSION):",
        "",
        "| query | ref (s) | fresh (s) | re-run (s) | re-run steal (core-s) | verdict |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for q, r, f_, rr, rst, v in rows:
        rr_s = f"{rr:.2f}" if rr is not None and rr >= 0 else "—"
        rst_s = (f"{rst / 1000.0:.1f}" if rst is not None and rst >= 0 else "—")
        lines.append(f"| {q} | {r:.2f} | {f_:.2f} | {rr_s} | {rst_s} | {v} |")
    lines.append("")
    if overall.startswith("HOST"):
        lines.append(f"**Overall: {overall}** — movers reproduce, but the "
                     f"constant-cost sentinel's first pass ({s_new:.2f} s vs "
                     f"{s_ref:.2f} s committed) shows the whole window is "
                     "host-degraded; re-measure in a quiet window before "
                     "treating any mover as a code regression.")
    elif overall.startswith("INCONCLUSIVE"):
        lines.append(f"**Overall: {overall}** — no mover reproduced in a "
                     "provably quiet window; at least one re-run (and its "
                     "retry) was itself steal-contended. Re-run when quiet.")
    else:
        lines.append(f"**Overall: {overall}** — "
                     + ("at least one mover reproduces its fresh delta on a "
                        "steal-clean re-run."
                        if n_regressed else
                        "every mover is adjudicated steal-contended or returned "
                        "to its committed baseline on re-run; the fresh run hit "
                        "a host noise/contention window."))
    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended verdict to SCALING.md")


if __name__ == "__main__":
    main()
