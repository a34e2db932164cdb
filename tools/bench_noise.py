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

    # Per-query contention pre-adjudication (round-15, closing the round-14
    # verdict's "the sentinel cannot detect bursty contention" item): a
    # query whose SHUFFLE BYTES match the committed anchor ran the same
    # plan, so a wall-time inflation with process-CPU/wall collapsed far
    # below the anchor's utilization means the host stole the cores
    # mid-battery — the direct signature of the 546 s round-14 driver
    # window (dd_winnow 84.7 s vs 3.5 s anchor, byte-identical shuffle).
    # Such movers are adjudicated CONTENDED from the JSON alone and skip
    # the re-run (a re-run can confirm a regression but proves nothing in
    # a still-contended window anyway).
    # Two signals, either sufficient on a same-plan (shuffle-matching) mover:
    #  (a) steal_ms: /proc/stat hypervisor-steal jumped by >= 1 core-second
    #      per wall-second over the query's window — the host was being
    #      robbed, directly measured (the authoritative signal on this
    #      Firecracker host class, where steal also inflates apparent
    #      process CPU);
    #  (b) cpu/wall collapsed below half the anchor's utilization — the
    #      query ran the same plan with most cores idle.
    contended = {}
    f_cpu, r_cpu = fresh.get("cpu_ms") or {}, ref.get("cpu_ms") or {}
    f_steal = fresh.get("steal_ms") or {}
    f_sh, r_sh = fresh.get("shuffle_bytes") or {}, ref.get("shuffle_bytes") or {}
    for q in movers:
        fw, rw = fresh["queries"][q], ref["queries"][q]
        if fw <= 0 or rw <= 0 or fw <= 1.5 * rw:
            continue
        sh_f, sh_r = f_sh.get(q), r_sh.get(q)
        same_plan = (sh_f is not None and sh_r is not None
                     and abs(sh_f - sh_r) <= 0.10 * max(sh_r, 1) + 4096)
        if not same_plan:
            continue
        st = f_steal.get(q, -1)
        if st is not None and st >= 1000 * fw:
            contended[q] = f"steal {st / 1000.0:.1f}s over {fw:.1f}s wall"
            continue
        fc, rc = f_cpu.get(q, -1), r_cpu.get(q, -1)
        if fc >= 0 and rc >= 0:
            util_f, util_r = fc / 1000.0 / fw, rc / 1000.0 / rw
            if util_f < 0.5 * util_r:
                contended[q] = (f"cpu/wall {util_f:.1f}x vs anchor "
                                f"{util_r:.1f}x")
    if contended:
        for q, why in contended.items():
            print(f"  {q}: contended window — shuffle bytes match anchor, {why}")
    rerun_movers = [q for q in movers if q not in contended]
    print(f"movers: {', '.join(movers)}"
          + (f" — contended (no re-run): {', '.join(contended)}" if contended else "")
          + (f" — re-running {', '.join(rerun_movers)} on {fresh.get('sf')}"
             if rerun_movers else " — all movers contended, no re-run needed"))

    rerun = {}
    if rerun_movers:
        # graft.Bench overwrites BENCH_LOCAL.json even for filtered runs —
        # snapshot the full-battery artifact and restore it afterwards.
        with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
            snapshot = f.read()
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=fresh.get("sf", "/root/testdata/sf0.1"))
        try:
            out = subprocess.run(
                ["sbt", "-batch", f"runMain graft.Bench {','.join(rerun_movers)}"],
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
        r, f_ = ref["queries"][q], fresh["queries"][q]
        if q in contended:
            rows.append((q, r, f_, -1.0, "contended-host"))
            continue
        rr = rerun.get(q, -1.0)
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
        f"{t_ref:.1f} s; the 5 biggest movers "
        "(contended-host rows adjudicated from cpu_ms/shuffle_bytes alone, "
        "the rest re-ran on a quiet pass):",
        "",
        "| query | ref (s) | fresh (s) | re-run (s) | verdict |",
        "| --- | --- | --- | --- | --- |",
    ]
    for q, r, f_, rr, v in rows:
        rr_s = f"{rr:.2f}" if rr >= 0 else "—"
        lines.append(f"| {q} | {r:.2f} | {f_:.2f} | {rr_s} | {v} |")
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
                        "every mover is adjudicated contended or returned to its "
                        "committed baseline on re-run; the fresh run hit a host "
                        "noise/contention window."))
    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended verdict to SCALING.md")


if __name__ == "__main__":
    main()
