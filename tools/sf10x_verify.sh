#!/bin/bash
# Per-query-JVM second-decade verify — the round-14 CORRECTNESS_SF10X
# protocol, scripted (it was an ad-hoc loop last round): one graft.Verify
# JVM per query, so each query gets its own heap budget exactly like
# per-stage executor memory on a real cluster (the first round-14 attempt
# ran 18 queries in one 100 GB JVM and a single heap hog full-GC-stormed
# the whole battery).
#
# Usage: tools/sf10x_verify.sh <sfDir> <outDir> <q1> [q2 ...]
#   SF10X_XMX (default 64g) — per-query JVM heap
#   SF10X_CPUS (default 24) — local[] parallelism per query
#
# Each Verify run overwrites outDir/oracle_sql.json + verify_failed.json
# with its single-query view, so the script accumulates them into the full
# maps the DuckDB compare needs. Staleness hardening (round-16, closing an
# ADVICE item): stale maps from a prior run are removed up front, each
# Verify's exit status is checked BEFORE its maps are merged (a JVM that
# crashed pre-write must surface as a failure, not silently re-merge the
# previous query's file), and the per-query maps are consumed after each
# merge so a later crash can't re-merge them either. After the loop, run:
#   DUCKDB_MATERIALIZE_CTES=1 DUCKDB_MEM=80GB DUCKDB_THREADS=24 \
#     python3 tools/check_oracle.py <outDir> <sfDir> <q1,q2,...>
set -u
SF=$1; OUT=$2; shift 2
mkdir -p "$OUT"
# A reused outDir must not seed this run with a previous run's maps.
rm -f "$OUT"/oracle_sql.json "$OUT"/verify_failed.json "$OUT"/*.acc
XMX=${SF10X_XMX:-64g}
CPUS=${SF10X_CPUS:-24}
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for q in "$@"; do
  echo "=== $q ($(date +%H:%M:%S)) ==="
  # Full log to a file, then grep the file: piping java straight into
  # `grep | head` SIGPIPEs a chatty JVM once head exits, which would
  # corrupt the very exit status checked below.
  SPARK_GRAFT_CPUS=$CPUS java $OPENS -Xmx"$XMX" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$SF" "$OUT" "$q" >"$OUT/$q.log" 2>&1
  rc=$?
  grep -E "\[verify\]|Exception" "$OUT/$q.log" | head -5
  if [ "$rc" -ne 0 ]; then
    echo "!!! $q: Verify JVM exited $rc — recording failure (maps not merged)"
    python3 - "$OUT" "$q" "$rc" <<'EOF'
import json, os, sys
out, q, rc = sys.argv[1], sys.argv[2], sys.argv[3]
accp = f"{out}/verify_failed.json.acc"
acc = json.load(open(accp)) if os.path.exists(accp) else {}
acc[q] = f"Verify JVM exited {rc} before writing its maps (see {q}.log)"
json.dump(acc, open(accp, "w"))
EOF
  else
    python3 - "$OUT" <<'EOF'
import json, os, sys
out = sys.argv[1]
for f in ("oracle_sql.json", "verify_failed.json"):
    p, accp = f"{out}/{f}", f"{out}/{f}.acc"
    cur = json.load(open(p)) if os.path.exists(p) else {}
    acc = json.load(open(accp)) if os.path.exists(accp) else {}
    acc.update(cur)
    json.dump(acc, open(accp, "w"))
EOF
  fi
  # Consumed (or skipped): never leave a single-query map behind for a
  # later crashed iteration to re-merge as its own.
  rm -f "$OUT/oracle_sql.json" "$OUT/verify_failed.json"
done
# surface the accumulated maps under the names check_oracle.py reads
for f in oracle_sql.json verify_failed.json; do
  [ -f "$OUT/$f.acc" ] && mv "$OUT/$f.acc" "$OUT/$f"
done
echo "done: $OUT ($(ls "$OUT" | grep -vc 'json\|log$') query dirs)"
