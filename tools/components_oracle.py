#!/usr/bin/env python3
"""Fixpoint connected-components oracle for dd_simhash_components at
replica scale (round-16).

The committed oracle computes components as a recursive-CTE transitive
closure `reach(src, dst)` and labels each node min(dst). That is exactly
connected components, but the closure materializes Σ |component|² pairs —
quadratic in component size. At the sf1 replica regime one component
holds 48,770 of 50,000 docs (measured), i.e. ~2.4 BILLION reach pairs:
a 100 GB DuckDB ground for 2+ hours toward its cap on what the engine's
linear label propagation answers in seconds. Same class as the
j9_band_join adjudication — the oracle FORM, not the operator, is
infeasible under heavy duplication.

This tool keeps the gate honest instead of dropping to an adjudication:
every CTE up to and including `star` (tok → sigv → sig → banded → sgrp →
exact_star → rep_pairs → star) is taken VERBATIM from the committed
oracle text and materialized once; only the closure is replaced by the
textbook equivalent — iterate lbl(doc) ← min(lbl(doc), min over
neighbors' lbl) to fixpoint, seeded lbl(doc)=doc — which computes the
identical min-id component labels (min-label fixpoint on an undirected
graph IS connected components, the same function the reach+min closure
evaluates) with per-round cost linear in edges. The final
component/n_members/keep_id select is the committed text's, applied to
the fixpoint labels. Rounds are logged; the loop hard-stops at 200
rounds (far above any real label-chain depth) rather than looping
forever on a cycle bug.

Result lines are `  OK  <name> (<rows> rows, fixpoint)` /
`FAIL <name>: ...` so tools/correctness_json.py ingests them unchanged.

Usage:
  DUCKDB_MEM=60GB DUCKDB_THREADS=16 python3 tools/components_oracle.py \
      <verify_out_dir> <sf_dir> [query=dd_simhash_components]
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    name = sys.argv[3] if len(sys.argv) > 3 else "dd_simhash_components"
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    marker = ",\nedges AS ("
    cut = sql.find(marker)
    if cut < 0:
        sys.exit(f"FAIL {name}: committed oracle no longer matches the "
                 "star/edges layout — update tools/components_oracle.py")
    prefix = sql[:cut]  # WITH tok AS (...), ..., star AS (...)
    if not prefix.startswith("WITH "):
        sys.exit(f"FAIL {name}: unexpected oracle prefix")

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('DUCKDB_THREADS', '16')}")
    con.execute(
        f"SET memory_limit = '{os.environ.get('DUCKDB_MEM', '48GB')}'")
    con.execute(f"SET temp_directory = '/tmp/duckdb_tmp_{os.getpid()}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    # The committed CTE chain verbatim, materialized once at `star`.
    con.execute(f"CREATE TEMP TABLE star AS {prefix} SELECT a, b FROM star")
    print("  .. star materialized "
          f"({con.execute('SELECT count(*) FROM star').fetchone()[0]} pairs)",
          flush=True)
    con.execute("CREATE TEMP TABLE edges AS "
                "SELECT a, b FROM star UNION SELECT b, a FROM star")
    con.execute("CREATE TEMP TABLE lbl AS "
                "SELECT DISTINCT a AS doc, a AS lbl FROM edges")
    for rnd in range(200):
        con.execute("""
            CREATE OR REPLACE TEMP TABLE lbl2 AS
            SELECT l.doc, least(l.lbl, coalesce(min(nl.lbl), l.lbl)) AS lbl
            FROM lbl l
            LEFT JOIN edges e ON e.a = l.doc
            LEFT JOIN lbl nl ON nl.doc = e.b
            GROUP BY l.doc, l.lbl""")
        changed = con.execute(
            "SELECT count(*) FROM lbl l JOIN lbl2 n ON l.doc = n.doc "
            "WHERE l.lbl <> n.lbl").fetchone()[0]
        con.execute("CREATE OR REPLACE TEMP TABLE lbl AS SELECT * FROM lbl2")
        print(f"  .. round {rnd}: {changed} labels changed", flush=True)
        if changed == 0:
            break
    else:
        sys.exit(f"FAIL {name}: no fixpoint after 200 rounds")

    exp = con.execute(
        "SELECT lbl AS component, count(*) AS n_members, "
        "CAST(min(doc) AS BIGINT) AS keep_id "
        "FROM (SELECT doc, lbl FROM lbl) comp "
        "GROUP BY lbl ORDER BY component").fetch_arrow_table()
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        sys.exit(f"FAIL {name}: no spark output")
    got = pq.read_table(files[0])
    g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
    if g_cols != e_cols:
        sys.exit(f"FAIL {name}: schema: spark={g_cols} duck={e_cols}")
    if got.num_rows != exp.num_rows:
        sys.exit(f"FAIL {name}: rows: spark={got.num_rows} duck={exp.num_rows}")
    g_rows = [tuple(canon(got.column(c)[i].as_py()) for c in g_cols)
              for i in range(got.num_rows)]
    e_rows = [tuple(canon(exp.column(c)[i].as_py()) for c in e_cols)
              for i in range(exp.num_rows)]
    if g_rows != e_rows:
        if sorted(g_rows) == sorted(e_rows):
            sys.exit(f"FAIL {name}: values match but ROW ORDER differs")
        diffs = [(i, a, b) for i, (a, b) in
                 enumerate(zip(g_rows, e_rows)) if a != b][:3]
        sys.exit(f"FAIL {name}: VALUE mismatch, first diffs: {diffs}")
    print(f"  OK  {name} ({got.num_rows} rows, fixpoint)", flush=True)


if __name__ == "__main__":
    main()
