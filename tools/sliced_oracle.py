#!/usr/bin/env python3
"""Doc-range-sliced DuckDB oracle compare for per-document queries whose
monolithic oracle plan cannot fit the host (round-16, closing the round-15
verdict's item 3).

ta_nb_langid's oracle holds one ordered list per (doc, lang) inside a
single non-spillable aggregate — ~600M list elements at sf10x, which
OOM'd a 90 GB DuckDB twice in round 15. But the query is PER-DOCUMENT:
every output row depends only on its own doc's rows plus four
corpus-GLOBAL statistics (ctf / cls / vocab / pri). So the oracle is run
in doc_id slices — the same bounded-compare idea as the sf10x
w1_window_running value-by-value compare — with the global statistics
materialized ONCE as temp tables so every slice sees the exact
whole-corpus values:

  * ta_rake      — every CTE is per-doc; the committed oracle SQL runs
                   VERBATIM per slice against a doc_id-filtered
                   `documents` view (zero text edits).
  * ta_nb_langid — tf/ctf/cls/vocab/pri materialize once over the FULL
                   corpus; the only edit to the committed SQL is a
                   doc_id range predicate textually injected into the
                   `contrib` CTE's scan of tf. Every expression, fold
                   order, and tie-break is byte-identical to the
                   committed oracle text.

Each slice's arrow result is compared against the matching doc_id slice
of the Spark dump under check_oracle.py's exact canon semantics
(columnar fast-accept + tuple fallback). Output lines are
`  OK  <name> (<rows> rows, sliced)` / `FAIL <name>: ...` so
tools/correctness_json.py ingests them unchanged.

Usage:
  DUCKDB_MEM=80GB DUCKDB_THREADS=24 python3 tools/sliced_oracle.py \
      <verify_out_dir> <sf_dir> <query> [n_slices]
"""
import json
import os
import re
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon, columnar_equal, COLUMNAR_MIN_ROWS  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def read_dump(out_dir, name):
    import glob
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        sys.exit(f"FAIL {name}: no spark output")
    return pq.read_table(files[0])


def compare_slice(name, i, got, exp):
    """check_oracle.py's value gate on one slice; returns error or None."""
    g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
    if g_cols != e_cols:
        return f"slice {i} schema: spark={g_cols} duck={e_cols}"
    if got.num_rows != exp.num_rows:
        return f"slice {i} rows: spark={got.num_rows} duck={exp.num_rows}"
    if got.num_rows >= COLUMNAR_MIN_ROWS and columnar_equal(got, exp, g_cols):
        return None
    g_rows = [tuple(canon(got.column(c)[j].as_py()) for c in g_cols)
              for j in range(got.num_rows)]
    e_rows = [tuple(canon(exp.column(c)[j].as_py()) for c in e_cols)
              for j in range(exp.num_rows)]
    if g_rows == e_rows:
        return None
    if sorted(g_rows) == sorted(e_rows):
        return f"slice {i}: values match but ROW ORDER differs"
    diffs = [(j, a, b) for j, (a, b) in
             enumerate(zip(g_rows, e_rows)) if a != b][:3]
    return f"slice {i} VALUE mismatch, first diffs: {diffs}"


def main():
    out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    n_slices = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('DUCKDB_THREADS', '16')}")
    con.execute(
        f"SET memory_limit = '{os.environ.get('DUCKDB_MEM', '48GB')}'")
    con.execute(f"SET temp_directory = '/tmp/duckdb_tmp_{os.getpid()}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        alias = "documents_all" if t == "documents" else t
        con.execute(
            f"CREATE VIEW {alias} AS SELECT * FROM read_parquet('{path}')")

    # Slice bounds: exact doc_id quantiles so slices stay even under the
    # replica's shifted-id layout. Half-open [lo, hi); last slice closes.
    qs = [i / n_slices for i in range(n_slices + 1)]
    bounds = con.execute(
        "SELECT quantile_disc(doc_id, ?) FROM documents_all", [qs]
    ).fetchone()[0]
    bounds[-1] = bounds[-1] + 1  # make the final bound exclusive-safe

    got_all = read_dump(out_dir, name)
    if "doc_id" not in got_all.column_names:
        sys.exit(f"FAIL {name}: sliced compare needs a doc_id column")

    if name == "ta_nb_langid":
        # Materialize the corpus-global statistics ONCE, verbatim from the
        # committed CTE texts, then rewrite the final query to read them as
        # temp tables with the slice predicate injected into contrib's tf
        # scan — the one and only text edit.
        m = re.match(
            r"WITH tf AS \((?P<tf>.*?)\),\s*"
            r"ctf AS \((?P<ctf>.*?)\),\s*"
            r"cls AS \((?P<cls>.*?)\),\s*"
            r"vocab AS \((?P<vocab>.*?)\),\s*"
            r"pri AS \((?P<pri>.*?)\),\s*"
            r"contrib AS \((?P<contrib>.*?)\),\s*"
            r"sc AS \((?P<sc>.*?)\),\s*"
            r"fin AS \((?P<fin>.*?)\)\s*"
            r"(?P<final>SELECT .*)$", sql, re.S)
        if not m:
            sys.exit(f"FAIL {name}: oracle text no longer matches the "
                     "committed CTE layout — update tools/sliced_oracle.py")
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_all")
        for t in ("tf", "ctf", "cls", "vocab", "pri"):
            con.execute(f"CREATE TEMP TABLE {t} AS {m.group(t)}")
            print(f"  .. materialized {t}", flush=True)
        contrib = m.group("contrib")
        inj = contrib.replace(
            "FROM tf JOIN ctf USING (term)",
            "FROM (SELECT * FROM tf WHERE doc_id >= __LO__ AND doc_id < __HI__)"
            " tf JOIN ctf USING (term)")
        if inj == contrib:
            sys.exit(f"FAIL {name}: contrib injection point not found")
        slice_sql_tpl = (f"WITH contrib AS ({inj}), sc AS ({m.group('sc')}),"
                         f" fin AS ({m.group('fin')}) {m.group('final')}")

        def run_slice(lo, hi):
            q = (slice_sql_tpl.replace("__LO__", str(lo))
                 .replace("__HI__", str(hi)))
            return con.execute(q).fetch_arrow_table()
    else:
        # Fully per-doc query: re-point the `documents` view per slice and
        # run the committed SQL verbatim.
        def run_slice(lo, hi):
            con.execute(
                "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                f"documents_all WHERE doc_id >= {lo} AND doc_id < {hi}")
            return con.execute(sql).fetch_arrow_table()

    total = 0
    for i in range(n_slices):
        lo, hi = bounds[i], bounds[i + 1]
        if i > 0 and lo == bounds[i - 1]:
            continue  # duplicate quantile (degenerate id domain)
        exp = run_slice(lo, hi)
        ids = got_all.column("doc_id")
        mask = pc.and_(pc.greater_equal(ids, pa.scalar(lo, ids.type)),
                       pc.less(ids, pa.scalar(hi, ids.type)))
        got = got_all.filter(mask)
        err = compare_slice(name, i, got, exp)
        if err:
            print(f"FAIL {name}: {err}", flush=True)
            sys.exit(1)
        total += got.num_rows
        print(f"  .. slice {i} [{lo},{hi}) OK ({got.num_rows} rows)",
              flush=True)
    if total != got_all.num_rows:
        print(f"FAIL {name}: slices covered {total} of {got_all.num_rows} "
              "dump rows — doc_id domain not fully partitioned", flush=True)
        sys.exit(1)
    print(f"  OK  {name} ({total} rows, sliced)", flush=True)


if __name__ == "__main__":
    main()
