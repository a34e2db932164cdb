#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet written by `graft.Verify`, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the raw sf tables, and
compares: schema (column names sorted), row count, and exact values both
in emitted row order and under a canonical sort. Exits nonzero on any
mismatch so it can gate commits.
"""
import glob
import json
import math
import os
import re
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# Above this row count the per-row tuple compare (O(rows·cols) Python
# objects — the sf10x w1_window_running compare held ~50 GB for >1 h) is
# replaced by a columnar pyarrow FAST-ACCEPT: if the columnar pass says
# equal, the tuple pass would have too (proof in columnar_equal); on any
# non-accept we fall back to the tuple path for the authoritative verdict,
# so gate SEMANTICS are unchanged — only the green path got ~10× cheaper.
COLUMNAR_MIN_ROWS = 200_000

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bool):
        return "b:" + str(v)
    return str(v)


def columnar_equal(got, exp, cols):
    """Fast-ACCEPT columnar equivalent of the emitted-order tuple compare.

    Returns True only when every column is canon-equal row-for-row, under
    exactly the tuple path's semantics:
      * null == null (canon "NULL"), and null != any value;
      * floats compare by repr → bit-pattern equality after a lossless cast
        to float64 (so 0.0 != -0.0, matching repr), EXCEPT NaN == NaN
        (canon maps every NaN payload to "NaN");
      * every other type compares by value (canon str() is injective for
        the int/str/bool/date/timestamp/list outputs the battery emits —
        distinct values never share a str()).
    Any uncertainty (unsupported type, compute error) returns False and the
    caller re-checks with the authoritative tuple path — this function can
    only turn a slow green into a fast green, never flip a verdict.
    """
    try:
        for c in cols:
            a = got.column(c).combine_chunks()
            b = exp.column(c).combine_chunks()
            na, nb = pc.is_null(a), pc.is_null(b)
            if not pc.all(pc.equal(na, nb)).as_py():
                return False
            if pa.types.is_floating(a.type) or pa.types.is_floating(b.type):
                if not (pa.types.is_floating(a.type)
                        and pa.types.is_floating(b.type)):
                    return False  # float-vs-nonfloat: let the tuple path rule
                af = a.cast(pa.float64())
                bf = b.cast(pa.float64())
                bits_eq = pc.equal(af.view(pa.int64()), bf.view(pa.int64()))
                both_nan = pc.and_(pc.fill_null(pc.is_nan(af), False),
                                   pc.fill_null(pc.is_nan(bf), False))
                ok = pc.or_(pc.fill_null(bits_eq, True), both_nan)
            else:
                ok = pc.fill_null(pc.equal(a, b), True)  # masks already equal
            if not pc.all(ok).as_py():
                return False
        return True
    except Exception:
        return False


def pandas_dtype_probe(tbl):
    """Per-column pandas dtype the DRIVER's to_pandas() would produce,
    without materializing the full frame. pandas' dtype choice depends only
    on the arrow type and whether the column contains any null (int64 with
    a null → float64), so a 1-row probe preserving null-presence is exact."""
    probe = pa.table({
        c: (pa.array([None], type=tbl.column(c).type)
            if tbl.column(c).null_count else tbl.column(c).slice(0, 1))
        for c in tbl.column_names})
    return {c: str(d) for c, d in probe.to_pandas().dtypes.items()}


def pandas_dtypes(tbl, cols, large):
    """Dtype map for the driver-pandas audit. On the large path try the
    1-row probe first, but NEVER let a probe failure (an arrow type that
    errors in to_pandas, a future null-probe edge) crash the whole gate —
    fall back to the authoritative full to_pandas derivation, mirroring
    how columnar_equal downgrades to the tuple path on any exception
    (round-14 ADVICE: the probe ran unguarded)."""
    if large:
        try:
            return pandas_dtype_probe(tbl)
        except Exception as e:
            print(f"  .. dtype probe failed ({type(e).__name__}: "
                  f"{str(e)[:120]}); full to_pandas fallback", flush=True)
    pd_frame = tbl.to_pandas()
    return {c: str(pd_frame[c].dtype) for c in cols}


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    # Optional 3rd arg: comma-separated query subset (long-run resume after
    # a crash — e.g. the sf1 battery dying on host memory pressure — or dev
    # iteration). The full battery remains the default gate.
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    # Long-battery robustness (the sf1 run): an unbounded DuckDB aborted the
    # whole compare twice — once on host memory pressure (Arrow malloc), once
    # on thread exhaustion (std::system_error EAGAIN). Bound both; override
    # via env when the defaults are wrong for a host.
    con.execute(f"SET threads TO {os.environ.get('DUCKDB_THREADS', '16')}")
    con.execute(
        f"SET memory_limit = '{os.environ.get('DUCKDB_MEM', '48GB')}'")
    # Per-process spill dir: two concurrent compares sharing the default
    # cwd/.tmp delete each other's temp files mid-spill (observed crash:
    # 'Could not remove file .tmp/duckdb_temp_storage-0.tmp').
    con.execute(f"SET temp_directory = '/tmp/duckdb_tmp_{os.getpid()}'")
    for t in TABLES:
        # driver testdata is one file per table; ReplicateSf output is a
        # Spark directory of part files — glob it in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []

    def fail(name, msg):
        # print immediately AND collect: a mid-battery crash (the sf1 run
        # died twice on host limits) must not swallow already-found reds
        print(f"FAIL {name}: {msg}", flush=True)
        failures.append((name, msg))
    # graft.Verify records query-construction/execution failures in a
    # sidecar (round-8 hardening: failures used to vanish from artifacts
    # entirely). Surface each as an explicit gate failure.
    try:
        for name, sig in sorted(json.load(
                open(f"{out_dir}/verify_failed.json")).items()):
            fail(name, f"VERIFY failed: {sig.splitlines()[0][:200]}")
    except FileNotFoundError:
        pass
    # DuckDB INLINES every CTE reference: the graph oracles' shared edge
    # build (a 6M-row self-join) is re-planned per reference, which at sf1
    # turned a 12 s query into 80+ CPU-minutes and a 65 GB disk spill.
    # DUCKDB_MATERIALIZE_CTES=1 rewrites `name AS (` → `name AS
    # MATERIALIZED (` (an optimization fence only — results identical;
    # WINDOW clauses excluded). Off by default so the gate exercises the
    # driver's exact SQL at the driver's scale.
    mat = os.environ.get("DUCKDB_MATERIALIZE_CTES") == "1"
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        if mat:
            sql = re.sub(r"(?<!WINDOW )(\b\w+ AS) \(", r"\1 MATERIALIZED (",
                         sql)
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fail(name, "no spark output")
            continue
        got = pq.read_table(sorted(files)[0])
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            fail(name, f"oracle SQL failed: {str(e)[:200]}")
            continue
        # Output-type discipline (round-12 pin, the round-11 red class): NO
        # result column may be DECIMAL/HUGEINT on EITHER engine. Both sides
        # arrive here via arrow, where duck HUGEINT and spark decimal(38,0)
        # symmetrically land as decimal128 and compare clean — but the
        # DRIVER's canonicalization takes duckdb .df() (HUGEINT → float64)
        # against spark parquet (decimal → object), hashing "x.0" vs "x":
        # exactly the a25_spearman/ev_cusum_cp/ev_mk_trend round-11 reds,
        # invisible to the value compare below. DECIMAL is for internal
        # accumulation only; final selects CAST to BIGINT/DOUBLE (the
        # gr_hits discipline). Scala-side twin: QuerySchemaShapeSpec.
        dec_cols = (
            [f"spark.{f.name}:{f.type}" for f in got.schema
             if "decimal" in str(f.type)] +
            [f"duck.{f.name}:{f.type}" for f in exp.schema
             if "decimal" in str(f.type)])
        if dec_cols:
            fail(name, "DECIMAL output column (driver-hash-unsafe, CAST "
                       "the final select): " + ", ".join(dec_cols))
            continue
        g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
        if g_cols != e_cols:
            fail(name, f"schema: spark={g_cols} duck={e_cols}")
            continue
        if got.num_rows != exp.num_rows:
            fail(name, f"rows: spark={got.num_rows} duck={exp.num_rows}")
            continue
        large = got.num_rows >= COLUMNAR_MIN_ROWS
        # Dtype audit replicating the DRIVER's comparison path: the driver
        # converts both sides to pandas before hashing, where DuckDB HUGEINT
        # (e.g. sum(BIGINT) → INT128) silently lands as float64 while the
        # Spark parquet stays int64 — values then hash as "5.0" vs "5" even
        # when bitwise-identical (round-6 gr_pagerank/ta_pack incident).
        # Symmetric coercion (nullable int64 → float64 on BOTH sides) is
        # fine; only asymmetric coercion is a comparator bug. Above the
        # columnar threshold the dtypes come from a 1-row null-presence
        # probe (pandas_dtype_probe) instead of materializing 60M rows.
        g_dt = pandas_dtypes(got, g_cols, large)
        e_dt = pandas_dtypes(exp, e_cols, large)
        dtype_bad = [
            c for c in g_cols
            if g_dt[c] != e_dt[c] and {g_dt[c], e_dt[c]} & {"float64"}]
        if dtype_bad:
            fail(name, "DTYPE asymmetry (driver-pandas path): " + ", ".join(
                f"{c}: spark={g_dt[c]} duck={e_dt[c]}" for c in dtype_bad))
            continue
        if large and columnar_equal(got, exp, g_cols):
            print(f"  OK  {name} ({got.num_rows} rows, columnar)",
                  flush=True)
            continue
        g_rows = [tuple(canon(got.column(c)[i].as_py()) for c in g_cols)
                  for i in range(got.num_rows)]
        e_rows = [tuple(canon(exp.column(c)[i].as_py()) for c in e_cols)
                  for i in range(exp.num_rows)]
        if g_rows == e_rows:
            print(f"  OK  {name} ({got.num_rows} rows)", flush=True)
        elif sorted(g_rows) == sorted(e_rows):
            fail(name, "values match but ROW ORDER differs")
        else:
            diffs = [(i, a, b) for i, (a, b) in
                     enumerate(zip(g_rows, e_rows)) if a != b][:3]
            fail(name, f"VALUE mismatch, first diffs: {diffs}")
    print()
    if failures:
        for n, msg in failures:
            print(f"FAIL {n}: {msg}")
        sys.exit(1)
    n = len(oracle) if only is None else len(only & set(oracle))
    print(f"all {n} oracle queries match")


if __name__ == "__main__":
    main()
