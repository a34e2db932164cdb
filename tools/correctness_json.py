#!/usr/bin/env python3
"""Convert a check_oracle.py log into a driver-style CORRECTNESS json.

Usage: python3 tools/correctness_json.py <check_oracle_log> <verify_out_dir> <out_json> [sf_key]
       python3 tools/correctness_json.py --pin <verify_out_dir> <sf_key>

`  OK  name (N rows)` lines become rows/schema/hash = true entries;
`FAIL name: msg` lines become false entries with the message as err.

GOLDEN VERIFICATION (round-16, closing the round-15 verdict's item 4):
queries absent from the oracle map (the 4 nlp_* rows — VADER/LDA are not
SQL-expressible) used to be recorded as a permanent `err: no_oracle` even
though they are golden-pinned at three scales in the sbt suite
(GoldenPipelineSpec), which the driver gate cannot see. Now the pinned
checks are ALSO executed here, directly against the verify dump:
  * nlp_sentiment        — order-independent hash over
                           (doc_id, text, float64-bit score, label)
  * nlp_sentiment_counts — exact sorted label:count string
  * nlp_topics           — order-independent hash over
                           (topic, SORTED top-10 word set, batch_id)
  * nlp_analysis         — structural contract (exact column list, unique
                           doc_id, every row's topic_1..20 sums to 1 within
                           1e-9) + the sentiment hash over its rows
against per-sf pins in tools/golden_pins.json, emitting
`golden_match: true` (err: null) instead of the permanent err. Hash
canonicalization is pure bytes (float64 bit patterns, not decimal
formatting), so the pin is engine- and language-independent. Pin lineage:
pins are generated (--pin) from a verify dump produced by code whose
Scala-side pins (GoldenPipelineSpec: sf0.001 + sf0.1 corpus hashes,
sf0.001 label distribution, topic word sets) are green on the same
corpus — and the generator hard-asserts the sf0.001/sf0.01 label
distribution equals the spec's pinned "negative:387,neutral:113"
(sf0.01 shares sf0.001's 500-doc documents table).

Queries without an oracle AND without a golden pin for the given sf_key
still fall back to err: no_oracle with their spark row count, exactly
like the driver does.
"""
import glob
import hashlib
import json
import os
import re
import struct
import sys

import pyarrow.parquet as pq

TOOLS = os.path.dirname(os.path.abspath(__file__))
PINS_PATH = os.path.join(TOOLS, "golden_pins.json")
N_TOPICS = 20
ANALYSIS_COLS = (["doc_id", "text", "sentiment_score", "sentiment"]
                 + [f"topic_{i}" for i in range(1, N_TOPICS + 1)]
                 + ["batch_id"])
# GoldenPipelineSpec's pinned label distributions (sf0.001 and sf0.01 are
# DIFFERENT 500-doc corpora); --pin refuses to record a dump whose
# distribution disagrees with the sbt-pinned value for that corpus.
SPEC_LABEL_PINS = {"sf0.001": "negative:387,neutral:113",
                   "sf0.01": "negative:394,neutral:106"}


def _md5_sorted(rows):
    h = hashlib.md5()
    for r in sorted(rows):
        h.update(r.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def _fbits(v):
    return struct.pack("<d", float(v)).hex()


def _read(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0])


def sentiment_hash(tbl):
    cols = [tbl.column(c).to_pylist()
            for c in ("doc_id", "text", "sentiment_score", "sentiment")]
    return _md5_sorted(f"{d}|{t}|{_fbits(s)}|{l}"
                       for d, t, s, l in zip(*cols))


def counts_string(tbl):
    pairs = sorted(zip(tbl.column("sentiment").to_pylist(),
                       tbl.column("n").to_pylist()))
    return ",".join(f"{k}:{v}" for k, v in pairs)


def topics_hash(tbl):
    rows = []
    for t, w, b in zip(tbl.column("topic").to_pylist(),
                       tbl.column("words").to_pylist(),
                       tbl.column("batch_id").to_pylist()):
        rows.append(f"{t}|{' '.join(sorted(w.split(' ')))}|{b}")
    return _md5_sorted(rows)


def analysis_check(tbl):
    """Structural contract + content hash. Returns (value, err) — err set
    means the contract itself failed before any pin comparison."""
    if tbl.column_names != ANALYSIS_COLS:
        return None, f"column contract: {tbl.column_names[:6]}..."
    ids = tbl.column("doc_id").to_pylist()
    if len(set(ids)) != len(ids):
        return None, "doc_id not unique"
    topics = [tbl.column(f"topic_{i}").to_pylist()
              for i in range(1, N_TOPICS + 1)]
    for j in range(tbl.num_rows):
        s = sum(t[j] for t in topics)
        if abs(s - 1.0) > 1e-9:
            return None, f"topic row {j} sums to {s!r}, not 1"
    cols = [tbl.column(c).to_pylist()
            for c in ("doc_id", "sentiment_score", "sentiment")]
    return (f"rows={tbl.num_rows};"
            + _md5_sorted(f"{d}|{_fbits(s)}|{l}" for d, s, l in zip(*cols))), None


GOLDEN = {
    "nlp_sentiment": sentiment_hash,
    "nlp_sentiment_counts": counts_string,
    "nlp_topics": topics_hash,
    "nlp_analysis": lambda t: analysis_check(t)[0],
}


def golden_value(name, tbl):
    """Computed golden value for a dump table, or (None, err)."""
    if name == "nlp_analysis":
        return analysis_check(tbl)
    try:
        return GOLDEN[name](tbl), None
    except Exception as e:
        return None, f"golden check crashed: {type(e).__name__}: {str(e)[:150]}"


def load_pins():
    if os.path.exists(PINS_PATH):
        with open(PINS_PATH) as f:
            return json.load(f)
    return {}


def pin_mode(out_dir, sf_key):
    pins = load_pins()
    for name in GOLDEN:
        tbl = _read(out_dir, name)
        if tbl is None:
            sys.exit(f"--pin: no dump for {name} in {out_dir}")
        v, err = golden_value(name, tbl)
        if err:
            sys.exit(f"--pin: {name} fails its own contract: {err}")
        if name == "nlp_sentiment_counts" and sf_key in SPEC_LABEL_PINS \
                and v != SPEC_LABEL_PINS[sf_key]:
            sys.exit(f"--pin: {sf_key} label distribution {v!r} != the "
                     f"GoldenPipelineSpec pin {SPEC_LABEL_PINS[sf_key]!r} — "
                     "refusing to pin an unverified dump")
        pins.setdefault(name, {})[sf_key] = v
        print(f"pinned {name}[{sf_key}] = {v[:80]}")
    with open(PINS_PATH, "w") as f:
        json.dump(pins, f, indent=1, sort_keys=True)
    print(f"wrote {PINS_PATH}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--pin":
        pin_mode(sys.argv[2], sys.argv[3])
        return
    log_path, out_dir, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_key = sys.argv[4] if len(sys.argv) > 4 else "sf0.01"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    pins = load_pins()
    res = {}
    for line in open(log_path):
        m = re.match(r"\s+OK\s+(\S+) \((\d+) rows(?:, columnar|, sliced|, fixpoint)?\)", line)
        if m:
            res[m.group(1)] = {
                "rows_match": True, "schema_match": True, "hash_match": True,
                "spark_rows": int(m.group(2)), "oracle_rows": int(m.group(2)),
                "err": None}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            res[m.group(1)] = {
                "rows_match": False, "schema_match": None, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": m.group(2)[:300]}
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in res or name in oracle:
            continue
        tbl = _read(out_dir, name)
        n = tbl.num_rows if tbl is not None else None
        pin = (pins.get(name) or {}).get(sf_key)
        if tbl is not None and name in GOLDEN and pin is not None:
            v, err = golden_value(name, tbl)
            ok = err is None and v == pin
            res[name] = {
                "rows_match": ok, "schema_match": ok, "hash_match": ok,
                "golden_match": ok, "spark_rows": n, "oracle_rows": None,
                "err": None if ok else (
                    err or f"golden pin mismatch: {v[:80]} != {pin[:80]}")}
        else:
            res[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": n,
                         "oracle_rows": None, "err": "no_oracle"}
    missing = sorted(set(oracle) - set(res))
    for name in missing:
        res[name] = {"rows_match": False, "schema_match": None,
                     "hash_match": False, "spark_rows": None,
                     "oracle_rows": None, "err": "not in compare log"}
    with open(dst, "w") as f:
        json.dump(dict(sorted(res.items())), f, indent=1)
    ok = sum(1 for v in res.values() if v["hash_match"])
    golden = sum(1 for v in res.values() if v.get("golden_match"))
    print(f"{dst}: {len(res)} entries, {ok} hash-green "
          f"({golden} via golden pin), {len(missing)} missing from log")


if __name__ == "__main__":
    main()
