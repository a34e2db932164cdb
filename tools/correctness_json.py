#!/usr/bin/env python3
"""Convert a check_oracle.py log into a driver-style CORRECTNESS json.

Usage: python3 tools/correctness_json.py <check_oracle_log> <verify_out_dir> <out_json>

`  OK  name (N rows)` lines become rows/schema/hash = true entries;
`FAIL name: msg` lines become false entries with the message as err.
Queries present in the verify dump but absent from the oracle (the
golden-pinned NLP four) are recorded as err: no_oracle with their
spark row count, exactly like the driver does.
"""
import glob
import json
import os
import re
import sys

import pyarrow.parquet as pq


def main():
    log_path, out_dir, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    res = {}
    for line in open(log_path):
        m = re.match(r"\s+OK\s+(\S+) \((\d+) rows(?:, columnar)?\)", line)
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
        files = glob.glob(f"{d}*.parquet")
        n = sum(pq.read_metadata(f).num_rows for f in files) if files else None
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
    print(f"{dst}: {len(res)} entries, {ok} hash-green, "
          f"{len(missing)} missing from log")


if __name__ == "__main__":
    main()
