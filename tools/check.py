#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark). Runs each oracle_sql.json query in
DuckDB over the same sf dir and compares against the Spark parquet dump
written by graft.Verify: row count, column names, and values (columns
sorted by name; exact match for non-floats, tiny-epsilon report for
floats so rounding-boundary risks surface early).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        errs = []
        wc, gc = sorted(want.columns), sorted(got.columns)
        if wc != gc:
            errs.append(f"columns want={wc} got={gc}")
        elif len(want) != len(got):
            errs.append(f"rows want={len(want)} got={len(got)}")
        else:
            want, got = want[wc], got[wc]
            for c in wc:
                for i, (w, g) in enumerate(zip(want[c], got[c])):
                    if w is None and g is None:
                        continue
                    wf = isinstance(w, float)
                    if wf and isinstance(g, float):
                        if math.isnan(w) and math.isnan(g):
                            continue
                        if w != g:
                            errs.append(
                                f"row {i} col {c}: want {w!r} got {g!r} "
                                f"(diff {abs(w-g):.2e})")
                    elif str(w) != str(g):
                        errs.append(f"row {i} col {c}: want {w!r} got {g!r}")
                    if len(errs) > 3:
                        break
                if len(errs) > 3:
                    break
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:4]))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
