#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage:
  python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

<verify_out_dir> must contain <name>/ parquet dirs + oracle_sql.json, as
written by `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"`.
Compares each query's Spark parquet against its DuckDB oracle run on the
same testdata: column names (sorted), row count, and exact values in row
order after sorting columns by name (the driver hashes in that order).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver hashes formatted values; exact doubles expected after rounding
        return repr(v)
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            ocur = con.execute(sql)
            ocols = [d[0] for d in ocur.description]
            orows = ocur.fetchall()
            scur = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in scur.description]
            srows = scur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        # The driver hashes values in ROW ORDER — compare the same way so a
        # Spark/oracle ORDER BY divergence fails HERE, not only at the gate.
        # (Verify writes coalesce(1) single-part parquet, so glob-enumeration
        # order is not a factor for the Spark side.) When only the order
        # differs, say so explicitly — it is the bug class that keeps biting.
        ov = [tuple(canon(r[i]) for i in operm) for r in orows]
        sv = [tuple(canon(r[i]) for i in sperm) for r in srows]
        if len(ov) != len(sv):
            print(f"FAIL {name}: rows spark={len(sv)} oracle={len(ov)}")
            n_fail += 1
        elif ov != sv:
            bad = next(i for i in range(len(ov)) if ov[i] != sv[i])
            kind = ("ORDER-ONLY mismatch (same multiset, different row order "
                    "— check the ORDER BY / tiebreaks)"
                    if sorted(ov, key=repr) == sorted(sv, key=repr)
                    else "value mismatch")
            print(f"FAIL {name}: {kind}; first diff at row {bad}:\n"
                  f"  spark : {sv[bad]}\n  oracle: {ov[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sv)} rows)")
            n_pass += 1
    for name in sorted(only - set(oracle)):
        print(f"SKIP {name}: no oracle")
        n_skip += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
