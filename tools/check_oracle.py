#!/usr/bin/env python3
"""Dev-time replica of the driver's DuckDB oracle check.

NOT part of the shipped library (the Scala engine never calls this) —
it pre-validates SparkEntry.oracleSql against Verify.scala output so
oracle mismatches surface before the driver's round gate.

Usage: check_oracle.py [sfDir] [verifyOutDir] [only]
where `only` is an optional comma-separated query-name filter
(mirrors Verify's dev-only 3rd arg) for incremental re-checks —
a full sf1 replay runs ~50 min, a single query seconds.
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if (a is None) != (b is None):
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: protocol guarantees bit-identity
    return str(a) == str(b)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
            # Protocol lint (round-1 gate lesson): DECIMAL-typed output
            # columns hash-mismatch in the driver even when the pandas
            # cell-compare below false-greens them. Ban them outright.
            types = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out}/{name}/*.parquet')"
            ).fetchall()
            dec = [c for c, t, *_ in types if "DECIMAL" in t.upper()]
            if dec:
                print(f"FAIL {name}: DECIMAL output column(s) {dec} "
                      "(banned: driver hash-mismatches decimals)")
                n_fail += 1
                continue
            # Round-6 gate lesson (q255): array/map/struct-typed output
            # columns crash the driver's pandas sort (unhashable ndarray).
            # Ban nested OUTPUT types outright — serialize to a string.
            nested = [c for c, t, *_ in types
                      if any(k in t.upper() for k in ("[]", "STRUCT", "MAP("))]
            if nested:
                print(f"FAIL {name}: nested output column(s) {nested} "
                      "(banned: driver oracle can't sort array/map/struct "
                      "cells — serialize with array_join/concat_ws)")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            ref = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        mc, rc = sorted(mine.columns), sorted(ref.columns)
        if mc != rc:
            print(f"FAIL {name}: columns {mc} vs oracle {rc}")
            n_fail += 1
            continue
        mine, ref = mine[mc], ref[mc]
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs oracle {len(ref)}")
            n_fail += 1
            continue
        bad = None
        mv, rv = mine.values, ref.values
        for i in range(len(mine)):
            for j in range(len(mc)):
                if not cells_equal(mv[i][j], rv[i][j]):
                    bad = (i, mc[j], mv[i][j], rv[i][j])
                    break
            if bad:
                break
        if bad:
            i, cname, a, b = bad
            print(f"FAIL {name}: row {i} col {cname}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} with oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
