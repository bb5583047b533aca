#!/usr/bin/env python3
"""Determinism pairing check (protocol 2b): two Verify dumps must be
bit-identical per query after column+row sort. Dev tool, driver-side
pandas/pyarrow only (like check_oracle.py).

Usage: compare_dumps.py <dumpA> <dumpB>
"""
import sys, glob, os
import pandas as pd


def load(d, name):
    files = sorted(glob.glob(f"{d}/{name}/*.parquet"))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(x for x in os.listdir(a)
                   if os.path.isdir(os.path.join(a, x)))
    bad = 0
    for n in names:
        if not os.path.isdir(os.path.join(b, n)):
            print(f"MISSING {n} in {b}"); bad += 1; continue
        da, db = load(a, n), load(b, n)
        if not da.equals(db):
            print(f"DIFF {n}: {len(da)} vs {len(db)} rows"); bad += 1
    print(f"== {len(names) - bad}/{len(names)} bit-identical, {bad} diff")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
