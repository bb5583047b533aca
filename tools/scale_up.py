#!/usr/bin/env python3
"""Dev-time sf1-equivalent fixture builder (NOT part of the shipped
library; driver-side pyarrow only, like check_oracle.py).

The driver generates fixtures up to sf0.1; the judge's scale questions
need a 10x run. This replicates each FACT table 10x with per-copy key
shifts chosen so referential integrity holds across copies (an order's
copy joins its customer's same copy, etc.). Dimension tables
(region/nation) stay fixed, TPC-H-style, and nationkey/regionkey FKs
are left untouched. events keeps its time span (10x events in the same
window = 10x arrival rate); documents keep their text verbatim (a
10x-duplicated corpus is exactly the dedup-at-scale stress the dedup
operators are designed for).

Usage: scale_up.py [srcDir] [dstDir] [factor]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# per-table key columns to shift, with their per-copy offset. Offsets
# are far above any source key range and mutually consistent across
# tables (same column family -> same offset).
K_CUST = 10_000_000
K_ORDER = 100_000_000
K_PART = 10_000_000
K_SUPP = 10_000_000
K_DOC = 10_000_000
K_VEC = 10_000_000
K_EVENT = 100_000_000

SHIFTS = {
    "customer": {"c_custkey": K_CUST},
    "orders": {"o_orderkey": K_ORDER, "o_custkey": K_CUST},
    "lineitem": {"l_orderkey": K_ORDER, "l_partkey": K_PART, "l_suppkey": K_SUPP},
    "part": {"p_partkey": K_PART},
    "supplier": {"s_suppkey": K_SUPP},
    "events": {"event_id": K_EVENT, "user_id": K_CUST},
    "documents": {"doc_id": K_DOC},
    "embeddings": {"vec_id": K_VEC},
}
DIMS = ["region", "nation"]


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    for t in DIMS:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for k in range(FACTOR):
            cols = []
            for field in src.schema:
                col = src.column(field.name)
                if k > 0 and field.name in shifts:
                    # add_checked: a narrow key column (int32) shifted
                    # near its type max must ERROR, not wrap silently —
                    # a wrapped key corrupts FK consistency with no
                    # other symptom
                    col = pc.add_checked(
                        col, pa.scalar(k * shifts[field.name], type=field.type))
                cols.append(col)
            copies.append(pa.table(cols, schema=src.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(f"{t}: {src.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
