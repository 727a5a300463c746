#!/usr/bin/env python3
"""Builder-side sf1 fixture: a 10x replication of the driver's sf0.1.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md); the r13 verdict
asks for one suite-level validation pass at sf1 ("the per-operator
probes multiply single inputs, but the suite has never been measured
end-to-end above sf0.1"). This constructs sf1 the only honest way
available without the driver's generator: each FACT table is the union
of 10 copies of sf0.1 with primary/foreign keys shifted by i*10^12
(event_id; doc_id; vec_id; o_orderkey and lineitem's l_orderkey in
lockstep), dimensions copied once (facts grow, dims don't — the
realistic growth shape). Every oracle is distribution-agnostic (DuckDB
sees the same tables), so CORRECTNESS_sf1 is a true differential; the
bench numbers are a cliff check (memo sizes, broadcast thresholds,
window state), not a baseline comparison.

Usage: python3 tools/make_sf1.py [srcDir] [dstDir]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
SHIFT = 10 ** 12
COPIES = 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

dims = ["region", "nation", "customer", "supplier", "part"]
facts = {  # table -> columns shifted by i*SHIFT per copy
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
}

for t in dims:
    con.execute(
        f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
        " (FORMAT PARQUET)")
    print(f"[sf1] {t}: copied")

for t, keys in facts.items():
    repl = ", ".join(f"{k} + i * {SHIFT} AS {k}" for k in keys)
    con.execute(
        f"""COPY (
              SELECT * REPLACE ({repl})
              FROM '{src}/{t}.parquet', range({COPIES}) r(i)
            ) TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"[sf1] {t}: {n} rows")
print(f"[sf1] done -> {dst}")
