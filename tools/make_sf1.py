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

Organic mode (`--organic`, r15): the plain replication makes every
document/embedding a 10-way EXACT duplicate, so the dedup families get
measured on their degenerate worst case (candidate buckets 10x denser,
true pairwise work inside them up to 100x). Organic mode remaps the
CONTENT per copy so replicas are not duplicates while every
distribution the operators care about is preserved:
  - documents.text: per-copy Caesar shift of the letters (word-level
    key shifting that is LENGTH-preserving, so n_chars, token counts,
    word-length and punctuation distributions are identical; the
    vocabulary grows 10x like organically grown data, and the
    within-copy duplicate structure of sf0.1 is kept verbatim);
  - embeddings.embedding: per-copy circular rotation of the vector
    (norm- and pairwise-geometry-preserving within a copy, decorrelated
    across copies — 10 independent corpora of the same shape).
Keys shift identically to the plain mode; events/orders/lineitem carry
no dedup-relevant content and replicate unchanged.

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [--organic]
"""
import os
import sys

import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
organic = "--organic" in sys.argv[1:]
src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
dst = args[1] if len(args) > 1 else ("/tmp/sf1_organic" if organic else "/tmp/sf1")
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

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def content_remap(t, i):
    """Per-copy content expression for organic mode (None = as-is)."""
    if not organic or i == 0:
        return None
    if t == "documents":
        lo = LOWER[i:] + LOWER[:i]
        up = UPPER[i:] + UPPER[:i]
        return (f"translate(text, '{LOWER}{UPPER}', '{lo}{up}') AS text")
    if t == "embeddings":
        # circular rotation by i positions (1-based list slicing)
        return (f"list_concat(embedding[{i + 1}:], "
                f"embedding[1:{i}]) AS embedding")
    return None


for t in dims:
    con.execute(
        f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
        " (FORMAT PARQUET)")
    print(f"[sf1] {t}: copied")

for t, keys in facts.items():
    arms = []
    for i in range(COPIES):
        repl = ", ".join(f"{k} + {i} * {SHIFT} AS {k}" for k in keys)
        remap = content_remap(t, i)
        if remap:
            repl += ", " + remap
        arms.append(f"SELECT * REPLACE ({repl}) FROM '{src}/{t}.parquet'")
    union = "\nUNION ALL\n".join(arms)
    con.execute(
        f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"[sf1] {t}: {n} rows")
print(f"[sf1] done -> {dst} (organic={organic})")
