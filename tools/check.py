#!/usr/bin/env python3
"""Local pre-verification mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir]
Runs after `sbt package` + spark-submit of graft.Verify has produced
outDir/<name>/ parquet dirs and outDir/oracle_sql.json. Compares each
Spark result against the DuckDB oracle: column names (sorted), row
count, and value-level equality on rows sorted by all columns.
"""
import sys, json, glob, math
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    pq = f"{out}/{name}"
    try:
        spark_df = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append(name); print(f"[FAIL] {name}: no spark output: {e}"); continue
    try:
        ora_df = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f"[FAIL] {name}: oracle SQL error: {e}"); continue
    sc, oc = sorted(spark_df.columns), sorted(ora_df.columns)
    if sc != oc:
        fails.append(name); print(f"[FAIL] {name}: cols {sc} vs {oc}"); continue
    if len(spark_df) != len(ora_df):
        fails.append(name)
        print(f"[FAIL] {name}: rows {len(spark_df)} vs {len(ora_df)}"); continue
    a = spark_df[sc].copy(); b = ora_df[sc].copy()
    # normalize: lists -> tuples for sorting/compare. The DRIVER's harness
    # does NOT do this — it crashes on array columns (unhashable ndarray,
    # see CORRECTNESS_r01) — so needing the workaround predicts a driver
    # failure and must FAIL here, not silently pass.
    had_arrays = [False]
    def to_tuple(v):
        if isinstance(v, list) or type(v).__name__ == 'ndarray':
            had_arrays[0] = True
            return tuple(v)
        return v
    for c in sc:
        if a[c].dtype == object:
            a[c] = a[c].map(to_tuple)
        if b[c].dtype == object:
            b[c] = b[c].map(to_tuple)
    if had_arrays[0]:
        fails.append(name)
        print(f"[FAIL] {name}: array-typed output column — driver's "
              f"compare would crash (serialize to a scalar)")
        continue
    a = a.sort_values(by=sc, na_position='first').reset_index(drop=True)
    b = b.sort_values(by=sc, na_position='first').reset_index(drop=True)
    bad = 0
    for c in sc:
        av, bv = a[c], b[c]
        # STRICT dtype-kind agreement: the driver hashes raw values, so
        # int64 3 vs float64 3.0 (e.g. a DuckDB HUGEINT sum surfacing as
        # float) or a Decimal object MUST fail here like it fails there.
        # Round 2's three "local green, driver red" queries were all this.
        ak, bk = av.dtype.kind, bv.dtype.kind
        if ak != bk:
            bad += len(av)
            print(f"  dtype {name}.{c}: spark kind '{ak}' vs oracle kind "
                  f"'{bk}' — driver hash would mismatch")
            continue
        if ak == 'f':
            import numpy as np
            eq = np.isclose(av.astype(float), bv.astype(float),
                            rtol=0, atol=0, equal_nan=True)
            exact_bad = int((~eq).sum())
            if exact_bad:
                bad += exact_bad
                i = int(np.argmax(~eq))
                print(f"  diff {name}.{c}: {exact_bad} not bit-equal; "
                      f"@row{i}: spark={av[i]!r} oracle={bv[i]!r}")
        else:
            if ak == 'O':
                nonstr = [type(v).__name__ for v in list(av.dropna()) +
                          list(bv.dropna()) if not isinstance(v, str)]
                if nonstr:
                    bad += 1
                    print(f"  type {name}.{c}: non-string objects "
                          f"{sorted(set(nonstr))} — serialize to a scalar")
                    continue
            neq = (av != bv) & ~(av.isna() & bv.isna())
            if neq.any():
                bad += int(neq.sum())
                i = neq.idxmax()
                print(f"  diff {name}.{c} @row{i}: spark={av[i]!r} oracle={bv[i]!r}")
    if bad:
        fails.append(name); print(f"[FAIL] {name}: {bad} value diffs")
    else:
        print(f"[ok]   {name}: {len(a)} rows")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
