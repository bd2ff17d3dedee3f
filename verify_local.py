#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count, column names, and an order-insensitive value hash.

Usage: python verify_local.py [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    # STRICT canonicalization (matches the grading driver): plain str()
    # per cell, no type coercion. In particular an integral float must
    # hash as '5240.0', NOT '5240' — the r01 grader caught exactly that
    # mismatch (DuckDB HUGEINT/DECIMAL -> float64) while the old
    # forgiving normalizer here hid it. Queries must emit identical
    # Python types on both engines (BIGINT/DOUBLE only — never
    # HUGEINT/DECIMAL from DuckDB).
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from pygeoops_spark.session import get_spark

    spark = get_spark("verify-local", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(rows)} rows, {spark_s:.1f}s)")
            if len(rows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        scols = [c.lower() for c in cols]
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        else:
            hs, ho = value_hash(rows, scols), value_hash(orows, ocols)
            if hs != ho:
                problems.append(f"value hash {hs} != {ho}")
                # show a few differing lines for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in rows)
                lo = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in orows)
                diff_s = [x for x in ls if x not in set(lo)][:3]
                diff_o = [x for x in lo if x not in set(ls)][:3]
                problems.append(f"spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"OK    {name}: {len(rows)} rows match ({spark_s:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
