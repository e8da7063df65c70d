"""Local replica of the driver's correctness gate.

Runs every registered query through Spark and its oracle through
DuckDB on the same parquet tables, then compares:
  - row count
  - column names (sorted)
  - values: rows sorted by all columns, floats compared with tolerance,
    everything else exactly.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    if isinstance(value, bool):
        return bool(value)
    if hasattr(value, "isoformat"):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(normalize(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, normalize(v)) for k, v in value.items()))
    return value


def sort_key(row):
    return tuple((v is None, str(v)) for v in row)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted(
        (tuple(normalize(r[i]) for i in order) for r in spark_rows), key=sort_key
    )
    d = sorted(
        (tuple(normalize(r[i]) for i in dorder) for r in duck_rows), key=sort_key
    )
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s, d)):
        if not all(values_equal(a, b) for a, b in zip(sr, dr)):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={sr} duck={dr}")
    if n_bad:
        problems.append(f"{n_bad}/{len(s)} rows differ")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from helium_etl_lite_spark import registry
    from helium_etl_lite_spark.session import get_spark

    registry.load_all()
    spark = get_spark("oracle_check")
    con = duck_connection(sf_dir)

    names = [n for n in sorted(registry.QUERIES) if not only or n in only]
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = registry.QUERIES[name](spark, sf_dir)
            spark_cols = sdf.columns
            # The driver's canonicalizer pandas-sorts rows by every
            # column and crashes on unhashable cells (round 1's one ERR:
            # an array column). Enforce flat scalar outputs here so that
            # class of failure is caught before the driver sees it.
            complex_cols = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                print(f"FAIL  {name}: non-scalar output columns {complex_cols} "
                      "(driver canonicalizer cannot sort/hash these)")
                n_fail += 1
                continue
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in registry.ORACLES:
            print(f"rows  {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(registry.ORACLES[name])
            duck_cols = [c[0] for c in res.description]
            duck_rows = res.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if problems:
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
