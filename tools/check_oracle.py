"""Local replica of the driver's correctness gate.

Runs every registered query through Spark and its oracle through
DuckDB on the same parquet tables, then compares:
  - row count
  - column names (sorted)
  - per-column pandas dtype CLASS (int widths normalized; int vs float
    vs bool vs timestamp vs object-python-type must agree) — this is
    the driver-faithful part: the driver canonicalizes both sides via
    pandas and hash-compares, so DuckDB sign()->TINYINT->int8 vs Spark
    signum->float64, or SUM(int)->HUGEINT->float64 vs Spark bigint,
    FAIL there even when every cell value is numerically identical.
    Round 2 shipped three such false-greens; this check predicts them.
  - values: rows sorted by all columns, floats compared with tolerance,
    everything else exactly.

Both sides are materialized with pandas (Spark `toPandas()`, DuckDB
`.df()`) because that is how the driver sees them; `.collect()` hides
the dtype layer entirely.

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

# Dtype-class pairs tolerated because the driver demonstrably tolerates
# them (a query shipping the pair has a green driver entry in
# CORRECTNESS_r01/r02). Kept deliberately tiny — when in doubt, FAIL
# here and cast the oracle instead.
TOLERATED_PAIRS: set[frozenset[str]] = {
    # Spark DateType -> pandas object[datetime.date]; DuckDB DATE ->
    # datetime64.  date_funcs / win_* date outputs passed the driver.
    frozenset({"obj:date", "timestamp"}),
}


def dtype_class(dtype, series) -> str:
    """Collapse a pandas dtype to the class the driver's hash is
    sensitive to.  int widths (int8..int64, unsigned) all map to "int":
    VERDICT r2 shows int32-vs-int64 passing while int-vs-float and
    int-vs-int8-formatted-as-float fail."""
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "timestamp"
    if k == "m":
        return "timedelta"
    for v in series:
        if v is None:
            continue
        if isinstance(v, float) and math.isnan(v):
            continue
        return f"obj:{type(v).__name__}"
    return "obj:empty"


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
        s = value.isoformat()
        # DuckDB `.df()` renders DATE as midnight datetime64 while Spark
        # yields datetime.date; the driver hashes these equal (date_funcs
        # passed its gate in r2), so canonicalize midnight-without-tz to
        # the date string on both sides.
        if s.endswith("T00:00:00"):
            s = s[: -len("T00:00:00")]
        return s
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


def _null_to_none(v):
    # pandas NaT / numpy nan already handled by normalize; pd.NA is not.
    try:
        import pandas as pd

        if v is pd.NaT or v is pd.NA:
            return None
    except Exception:
        pass
    return v


def compare(name: str, spark_pdf, duck_pdf) -> list[str]:
    problems = []
    spark_cols = list(spark_pdf.columns)
    duck_cols = list(duck_pdf.columns)
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    # Driver-faithful dtype check.
    for col in sorted(spark_cols):
        sc = dtype_class(spark_pdf[col].dtype, spark_pdf[col])
        dc = dtype_class(duck_pdf[col].dtype, duck_pdf[col])
        if sc != dc and frozenset({sc, dc}) not in TOLERATED_PAIRS:
            problems.append(
                f"dtype: {col} spark={spark_pdf[col].dtype}({sc}) "
                f"duck={duck_pdf[col].dtype}({dc}) — cast the oracle"
            )
    if problems:
        return problems
    order = sorted(spark_cols)
    s_rows = [
        tuple(normalize(_null_to_none(v)) for v in row)
        for row in spark_pdf[order].itertuples(index=False, name=None)
    ]
    d_rows = [
        tuple(normalize(_null_to_none(v)) for v in row)
        for row in duck_pdf[order].itertuples(index=False, name=None)
    ]
    s = sorted(s_rows, key=sort_key)
    d = sorted(d_rows, key=sort_key)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s, d)):
        if not all(values_equal(a, b) for a, b in zip(sr, dr)):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={sr} duck={dr}")
    if n_bad:
        problems.append(f"{n_bad}/{len(s)} rows differ")
    return problems


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main():
    argv = [a for a in sys.argv[1:]]
    window = "--window" in argv
    if window:
        argv.remove("--window")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from helium_etl_lite_spark import registry
    from helium_etl_lite_spark.session import get_spark

    registry.load_all()
    spark = get_spark("oracle_check")
    con = duck_connection(sf_dir)

    if window:
        # the driver's exact gate: first 50 in registration order
        names = list(registry.QUERIES)[:50]
        if only:
            names = [n for n in names if n in only]
    else:
        names = [n for n in sorted(registry.QUERIES) if not only or n in only]
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = registry.QUERIES[name](spark, sf_dir)
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
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in registry.ORACLES:
            print(f"rows  {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            duck_pdf = con.execute(registry.ORACLES[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
