"""Oracle-differential tests (SURVEY §5.1): every registered query runs
through Spark AND its DuckDB oracle at sf0.001; results must match on
row count, column names, and values (floats within 1e-9).

This is a local replica of the driver's correctness gate so mismatches
surface before the driver runs at sf0.01.
"""

from __future__ import annotations

import pytest

from helium_etl_lite_spark import registry
from tools.check_oracle import compare, duck_connection

registry.load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = registry.QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if name not in registry.ORACLES:
        # rows-only contract: must run and be a stable, non-erroring plan
        assert isinstance(spark_rows, list)
        return
    res = duck.execute(registry.ORACLES[name])
    duck_cols = [c[0] for c in res.description]
    duck_rows = res.fetchall()
    problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
    assert not problems, f"{name}: {problems}"
