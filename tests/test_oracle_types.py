"""Every oracle's DuckDB result types must be Spark-representable.

The driver's value-hash is type-sensitive: DuckDB widens integer SUMs
to HUGEINT (int128), which Spark cannot produce, so an uncast SUM makes
an otherwise-identical result fail hash-match (round-1 `dedup_simhash`).
This sweep fails on ANY oracle whose output includes a type outside the
Spark-expressible set, so the bug class cannot recur.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entry

# DuckDB type names with no Spark analogue (the hash-mismatch class)
_FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck_views():
    from dbcut_spark.catalog import TPCH_TABLES

    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _oracle_items():
    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_output_types_spark_representable(duck_views, name, sql):
    rel = duck_views.sql(sql)
    bad = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if str(t).upper().split("(")[0] in _FORBIDDEN
    ]
    assert not bad, (
        f"oracle '{name}' produces Spark-unrepresentable DuckDB types {bad}; "
        "CAST the offending expression (usually SUM → BIGINT)"
    )


def test_no_complex_typed_output_columns(spark, sf_dir):
    """No registered query may emit array/map/struct output columns:
    the DRIVER's canonicalizer sorts results with pandas, which raises
    `unhashable type: 'list'` on complex columns (round-4's only red
    gate row, embedding_quantize_int8). Gate queries string-render
    arrays (array_join / md5) and keep raw collections in the operator
    API. Schema-only check — builds every plan, runs no jobs."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for name, fn in entry.queries().items():
        schema = fn(spark, sf_dir).schema
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "complex-typed output columns break the driver's pandas "
        f"canonicalizer — string-render them: {offenders}"
    )
