import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from dbcut_spark.session import get_spark

    spark = get_spark("dbcut-spark-tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from dbcut_spark.catalog import TPCH_TABLES

    for t in TPCH_TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="session")
def orders_df(spark):
    """Cached orders table for the DSL property tests (one load, many
    filters)."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").persist()
    df.count()
    return df
