"""CSV and ORC source/sink pairs for document corpora (the remaining
interchange formats next to parquet and sources/jsonl.py).

CSV is the treacherous one for text corpora — documents contain
commas, quotes, and newlines — so both sides pin the full quoting
contract explicitly (quote-all + escaped quotes + multiLine read)
instead of trusting dialect defaults; a round-trip that silently
splits a document at an embedded newline is corruption, not a parse
error. Same 100 TB rules as JSONL: always pass an explicit schema on
read (inference is a full extra pass), control shard count with the
dataframe's partitioning. ORC is columnar like parquet (schema in the
footer, splittable stripes, predicate pushdown) and needs none of the
quoting care — it's here for interchange with Hive/Trino estates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dbcut_spark.sources.jsonl import DOCUMENTS_SCHEMA

_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',          # RFC 4180 doubled-quote escaping
    "quoteAll": "true",
    "multiLine": "true",    # documents contain newlines
}


def write_documents_csv(
    df: DataFrame, path: str, compression: str = "gzip", shards: int | None = None
) -> None:
    out = df.repartition(shards) if shards else df
    w = out.write.mode("overwrite").option("compression", compression)
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_documents_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    r = spark.read.schema(schema or DOCUMENTS_SCHEMA)
    for k, v in _CSV_OPTS.items():
        r = r.option(k, v)
    return r.csv(path)


def write_documents_orc(
    df: DataFrame, path: str, shards: int | None = None
) -> None:
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").orc(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
