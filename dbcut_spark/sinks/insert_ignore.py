"""Idempotent writes (reference K1): INSERT-IGNORE semantics as a
left-anti join against existing target PKs.

The reference compiles INSERT with per-dialect IGNORE clauses
(``/root/reference/dbcut/compiler.py:66-78``: PG ``ON CONFLICT DO
NOTHING``, MySQL ``INSERT IGNORE``, SQLite ``INSERT OR IGNORE``). Spark's
JDBC/parquet writers have no conflict clause, so new rows are filtered
first: ``new ⟕̸ existing`` on the PK (LEFT ANTI), then appended.

Scale note: the anti-join shuffles on the PK unless the *existing-keys*
side is small enough to broadcast. For append-mostly pipelines the
existing-key set per write batch is the whole target — at 100 TB prefer
bucketed targets on the PK (`bucketBy`) so the anti-join is shuffle-free,
or partition-pruned targets where only overlapping partitions are read.
Not atomic under concurrent writers (documented divergence,
SURVEY.md §7.3.5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def anti_new_rows(new: DataFrame, existing: DataFrame, pk: list[str]) -> DataFrame:
    """Rows of ``new`` whose PK is absent from ``existing``."""
    keys = existing.select(*pk).dropDuplicates(pk)
    return new.join(keys, on=pk, how="left_anti")


def insert_ignore_parquet(
    spark: SparkSession, df: DataFrame, path: str, pk: list[str]
) -> int:
    """Append ``df`` rows to the parquet table at ``path``, skipping rows
    whose PK already exists. Returns the number of rows written."""
    df = df.dropDuplicates(pk)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        df = anti_new_rows(df, existing, pk)
    df = df.cache()
    try:
        n = df.count()
        if n:
            df.write.mode("append").parquet(path)
    finally:
        df.unpersist()
    return n


def insert_ignore_jdbc(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    pk: list[str],
    properties: dict[str, str] | None = None,
    batchsize: int = 5000,
    quote: str = '"',
) -> int:
    """JDBC variant: anti-join against the target's current PKs (pushed
    as a key-only JDBC read), then batched append. ``batchsize`` mirrors
    the reference's PG executemany page size of 5000
    (``/root/reference/dbcut/database.py:479-484``).

    Column identifiers in the key query are quoted (``quote``, pass a
    backtick for mysql): Spark's JDBC writer creates delimited —
    case-preserved — column names, and databases that uppercase unquoted
    identifiers (Derby, Oracle, DB2) would otherwise fail to resolve
    them. The table name is passed through verbatim, exactly as it was
    given to the writer's ``dbtable`` (which Spark also leaves
    unquoted)."""
    props = dict(properties or {})
    q = quote
    key_cols = ", ".join(f"{q}{c}{q}" for c in pk)
    existing = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", f"SELECT {key_cols} FROM {table}")
        .options(**props)
        .load()
    )
    # join strategy left to Spark/AQE: the existing-PK set is the WHOLE
    # target table's keys — forcing a broadcast would push millions of
    # rows through the driver (8 GB broadcast cap / driver OOM) on a
    # large target, the same reasoning as the parquet variant above
    out = df.dropDuplicates(pk).join(existing, on=pk, how="left_anti")
    out = out.cache()
    try:
        n = out.count()
        if n:
            (
                out.write.format("jdbc")
                .option("url", url)
                .option("dbtable", table)
                .option("batchsize", str(batchsize))
                .options(**props)
                .mode("append")
                .save()
            )
    finally:
        out.unpersist()
    return n


def upsert_parquet(
    spark: SparkSession, df: DataFrame, path: str, pk: list[str]
) -> tuple[int, int]:
    """MERGE semantics for a parquet target: incoming rows replace
    existing rows with the same PK (update) or append (insert).
    Implemented as existing-minus-incoming (left-anti on the PK) union
    incoming, written to a staging directory then atomically swapped —
    the standard rewrite shape for formats without row-level updates.
    Returns (updated, inserted) counts.

    Scale note: this rewrites the table; on a partitioned 100 TB target
    restrict the rewrite to the partitions the incoming keys touch
    (dynamic partition overwrite) — same plan, pruned scan. Not atomic
    under concurrent writers (same caveat as insert-ignore), and like
    any rewrite-based format, DataFrames built over the old files are
    invalid after the swap (the session's own listing cache is
    refreshed here)."""
    import shutil

    df = df.dropDuplicates(pk)
    if not os.path.exists(path):
        n = df.count()
        df.write.parquet(path)
        return 0, n
    existing = spark.read.parquet(path)
    keep = anti_new_rows(existing, df, pk)
    df = df.cache()
    try:
        incoming = df.count()
        updated = incoming - anti_new_rows(df, existing, pk).count()
        staged = path + ".__staging__"
        keep.unionByName(df).write.mode("overwrite").parquet(staged)
        shutil.rmtree(path)
        os.rename(staged, path)
        # the session caches file listings per path; the swap invalidated them
        spark.catalog.refreshByPath(path)
        return updated, incoming - updated
    finally:
        df.unpersist()


def delete_keys_parquet(
    spark: SparkSession, df_keys: DataFrame, path: str, pk: list[str]
) -> int:
    """Row-level delete for a parquet target: rewrite the table minus
    the rows whose PK appears in ``df_keys`` (left-anti join). Returns
    the number of rows deleted. Same staging-swap and partition-pruning
    caveats as :func:`upsert_parquet`."""
    import shutil

    if not os.path.exists(path):
        return 0
    existing = spark.read.parquet(path)
    keys = df_keys.select(*pk).dropDuplicates(pk)
    remaining = anti_new_rows(existing, keys, pk)
    n_before = existing.count()
    staged = path + ".__staging__"
    remaining.write.mode("overwrite").parquet(staged)
    remaining2 = spark.read.parquet(staged)
    n_after = remaining2.count()
    shutil.rmtree(path)
    os.rename(staged, path)
    spark.catalog.refreshByPath(path)
    return n_before - n_after


def jdbc_insert_auto(spark, df, url: str, table: str, pk: list[str]) -> int:
    """First-contact-aware JDBC insert, shared by the CLI and the
    Engine facade: create-and-append when the table doesn't exist yet
    (Spark's JDBC append-mode writer emits the dialect's CREATE TABLE,
    mirroring the reference's ``create_all``), idempotent insert-ignore
    after. The deduped frame is cached around count+write so the
    closure DAG feeding it computes once, not once per action (the
    same guard the insert_ignore_* primitives use)."""
    from dbcut_spark.sources.jdbc import jdbc_table_exists, write_append

    if not jdbc_table_exists(spark, url, table):
        out = df.dropDuplicates(pk).cache()
        try:
            n = out.count()
            write_append(out, url, table)
        finally:
            out.unpersist()
        return n
    return insert_ignore_jdbc(spark, df, url, table, pk)
