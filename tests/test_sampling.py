"""Deterministic hash-sampling semantics (operators/sampling.py)."""

from pyspark.sql import functions as F

from dbcut_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_holdout_split,
)


def test_split_is_partition_invariant(spark, sf_dir):
    """The property RNG sampling lacks: membership must not depend on
    partition layout (or anything but the id and salt)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source")
    a = {
        r["doc_id"]: r["split"]
        for r in train_holdout_split(d, "doc_id", 0.2, salt="x").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in train_holdout_split(
            d.repartition(17, "source"), "doc_id", 0.2, salt="x"
        ).collect()
    }
    assert a == b
    frac = sum(1 for v in a.values() if v == "holdout") / len(a)
    assert 0.1 < frac < 0.3  # ~0.2 within binomial noise


def test_fraction_monotone_and_salted(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    s10 = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.1, "a").collect()}
    s30 = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.3, "a").collect()}
    assert s10 <= s30  # nested samples: growing the fraction only adds rows
    other = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.1, "b").collect()}
    assert other != s10  # a different salt draws an independent sample


def test_stratified_drops_unlisted_strata(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source")
    out = stratified_hash_sample(d, "doc_id", "source", {"src0": 1.0})
    assert out.select("source").distinct().collect() == [("src0",)]
    n_src0 = d.filter(F.col("source") == "src0").count()
    assert out.count() == n_src0  # fraction 1.0 keeps the whole stratum
