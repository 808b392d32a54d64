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


def test_weighted_sample_extremes_and_determinism(spark, sf_dir):
    from pyspark.sql import functions as F

    from dbcut_spark.operators.sampling import weighted_hash_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = d.count()
    assert weighted_hash_sample(d, "doc_id", F.lit(1.0)).count() == n
    assert weighted_hash_sample(d, "doc_id", F.lit(0.0)).count() == 0
    # out-of-range weights clamp instead of misbehaving
    assert weighted_hash_sample(d, "doc_id", F.lit(7.5)).count() == n
    # same weight expression -> identical membership across partitionings
    a = {r[0] for r in weighted_hash_sample(d, "doc_id", F.lit(0.3)).collect()}
    b = {
        r[0]
        for r in weighted_hash_sample(d.repartition(13), "doc_id", F.lit(0.3)).collect()
    }
    assert a == b and 0 < len(a) < n


def test_pack_sequences_semantics(spark):
    from pyspark.sql import functions as F

    from dbcut_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, "s0" if i < 50 else "s1", 10 + (i % 7)) for i in range(100)],
        ["doc_id", "source", "n_tokens"],
    )
    out = pack_sequences(df, "doc_id", "n_tokens", "source", budget=64).collect()
    rows = {r["doc_id"]: r for r in out}
    assert len(rows) == 100
    # per shard: offsets tile the concatenated stream exactly (no gaps,
    # no overlaps) and seq/off are consistent with start_off
    for shard in ("s0", "s1"):
        srows = sorted(
            (r for r in out if r["source"] == shard), key=lambda r: r["start_off"]
        )
        expect = 0
        for r in srows:
            assert r["start_off"] == expect
            assert r["seq_id"] == r["start_off"] // 64
            assert r["off_in_seq"] == r["start_off"] % 64
            expect += r["n_tokens"]
    # deterministic: same input, different partitioning, same packing
    out2 = pack_sequences(
        df.repartition(17), "doc_id", "n_tokens", "source", budget=64
    ).collect()
    assert {(r["doc_id"], r["start_off"]) for r in out2} == {
        (r["doc_id"], r["start_off"]) for r in out
    }


def test_hash_sample_null_ids_kept_and_deterministic(spark):
    """NULL-id rows must flow through the samplers like any other row
    (sentinel-hashed), not silently vanish: md5(NULL) is NULL, so the
    threshold filter dropped them even at fraction=1.0, violating the
    full-sample identity (round-10 review)."""
    from dbcut_spark.operators.sampling import hash_sample

    rows = [(i, f"d{i}") for i in range(50)] + [(None, "n1"), (None, "n2")]
    df = spark.createDataFrame(rows, "doc_id long, v string")
    full = hash_sample(df, "doc_id", 1.0)
    assert full.count() == 52  # identity includes the NULL-id rows
    half_a = {tuple(r) for r in hash_sample(df, "doc_id", 0.5).collect()}
    half_b = {
        tuple(r)
        for r in hash_sample(df.repartition(7), "doc_id", 0.5).collect()
    }
    assert half_a == half_b  # deterministic, partition-invariant
