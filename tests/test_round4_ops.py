"""Semantic invariants for the round-4 operators (quality rules, domain
mixing, novelty, funnel/retention, quantiles) — properties the DuckDB
parity test cannot express (it only proves Spark == oracle, not that
either is *sensible*)."""

from pyspark.sql import functions as F

from dbcut_spark.queries import QUERIES


def test_funnel_is_monotone(spark, sf_dir):
    rows = QUERIES["events_funnel"](spark, sf_dir).collect()
    assert [r.stage for r in rows] == ["view", "click", "purchase"]
    users = [r.users for r in rows]
    assert users[0] >= users[1] >= users[2] >= 0


def test_retention_day0_equals_cohort_size(spark, sf_dir):
    """Every user is active at offset 0 of their own cohort, so day-0
    rows must partition the full user population."""
    ret = QUERIES["events_retention"](spark, sf_dir)
    day0 = (
        ret.filter(F.col("day_offset") == 0)
        .agg(F.sum("users").alias("u"))
        .first()
        .u
    )
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert day0 == n_users
    bad = ret.filter((F.col("day_offset") < 0) | (F.col("users") <= 0)).count()
    assert bad == 0


def test_gopher_keep_implies_each_rule(spark, sf_dir):
    df = QUERIES["docs_gopher_rules"](spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert df.count() == n_docs
    bad = df.filter(
        F.col("keep")
        & ~(
            F.col("r_wordcount")
            & F.col("r_meanlen")
            & F.col("r_alpha")
            & F.col("r_stop")
        )
    ).count()
    assert bad == 0
    # the rules must discriminate on this corpus: some kept, some dropped
    kept = df.filter("keep").count()
    assert 0 < kept <= n_docs


def test_domain_mix_respects_quota(spark, sf_dir):
    df = QUERIES["docs_domain_mix_temperature"](spark, sf_dir)
    per_src = df.groupBy("source", "quota").agg(F.count("*").alias("n"))
    over = per_src.filter(F.col("n") > F.col("quota")).count()
    assert over == 0
    # budget 200 across sources; floor() may undershoot but never overshoot
    total = df.count()
    assert 0 < total <= 200


def test_ngram_novelty_bounds_and_first_doc(spark, sf_dir):
    df = QUERIES["docs_ngram_novelty"](spark, sf_dir)
    bad = df.filter(
        (F.col("novelty") < 0)
        | (F.col("novelty") > 1)
        | (F.col("novel_grams") > F.col("n_grams"))
    ).count()
    assert bad == 0
    # the earliest document that has any 3-grams is 100% novel
    first = df.orderBy("doc_id").first()
    assert first.novelty == 1.0


def test_length_quantiles_are_ordered(spark, sf_dir):
    df = QUERIES["docs_length_quantiles"](spark, sf_dir)
    bad = df.filter(
        (F.col("p25") > F.col("p50"))
        | (F.col("p50") > F.col("p90"))
        | (F.col("p90") > F.col("p99"))
    ).count()
    assert bad == 0
