"""Deterministic hash-based sampling and dataset splits.

Training-data pipelines need samples and train/holdout splits that are
REPRODUCIBLE — stable across runs, cluster sizes, partitionings, and
engines. ``df.sample()``/``sampleBy()`` use Spark's per-partition RNG
(results change with the partition layout), so instead membership is
decided by the content hash of the id: a row is in the p-fraction
sample iff the first 8 hex chars of ``md5(salt || id)`` are
lexicographically below the p·2³² threshold written as 8-digit hex.
String comparison on lowercase hex is identical in every engine, so
the DuckDB oracle reproduces splits bit-for-bit.

Scale: one codegen'd projection + filter per row — no shuffle, no
state, trivially pushdown-friendly. Changing ``salt`` draws an
independent sample; keeping it fixes the split forever (the property
that makes holdout sets trustworthy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_threshold(fraction: float) -> str:
    """8-hex-digit threshold: uniform hashes below it ≈ ``fraction``.

    fraction=1.0 returns "g" (lexicographically above every hex
    string) so a full sample is exactly the identity — clamping to
    "ffffffff" with the strict < comparison would drop rows whose
    bucket is exactly ffffffff (~1 in 2³², real rows at 100 TB)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * 2**32), "08x")


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """First 8 hex chars of md5(salt || id) — the sampling key. NULL
    ids hash through a control-character sentinel instead of
    propagating NULL: md5(NULL) is NULL, the threshold comparison is
    NULL, and filter() would silently DROP every NULL-id row from
    every sampler — even at fraction 1.0, violating the documented
    full-sample identity (round-10 review). The sentinel starts with
    \\x01, which no cast-to-string id can produce; non-NULL hashes are
    byte-identical to before (persisted split membership and the
    DuckDB oracle twins are unaffected)."""
    sid = (
        F.col(id_col).cast("string")
        if isinstance(id_col, str)
        else id_col.cast("string")
    )
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.coalesce(sid, F.lit("\x01null")))),
        1,
        8,
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample by content hash of ``id_col``."""
    return df.filter(hash_bucket(id_col, salt) < hash_threshold(fraction))


def stratified_hash_sample(
    df: DataFrame, id_col: str, strata_col: str, fractions: dict[str, float], salt: str = ""
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without the
    RNG): each stratum keeps its own hash-threshold fraction; strata
    not listed are dropped."""
    bucket = hash_bucket(id_col, salt)
    cond = None
    for stratum, frac in sorted(fractions.items()):
        c = (F.col(strata_col) == stratum) & (bucket < hash_threshold(frac))
        cond = c if cond is None else (cond | c)
    return df.filter(cond if cond is not None else F.lit(False))


def hash_fraction(id_col: Column | str, salt: str = "") -> Column:
    """Uniform [0,1) value derived from the id hash — the per-row
    variable-rate generalization of :func:`hash_bucket`'s fixed
    threshold (``conv(hex,16,10)/2³²``, identical in DuckDB via
    ``CAST('0x'||hex AS BIGINT)``)."""
    return F.conv(hash_bucket(id_col, salt), 16, 10).cast("double") / F.lit(
        float(2**32)
    )


def weighted_hash_sample(
    df: DataFrame, id_col: str, weight: Column, salt: str = ""
) -> DataFrame:
    """Keep each row with its OWN probability (``weight``, clamped to
    [0,1]) — quality-weighted / curriculum sampling, deterministic:
    the same row with the same weight is kept in every run, engine,
    and partitioning. One projection+filter, shuffle-free."""
    w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    return df.filter(hash_fraction(id_col, salt) < w)


def train_holdout_split(
    df: DataFrame, id_col: str, holdout_fraction: float = 0.1, salt: str = ""
) -> DataFrame:
    """Append a ``split`` column ('holdout' below the threshold, else
    'train') — the stable-forever dataset split."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(id_col, salt) < hash_threshold(holdout_fraction),
            F.lit("holdout"),
        ).otherwise(F.lit("train")),
    )
