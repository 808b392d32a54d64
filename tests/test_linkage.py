"""Edit-distance join (operators/linkage.py): exactness vs a pure-
Python Levenshtein brute force over randomized small-alphabet strings
(small alphabets maximize collisions, boundary ties, and short-string
paths), plan shape (no CartesianProduct on the main path), and
degenerate inputs."""

from __future__ import annotations

import itertools
import random

import pytest

from dbcut_spark.operators.linkage import edit_distance_join


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(
                dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
            prev = cur
    return dp[n]


def _pairs(df):
    return sorted(
        (r["probe_id"], r["index_id"], r["distance"]) for r in df.collect()
    )


def _brute(probe, index, k):
    return sorted(
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.product(probe, index)
        if a is not None and b is not None and _lev(a, b) <= k
    )


@pytest.mark.parametrize("k", [1, 2])
def test_randomized_small_alphabet_differential(spark, k):
    rng = random.Random(1000 + k)
    probe = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 7))))
        for i in range(40)
    ]
    index = [
        (100 + j, "".join(rng.choice("abc") for _ in range(rng.randint(0, 7))))
        for j in range(40)
    ]
    pdf = spark.createDataFrame(probe, "pid int, s string")
    idf = spark.createDataFrame(index, "iid int, t string")
    got = _pairs(edit_distance_join(pdf, idf, "s", "t", "pid", "iid", k=k))
    assert got == _brute(probe, index, k)


def test_exact_match_k0_and_nulls(spark):
    probe = [(1, "cat"), (2, None), (3, "")]
    index = [(10, "cat"), (11, "bat"), (12, None)]
    pdf = spark.createDataFrame(probe, "pid int, s string")
    idf = spark.createDataFrame(index, "iid int, t string")
    got = _pairs(edit_distance_join(pdf, idf, "s", "t", "pid", "iid", k=0))
    assert got == [(1, 10, 0)]


def test_k_bounds(spark):
    pdf = spark.createDataFrame([(1, "a")], "pid int, s string")
    with pytest.raises(ValueError, match="k must be"):
        edit_distance_join(pdf, pdf, "s", "s", "pid", "pid", k=-1)
    with pytest.raises(ValueError, match="k=9"):
        edit_distance_join(pdf, pdf, "s", "s", "pid", "pid", k=9)


def test_no_cartesian_on_main_path(spark):
    """The blocked join must compile to an equi-join (shuffle/broadcast
    hash), never a CartesianProduct / BroadcastNestedLoop over the main
    candidate path (the short-string path is an alphabet-bounded
    broadcast grid by design and only appears when probe strings are
    shorter than k+1)."""
    rng = random.Random(7)
    # pairwise-distant strings (random 20-char, large alphabet): the
    # only distance<=1 pairs are the self matches
    words = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(20))
        for _ in range(50)
    ]
    pdf = spark.createDataFrame(
        list(enumerate(words)), "pid int, s string"
    )
    idf = spark.createDataFrame(
        [(100 + i, w) for i, w in enumerate(words)], "iid int, t string"
    )
    out = edit_distance_join(pdf, idf, "s", "t", "pid", "iid", k=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    got = _pairs(out)
    assert got == [(i, 100 + i, 0) for i in range(50)]


def test_unicode_character_semantics(spark):
    """Both the segment geometry (length/substr) and the verifier
    operate on CHARACTERS, not bytes — a multi-byte char counts once
    on both sides, so blocking and verify agree on non-ASCII text."""
    probe = [(1, "café"), (2, "naïve"), (3, "日本語")]
    index = [
        (10, "cafe"),   # é→e substitution: distance 1
        (11, "naïve"),  # exact
        (12, "日本誤"),  # last char substituted: distance 1
        (13, "milk"),
    ]
    pdf = spark.createDataFrame(probe, "pid int, s string")
    idf = spark.createDataFrame(index, "iid int, t string")
    got = _pairs(edit_distance_join(pdf, idf, "s", "t", "pid", "iid", k=1))
    assert got == [(1, 10, 1), (2, 11, 0), (3, 12, 1)]


def test_best_match_top1_deterministic(spark):
    from dbcut_spark.operators.linkage import best_match

    probe = [(1, "kitten"), (2, "zzz")]
    index = [(10, "kitten"), (11, "mitten"), (12, "bitten"), (13, "cat")]
    pdf = spark.createDataFrame(probe, "pid int, s string")
    idf = spark.createDataFrame(index, "iid int, t string")
    got = _pairs(best_match(pdf, idf, "s", "t", "pid", "iid", k=1))
    # exact beats distance-1; unmatched probe absent
    assert got == [(1, 10, 0)]
    # remove the exact match: smallest id among equal distances wins
    idf2 = spark.createDataFrame(index[1:], "iid int, t string")
    got2 = _pairs(best_match(pdf, idf2, "s", "t", "pid", "iid", k=1))
    assert got2 == [(1, 11, 1)]
