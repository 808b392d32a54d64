"""Property-based DSL parity: for ANY well-formed where-fragment, the
Spark Column compilation (dsl.compile_where) and the SQL compilation
(plans.oracle.where_to_sql) must select exactly the same rows. This is
the reference's mlalchemy surface (SURVEY.md §2.3) under random
composition of comparators and combinators."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbcut_spark.dsl import compile_where
from dbcut_spark.plans.oracle import where_to_sql

STATUSES = ["O", "F", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
LIKES = ["%URGENT%", "1-%", "%H", "%-M%"]

scalar_leaf = st.one_of(
    st.builds(lambda v: {"o_orderstatus": v}, st.sampled_from(STATUSES)),
    st.builds(lambda v: {"o_orderpriority": v}, st.sampled_from(PRIORITIES)),
    st.builds(
        lambda op, v: {"o_totalprice": {op: round(v, 2)}},
        st.sampled_from(["$gt", "$gte", "$lt", "$lte"]),
        st.floats(min_value=1000, max_value=500000, allow_nan=False),
    ),
    st.builds(
        lambda op, v: {"o_custkey": {op: v}},
        st.sampled_from(["$eq", "$neq", "$gt", "$lte"]),
        st.integers(min_value=0, max_value=1500),
    ),
    st.builds(lambda p: {"o_orderpriority": {"$like": p}}, st.sampled_from(LIKES)),
    st.builds(
        lambda vs: {"o_orderstatus": {"$in": vs}},
        st.lists(st.sampled_from(STATUSES), min_size=1, max_size=3, unique=True),
    ),
)


def _combine(children: st.SearchStrategy) -> st.SearchStrategy:
    def merge(frags: list[dict]) -> dict:
        out: dict = {}
        for f in frags:
            out.update(f)
        return out

    pair = st.lists(children, min_size=1, max_size=3).map(merge)
    return st.one_of(
        st.builds(lambda f: {"$or": f}, pair),
        st.builds(lambda f: {"$not": f}, pair),
        pair,  # implicit $and
    )


fragments = st.recursive(scalar_leaf, _combine, max_leaves=6)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fragment=fragments)
def test_where_fragment_parity(spark, duck, orders_df, fragment):
    compiled = compile_where(fragment, "orders")
    assert compiled.predicate is not None
    got = {
        r["o_orderkey"]
        for r in orders_df.filter(compiled.predicate).select("o_orderkey").collect()
    }
    sql = where_to_sql(fragment, "orders")
    expected = {
        r[0]
        for r in duck.execute(
            f"SELECT o_orderkey FROM orders r WHERE {sql}"
        ).fetchall()
    }
    assert got == expected, f"fragment {fragment!r} → spark {len(got)} vs duckdb {len(expected)}"
