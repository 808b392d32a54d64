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


def test_null_equality_is_null_semantics(spark):
    """{field: null} / $eq null / $neq null compile to IS [NOT] NULL on
    BOTH engines — a literal '= NULL' is UNKNOWN for every row, the
    extraction silently returned zero matches, and the oracle rendered
    the same SQL so parity was structurally blind (round-10 review;
    the reference's SQLAlchemy compiles == None to IS NULL)."""
    import duckdb

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "id long, v string"
    )
    for frag, expected in [
        ({"v": None}, {2, 3}),
        ({"$eq": {"v": None}}, {2, 3}),
        ({"$neq": {"v": None}}, {1, 4}),
        ({"$or": {"v": None, "id": 4}}, {2, 3, 4}),
    ]:
        got = {
            r["id"] for r in df.filter(compile_where(frag, "t").predicate).collect()
        }
        assert got == expected, frag
        sql = where_to_sql(frag, "t")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW r AS SELECT * FROM (VALUES (1, 'a'), (2, NULL),"
            " (3, NULL), (4, 'b')) AS t(id, v)"
        )
        oracle = {
            row[0] for row in con.execute(f"SELECT id FROM r WHERE {sql}").fetchall()
        }
        assert oracle == expected, (frag, sql)


def test_combinator_list_value_fails_loudly():
    """$or/$and with a Mongo-style LIST must raise one clear ValueError
    from every walker — compile previously died with a raw
    AttributeError while where_foreign_tables silently ignored the
    fragment (round-10 review)."""
    import pytest

    from dbcut_spark.dsl import where_foreign_tables

    for frag in (
        {"$or": [{"a": 1}, {"b": 2}]},
        {"$not": [{"a": 1}]},  # round-10 ADVICE: $not had the same hole
    ):
        with pytest.raises(ValueError, match="mapping"):
            compile_where(frag, "t")
        with pytest.raises(ValueError, match="mapping"):
            where_foreign_tables(frag, "t")
        with pytest.raises(ValueError, match="mapping"):
            where_to_sql(frag, "t")


def test_verify_canon_edge_cells(tmp_path):
    """canon(): bytearray (PySpark BinaryType) must hash, and a float
    NaN must not collide with the string 'NaN' (round-10 review);
    register_parquet_views must survive reserved-word table names."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dbcut_spark.verify import canon, compare_result_sets, register_parquet_views

    assert canon(bytearray(b"\x01")) == b"\x01"
    assert canon(float("nan")) != canon("NaN")
    # the sentinel must be unforgeable: a 1-element array whose cell is
    # any string must never collide with a float NaN (round-10 ADVICE —
    # the old ("__nan__",) tuple sentinel collided with ["__nan__"])
    assert canon(float("nan")) != canon(["__nan__"])
    assert canon(float("nan")) == canon(float("nan"))
    # a bytearray row set compares cleanly against its bytes twin
    assert compare_result_sets(
        ["b"], [(bytearray(b"\x01"),)], ["b"], [(b"\x01",)]
    ) == []
    # string-'NaN' vs float-NaN is a VALUE difference, not a match
    assert compare_result_sets(["x"], [("NaN",)], ["x"], [(float("nan"),)])

    pq.write_table(pa.table({"id": [1, 2]}), str(tmp_path / "order.parquet"))
    con = duckdb.connect()
    got = register_parquet_views(con, str(tmp_path), ["order"])
    assert got == ["order"]
    assert con.execute('SELECT count(*) FROM "order"').fetchone()[0] == 2
