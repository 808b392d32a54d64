"""The programmatic façade must behave exactly like the CLI path: same
closure rows, idempotent load, nested docs, SQL dump."""

from dbcut_spark.api import Engine

QUERY = {
    "from": "customer",
    "where": {"c_mktsegment": "BUILDING"},
    "limit": 5,
    "join_depth": 2,
    "backref_depth": 1,
    "backref_limit": 3,
    "exclude": ["events", "part", "supplier"],
}


def test_engine_extract_load_roundtrip(spark, sf_dir, tmp_path):
    eng = Engine(sf_dir, spark=spark)
    plan = eng.plan(QUERY)
    assert "customer" in plan.tree.render()

    frames = eng.extract(QUERY)
    assert frames["customer"].count() == 5
    assert set(frames) >= {"customer", "nation", "region", "orders"}

    dest = str(tmp_path / "target")
    counts = eng.load(frames, dest)
    assert counts["customer"] == 5
    # idempotent second load
    frames2 = eng.extract(QUERY)
    counts2 = eng.load(frames2, dest)
    assert counts2["customer"] == 0

    docs = eng.nested_json(QUERY)
    assert docs.count() == 5

    stmts = list(eng.sql_dump(QUERY))
    assert stmts[0] == "BEGIN;" and stmts[-1] == "COMMIT;"
    assert any("INSERT OR IGNORE" in s for s in stmts)
