"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, then compare row count, column names, and exact
values (order-insensitive, columns sorted by name).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import datetime

import duckdb

sys.path.insert(0, "/root/repo")

from dbcut_spark.catalog import TPCH_TABLES
from dbcut_spark.session import get_spark


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def rowset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for row in rows:
        key = tuple(canon(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from dbcut_spark.operators.pinning import release_pinned

    failures = []
    n_checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_checked += 1
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            release_pinned()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only check) rows={len(s_rows)}")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            s_set = rowset(s_cols, s_rows)
            d_set = rowset(d_cols, d_rows)
            if s_set != d_set:
                only_s = {k: c for k, c in s_set.items() if d_set.get(k) != c}
                only_d = {k: c for k, c in d_set.items() if s_set.get(k) != c}
                sample_s = list(only_s.items())[:3]
                sample_d = list(only_d.items())[:3]
                problems.append(
                    f"values differ ({len(only_s)}/{len(only_d)} rows): "
                    f"spark-only={sample_s} duck-only={sample_d}"
                )
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name} rows={len(s_rows)}")

    print(f"\n{len(failures)} failures / {n_checked} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
