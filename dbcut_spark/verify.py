"""Spark-vs-DuckDB differential comparison utilities.

Shared by ``tools/check_parity.py`` (the local stand-in for the
driver's correctness gate over the registered query suite) and the CLI
``verify`` command (the same differential for a USER's own extraction
config): canonicalize values, build an order-insensitive multiset
keyed by name-sorted columns, and report column / rowcount / value
problems with samples.

The comparison contract matches the driver's gate: row count, column
name set, and exact values — order-insensitive, columns sorted by
name, floats compared exactly (oracle SQL is written to be
bit-identical; see the DECIMAL-routing and round(6) conventions in
``dbcut_spark.queries``)."""

from __future__ import annotations

import math
from datetime import datetime, timezone

# Unforgeable NaN sentinel: compares/hashes by identity, so no
# canonicalized container value can ever equal it. The previous
# ("__nan__",) tuple collided with a one-element string array
# ["__nan__"] — a float NaN on one engine could silently multiset-match
# that array on the other, passing the gate on a genuine type
# divergence (round-10 ADVICE).
_NAN = object()


def canon(v):
    """Hashable canonical form of one cell, identical for Spark and
    DuckDB client types (naive timestamps, NaN sentinel, binary,
    nested lists/dicts)."""
    if v is None:
        return None
    if isinstance(v, bool):
        # BEFORE the float/int fall-through: Python hashes True == 1 ==
        # 1.0, so a BOOLEAN on one engine would silently multiset-match
        # an integer 1 on the other — the same cross-type silent pass
        # the NaN sentinel closed for NaN (round-11 review). int/float
        # stay numerically unified on purpose: the oracle conventions
        # cast both sides to matching numeric types, and DuckDB/Spark
        # client types legitimately differ in width for equal values.
        return ("__bool__", v)
    if isinstance(v, float):
        if math.isnan(v):
            # identity-sentinel, not a string or tuple: a genuine
            # STRING cell 'NaN' or a 1-element array ['__nan__'] must
            # not collide with a float NaN on the other engine (type
            # drift would pass the gate silently)
            return _NAN
        return float(v)
    if isinstance(v, bytearray):
        # PySpark collects BinaryType as bytearray — unhashable, so
        # the multiset build crashed on any binary column; DuckDB
        # returns bytes (round-10 review)
        return bytes(v)
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            # convert the INSTANT to UTC before dropping tzinfo: a bare
            # strip compared wall-clock text, so 10:00+05 and 10:00+00
            # (different instants) matched while the same instant in
            # two zones mismatched (round-11 review)
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def rowset(columns, rows):
    """Order-insensitive multiset of rows, cells ordered by column
    NAME so both engines hash identically regardless of projection
    order."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for row in rows:
        key = tuple(canon(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare_result_sets(s_cols, s_rows, d_cols, d_rows) -> list[str]:
    """Problems between a Spark result and an oracle result (empty list
    = match). Mirrors the driver gate: columns, rowcount, then values
    with up to 3 sample rows per side."""
    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(
            f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}"
        )
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
    return problems


def register_parquet_views(con, source: str, tables) -> list[str]:
    """CREATE VIEW per table over the parquet source in a DuckDB
    connection; returns the tables actually registered (missing files
    skipped — the caller reports them)."""
    import os

    registered = []
    for t in tables:
        path = os.path.join(source, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        pat = f"{path}/**/*.parquet" if os.path.isdir(path) else path
        # quoted identifier + escaped path literal: a table named
        # 'order'/'group' (reserved words) or a path containing a
        # quote previously broke the CREATE VIEW (round-10 review)
        ident = '"' + t.replace('"', '""') + '"'
        lit = pat.replace("'", "''")
        con.execute(
            f"CREATE OR REPLACE VIEW {ident} AS SELECT * FROM read_parquet('{lit}')"
        )
        registered.append(t)
    return registered
