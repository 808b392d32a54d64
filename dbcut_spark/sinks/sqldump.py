"""SQL dump sink (reference K3/K4): emit CREATE TABLE + INSERT statements
for the extraction result instead of loading it.

The reference echoes every statement executed against the destination
(``/root/reference/dbcut/database.py:379-409``; sample output
``/root/reference/README.rst:363-399``): dialect-specific IGNORE inserts
(SQLite ``INSERT OR IGNORE``, MySQL ``INSERT IGNORE``, PG
``... ON CONFLICT DO NOTHING``).

Two modes:
- :func:`dump_sql` — driver-side streaming iterator (``toLocalIterator``,
  one partition in memory at a time) for human-sized dumps;
- :func:`dump_sql_distributed` — each partition renders its INSERTs in
  executors and writes text shards; at 100 TB the dump itself is
  embarrassingly parallel and never funnels through the driver.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DIALECTS = {
    "sqlite": {"insert": "INSERT OR IGNORE INTO", "quote": '"', "suffix": ""},
    "mysql": {"insert": "INSERT IGNORE INTO", "quote": "`", "suffix": ""},
    "postgresql": {
        "insert": "INSERT INTO",
        "quote": '"',
        "suffix": " ON CONFLICT DO NOTHING",
    },
}

_SPARK_TO_SQL = {
    T.StringType: "TEXT",
    T.BinaryType: "BLOB",
    T.BooleanType: "BOOLEAN",
    T.ByteType: "SMALLINT",
    T.ShortType: "SMALLINT",
    T.IntegerType: "INTEGER",
    T.LongType: "BIGINT",
    T.FloatType: "REAL",
    T.DoubleType: "DOUBLE PRECISION",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.TimestampNTZType: "TIMESTAMP",
}


def sql_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    return _SPARK_TO_SQL.get(type(dt), "TEXT")


def render_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return f"'{v.isoformat(sep=' ') if isinstance(v, _dt.datetime) else v.isoformat()}'"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + v.hex() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def create_table_sql(
    table: str, df: DataFrame, pk: list[str], dialect: str = "sqlite"
) -> str:
    q = DIALECTS[dialect]["quote"]
    cols = [f"{q}{f.name}{q} {sql_type(f.dataType)}" for f in df.schema.fields]
    if pk:
        cols.append(f"PRIMARY KEY ({', '.join(q + c + q for c in pk)})")
    return f"CREATE TABLE IF NOT EXISTS {q}{table}{q} (\n  " + ",\n  ".join(cols) + "\n);"


def _insert_stmt(table: str, columns: list[str], row, dialect: str) -> str:
    d = DIALECTS[dialect]
    q = d["quote"]
    cols = ", ".join(q + c + q for c in columns)
    vals = ", ".join(render_value(v) for v in row)
    return f"{d['insert']} {q}{table}{q} ({cols}) VALUES ({vals}){d['suffix']};"


def dump_sql(
    tables: dict[str, DataFrame],
    pks: dict[str, list[str]],
    dialect: str = "sqlite",
    include_ddl: bool = True,
) -> Iterator[str]:
    """Stream the dump statement-by-statement (reference output shape:
    BEGIN → DDL → INSERT... → COMMIT)."""
    yield "BEGIN;"
    for table, df in tables.items():
        if include_ddl:
            yield create_table_sql(table, df, pks.get(table, []), dialect)
        columns = df.columns
        for row in df.toLocalIterator():
            yield _insert_stmt(table, columns, row, dialect)
    yield "COMMIT;"


def dump_sql_distributed(
    df: DataFrame, table: str, path: str, dialect: str = "sqlite"
) -> None:
    """Render INSERT statements executor-side and write text shards —
    the scale path: no driver funnel, one output file per partition."""
    columns = df.columns
    d = dialect

    def render_partition(rows):
        import pandas as pd

        for pdf in rows:
            stmts = [
                _insert_stmt(table, columns, tuple(rec), d)
                for rec in pdf.itertuples(index=False, name=None)
            ]
            yield pd.DataFrame({"stmt": stmts})

    from pyspark.sql import types as T2

    out = df.mapInPandas(render_partition, T2.StructType([T2.StructField("stmt", T2.StringType())]))
    out.write.mode("overwrite").text(path)
