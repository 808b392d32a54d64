"""Query DSL → Spark Column expressions.

Reference parity: dbcut queries are YAML dicts whose ``where:`` fragment is
compiled by the ``mlalchemy`` DSL into SQLAlchemy clauses
(``/root/reference/dbcut/parser.py:70-107``): implicit ``$and`` across
sibling keys, ``$or`` / ``$not`` combinators, comparators
``$eq $neq $gt $gte $lt $lte $like $in``, and cross-table fields written
``other_table.column`` (resolved against the joined model,
``/root/reference/dbcut/parser.py:84-97``).

Here the same fragment tree compiles to a :class:`pyspark.sql.Column`
boolean expression plus the set of foreign tables referenced, so the
planner knows which joins the predicate needs. Staying in Column algebra
(never Python UDFs) keeps predicates inside Catalyst, so they push down
to the parquet/JDBC scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

COMPARATORS = {"$eq", "$neq", "$gt", "$gte", "$lt", "$lte", "$like", "$in"}
COMBINATORS = {"$and", "$or", "$not"}


@dataclass
class CompiledWhere:
    predicate: Column | None
    # foreign tables referenced via "table.column" fields
    foreign_tables: set[str] = field(default_factory=set)


def _field_ref(name: str, root_table: str, foreign: set[str]) -> Column:
    """Resolve a DSL field name to a Column.

    ``column`` → root table column; ``table.column`` → that table's column
    (the planner joins it in; we reference it with the qualified name the
    executor assigns: ``<table>__<column>`` to avoid ambiguity).
    """
    if "." in name:
        table, col = name.split(".", 1)
        if table == root_table:
            return F.col(col)
        foreign.add(table)
        return F.col(f"{table}__{col}")
    return F.col(name)


def _compile_comparator(col: Column, op: str, value: Any) -> Column:
    # NULL equality compiles to IS [NOT] NULL, matching the reference's
    # SQLAlchemy semantics (Model.field == None → IS NULL). A literal
    # `col == lit(NULL)` is UNKNOWN for every row — the extraction
    # would silently return zero matches, and the oracle generator
    # previously rendered the same `= NULL`, so the parity gate was
    # structurally blind to the divergence (round-10 review).
    if op == "$eq":
        if value is None:
            return col.isNull()
        return col == F.lit(value)
    if op == "$neq":
        if value is None:
            return col.isNotNull()
        return col != F.lit(value)
    if op == "$gt":
        return col > F.lit(value)
    if op == "$gte":
        return col >= F.lit(value)
    if op == "$lt":
        return col < F.lit(value)
    if op == "$lte":
        return col <= F.lit(value)
    if op == "$like":
        return col.like(str(value))
    if op == "$in":
        return col.isin(list(value))
    raise ValueError(f"unknown comparator {op!r}")


def _compile_fragment(fragment: Any, root_table: str, foreign: set[str]) -> Column:
    """Compile one where-fragment (dict => implicit $and of items)."""
    if not isinstance(fragment, dict):
        raise ValueError(f"where fragment must be a mapping, got {type(fragment)}")
    clauses: list[Column] = []
    for key, value in fragment.items():
        if key in COMBINATORS:
            if key == "$not":
                if not isinstance(value, dict):
                    # same loud contract as $and/$or — previously $not
                    # with a list died with a bare AttributeError here
                    # while the metadata walker accepted it (round-10
                    # ADVICE: the walker disagreement had just moved)
                    raise ValueError(
                        f"{key} expects a mapping of sub-conditions, "
                        f"got {type(value).__name__}; write "
                        f"{key}: {{field1: v1, field2: v2}}"
                    )
                clauses.append(~_compile_fragment(value, root_table, foreign))
            else:
                if not isinstance(value, dict):
                    # mlalchemy's combinators take a MAPPING; a
                    # Mongo-style list previously died with a bare
                    # AttributeError here while the metadata walker
                    # silently skipped it (round-10 review)
                    raise ValueError(
                        f"{key} expects a mapping of sub-conditions, "
                        f"got {type(value).__name__}; write "
                        f"{key}: {{field1: v1, field2: v2}}"
                    )
                sub = [
                    _compile_fragment({k: v}, root_table, foreign)
                    for k, v in value.items()
                ]
                if not sub:
                    continue
                out = sub[0]
                for c in sub[1:]:
                    out = (out | c) if key == "$or" else (out & c)
                clauses.append(out)
        elif key in COMPARATORS:
            # comparator at this level applies to the single field inside:
            # {"$in": {"artist.name": [...]}} (mlalchemy form)
            if not isinstance(value, dict) or len(value) != 1:
                raise ValueError(f"{key} expects a single {{field: value}} mapping")
            f_name, f_val = next(iter(value.items()))
            clauses.append(
                _compile_comparator(_field_ref(f_name, root_table, foreign), key, f_val)
            )
        else:
            col = _field_ref(key, root_table, foreign)
            if isinstance(value, dict):
                # {field: {$gt: 5, $lt: 10}} — comparators AND-ed
                for op, v in value.items():
                    clauses.append(_compile_comparator(col, op, v))
            elif isinstance(value, (list, tuple)):
                clauses.append(col.isin(list(value)))
            elif value is None:
                clauses.append(col.isNull())  # reference IS NULL semantics
            else:
                clauses.append(col == F.lit(value))
    if not clauses:
        return F.lit(True)
    out = clauses[0]
    for c in clauses[1:]:
        out = out & c
    return out


def where_foreign_tables(fragment: dict | None, root_table: str) -> set[str]:
    """Foreign tables referenced by ``table.column`` fields — pure
    metadata walk (no SparkSession needed; used by the planner and the
    oracle-SQL generator)."""
    foreign: set[str] = set()

    def walk(frag: Any) -> None:
        if not isinstance(frag, dict):
            return
        for key, value in frag.items():
            if key in COMBINATORS:
                if not isinstance(value, dict):
                    # same loud contract as compile_where — the two
                    # walkers previously disagreed (compile crashed,
                    # this one silently reported no foreign tables);
                    # $not included (round-10 ADVICE)
                    raise ValueError(
                        f"{key} expects a mapping of sub-conditions, "
                        f"got {type(value).__name__}"
                    )
                walk(value)
            elif key in COMPARATORS:
                if isinstance(value, dict):
                    for f_name in value:
                        _note(f_name)
            else:
                _note(key)
                if isinstance(value, dict):
                    continue

    def _note(name: str) -> None:
        if "." in name:
            table = name.split(".", 1)[0]
            if table != root_table:
                foreign.add(table)

    walk(fragment or {})
    return foreign


def compile_where(fragment: dict | None, root_table: str) -> CompiledWhere:
    if not fragment:
        return CompiledWhere(None)
    foreign: set[str] = set()
    pred = _compile_fragment(fragment, root_table, foreign)
    return CompiledWhere(pred, foreign)


@dataclass(frozen=True)
class OrderKey:
    column: str
    descending: bool

    def to_column(self) -> Column:
        return F.col(self.column).desc() if self.descending else F.col(self.column).asc()


def parse_order_by(spec: str | list[str] | None) -> list[OrderKey]:
    """``-field`` ⇒ DESC, ``field`` ⇒ ASC, multi-key lists allowed
    (reference: ``/root/reference/dbcut/parser.py:40-55``)."""
    if spec is None:
        return []
    items = [spec] if isinstance(spec, str) else list(spec)
    keys = []
    for item in items:
        item = item.strip()
        if item.startswith("-"):
            keys.append(OrderKey(item[1:], True))
        else:
            keys.append(OrderKey(item.lstrip("+"), False))
    return keys


def default_order(pk: tuple[str, ...]) -> list[OrderKey]:
    """Reference default: PK DESC when no order-by given
    (``/root/reference/dbcut/models.py:24-30``) — keeps ``limit``
    deterministic ('latest N rows')."""
    return [OrderKey(c, True) for c in pk]
