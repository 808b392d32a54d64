"""DuckDB oracle-SQL generation for extraction plans.

Independently re-expresses the closure semantics in ANSI SQL (IN-subquery
frontiers instead of DataFrame semi-joins) so the driver's DuckDB
comparison is a genuine cross-check of :mod:`dbcut_spark.operators.closure`.

NULL/ordering canon: Spark sorts ASC nulls-first / DESC nulls-last, so the
generated SQL says it explicitly.
"""

from __future__ import annotations

from typing import Any

from dbcut_spark.dsl import COMBINATORS, COMPARATORS
from dbcut_spark.graph import Direction, TreeNode
from dbcut_spark.plans.extraction import ExtractionPlan


def sql_literal(value: Any) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    s = str(value).replace("'", "''")
    return f"'{s}'"


def _field_sql(name: str, root_table: str) -> str:
    if "." in name:
        table, col = name.split(".", 1)
        if table != root_table:
            return f"{table}__t.{col}"
        name = col
    return f"r.{name}"


def _cmp_sql(field: str, op: str, value: Any) -> str:
    ops = {"$eq": "=", "$neq": "<>", "$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}
    # IS [NOT] NULL, in lockstep with dsl._compile_comparator: a
    # rendered `= NULL` is UNKNOWN everywhere — and because BOTH
    # engines carried the same rendering, the parity gate could not
    # see the divergence from the reference (round-10 review)
    if op == "$eq" and value is None:
        return f"{field} IS NULL"
    if op == "$neq" and value is None:
        return f"{field} IS NOT NULL"
    if op in ops:
        return f"{field} {ops[op]} {sql_literal(value)}"
    if op == "$like":
        return f"{field} LIKE {sql_literal(value)}"
    if op == "$in":
        if not value:
            # the DSL compiles isin([]) to an always-false predicate;
            # `IN ()` would be a SQL parse error
            return "FALSE"
        vals = ", ".join(sql_literal(v) for v in value)
        return f"{field} IN ({vals})"
    raise ValueError(f"unknown comparator {op!r}")


def where_to_sql(fragment: dict, root_table: str) -> str:
    """Compile a where-fragment to a SQL boolean expression (mirrors
    :func:`dbcut_spark.dsl.compile_where`, same implicit-$and rules)."""
    clauses: list[str] = []
    for key, value in fragment.items():
        if key in COMBINATORS:
            if not isinstance(value, dict):
                raise ValueError(
                    f"{key} expects a mapping of sub-conditions, "
                    f"got {type(value).__name__}"
                )  # same loud contract as dsl.compile_where, $not incl.
            if key == "$not":
                clauses.append(f"(NOT {where_to_sql(value, root_table)})")
            else:
                joiner = " OR " if key == "$or" else " AND "
                subs = [where_to_sql({k: v}, root_table) for k, v in value.items()]
                if not subs:
                    continue  # DSL skips empty combinators; `(())` is a parse error
                clauses.append("(" + joiner.join(subs) + ")")
        elif key in COMPARATORS:
            f_name, f_val = next(iter(value.items()))
            clauses.append(_cmp_sql(_field_sql(f_name, root_table), key, f_val))
        else:
            field = _field_sql(key, root_table)
            if isinstance(value, dict):
                for op, v in value.items():
                    clauses.append(_cmp_sql(field, op, v))
            elif isinstance(value, (list, tuple)):
                clauses.append(_cmp_sql(field, "$in", value))
            else:
                clauses.append(_cmp_sql(field, "$eq", value))
    return "(" + " AND ".join(clauses) + ")" if clauses else "TRUE"


def _root_sql(plan: ExtractionPlan) -> str:
    spec = plan.spec
    from dbcut_spark.dsl import where_foreign_tables

    foreign_tables = where_foreign_tables(spec.where, plan.root_table)
    pred = where_to_sql(spec.where, plan.root_table) if spec.where else "TRUE"
    order = ", ".join(
        f"{k.column} {'DESC NULLS LAST' if k.descending else 'ASC NULLS FIRST'}"
        for k in plan.order_keys()
    )
    if foreign_tables:
        joins = []
        joined = {plan.root_table}
        for ft in sorted(foreign_tables):
            for node in plan.find_path(ft):
                rel = node.relationship
                assert rel is not None
                if node.table in joined:
                    continue
                joined.add(node.table)
                conds = []
                for s, t in zip(rel.source_cols, rel.target_cols):
                    left = f"r.{s}" if rel.source == plan.root_table else f"{rel.source}__t.{s}"
                    conds.append(f"{left} = {node.table}__t.{t}")
                joins.append(
                    f"LEFT JOIN {node.table} AS {node.table}__t ON " + " AND ".join(conds)
                )
        inner = (
            f"SELECT DISTINCT r.* FROM {plan.root_table} r "
            + " ".join(joins)
            + f" WHERE {pred}"
        )
        sql = f"SELECT * FROM ({inner}) r ORDER BY {order}"
    else:
        sql = f"SELECT * FROM {plan.root_table} r WHERE {pred} ORDER BY {order}"
    if spec.limit is not None:
        sql += f" LIMIT {spec.limit}"
    if spec.offset:
        sql += f" OFFSET {spec.offset}"
    return sql


def plan_oracle_sql(plan: ExtractionPlan, table: str) -> str:
    """Full DuckDB SQL for the closure restricted to ``table``."""
    node_cte: dict[int, str] = {}
    ctes: list[str] = []
    per_table: dict[str, list[str]] = {}

    nodes = list(plan.tree.root.walk())
    for i, node in enumerate(nodes):
        name = f"n{i}"
        node_cte[id(node)] = name
        if node.relationship is None:
            ctes.append(f"{name} AS ({_root_sql(plan)})")
        else:
            rel = node.relationship
            parent = _parent_of(plan, node)
            pcte = node_cte[id(parent)]
            tcols = ", ".join(rel.target_cols)
            scols = ", ".join(rel.source_cols)
            key = f"({tcols})" if len(rel.target_cols) > 1 else tcols
            sel = f"({scols})" if len(rel.source_cols) > 1 else scols
            base = (
                f"SELECT c.* FROM {rel.target} c "
                f"WHERE {key} IN (SELECT DISTINCT {sel} FROM {pcte})"
            )
            if rel.direction is Direction.ONETOMANY and plan.spec.backref_limit is not None:
                pk = plan.catalog.table(rel.target).pk
                # explicit null order, same canon as lines above: a
                # nullable synthesized PK under DuckDB's configurable
                # default_null_order would cut a different top-n
                order = ", ".join(f"{c} DESC NULLS LAST" for c in pk)
                if plan.spec.backref_limit_mode == "global":
                    base += f" ORDER BY {order} LIMIT {plan.spec.backref_limit}"
                else:
                    part = ", ".join(rel.target_cols)
                    base = (
                        "SELECT * EXCLUDE (__rn) FROM ("
                        f"SELECT c.*, row_number() OVER (PARTITION BY {part} ORDER BY {order})"
                        f" AS __rn FROM {rel.target} c "
                        f"WHERE {key} IN (SELECT DISTINCT {sel} FROM {pcte})"
                        f") WHERE __rn <= {plan.spec.backref_limit}"
                    )
            ctes.append(f"{name} AS ({base})")
        per_table.setdefault(node.table, []).append(name)

    if table not in per_table:
        raise KeyError(f"{table!r} not in the extraction tree")
    parts = [f"SELECT * FROM {c}" for c in per_table[table]]
    body = " UNION ALL ".join(parts)
    pk = plan.catalog.table(table).pk
    # explicit NULLS FIRST: Spark asc() is nulls-first, DuckDB's bare
    # ASC defaults nulls-LAST — synthesized PKs (first *_id column of a
    # PK-less table) can be nullable, and the divergence would surface
    # as a spurious parity mismatch
    order = ", ".join(f"{c} ASC NULLS FIRST" for c in pk)
    # dedup ONLY when the table is reached by >1 tree node — the
    # executor's exact condition (closure.py: len(frames) > 1). A
    # blanket DISTINCT * would collapse legitimately duplicate rows of
    # a single-path table that Spark returns verbatim (round-8 review
    # fix). Multi-path dedup uses DISTINCT * vs Spark's
    # dropDuplicates(pk): identical whenever the PK is unique (true
    # PKs always; the synthesized-PK caveat is documented at
    # catalog.synthesize_pk).
    dedup = "DISTINCT " if len(parts) > 1 else ""
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT {dedup}* FROM ({body}) ORDER BY {order}"
    )


def _parent_of(plan: ExtractionPlan, target: TreeNode) -> TreeNode:
    for node in plan.tree.root.walk():
        if any(c is target for c in node.children):
            return node
    raise ValueError("node has no parent")
