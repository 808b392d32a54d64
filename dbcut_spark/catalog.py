"""Schema catalog: tables, primary keys, FK relationships.

Reference parity: dbcut reflects schema + FK graph from a live database at
runtime (``/root/reference/dbcut/database.py:166-211``) and synthesizes a
primary key for PK-less tables from id/uuid/*_id columns
(``/root/reference/dbcut/database.py:411-428``). Here the catalog is an
explicit driver-side structure; it can be populated three ways:

- :data:`TPCH_CATALOG` — static spec for the harness testdata;
- :func:`infer_catalog` — heuristic inference from parquet schemas
  (synthetic-PK + ``*key``/``*_id`` FK-name matching);
- :mod:`dbcut_spark.sources.jdbc` — information_schema reflection for
  real databases (Spark's JDBC reader gives column types; PK/FK come
  from catalog queries).

The FK graph is schema-level metadata traversed on the driver — it never
becomes a DataFrame (SURVEY.md §1.1).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ForeignKey:
    """child.child_cols references parent.parent_cols."""

    child: str
    child_cols: tuple[str, ...]
    parent: str
    parent_cols: tuple[str, ...]

    @property
    def name(self) -> str:
        return f"{self.child}({','.join(self.child_cols)})->{self.parent}"


@dataclass
class TableSpec:
    name: str
    pk: tuple[str, ...]
    columns: tuple[str, ...] = ()
    # True when the PK was synthesized (no declared PK in the source)
    synthetic_pk: bool = False
    # column -> server-default SQL expression as reflected from the
    # source (e.g. "'new'", "CURRENT_TIMESTAMP", "now()") — carried
    # into the dump DDL with the cross-dialect current-timestamp
    # rewrite (sinks/sqldump.py:default_sql; reference
    # /root/reference/dbcut/compiler.py:12-18,58-63)
    defaults: dict[str, str] = field(default_factory=dict)


@dataclass
class Catalog:
    tables: dict[str, TableSpec] = field(default_factory=dict)
    fks: list[ForeignKey] = field(default_factory=list)

    def table(self, name: str) -> TableSpec:
        if name not in self.tables:
            raise KeyError(f"unknown table {name!r}; catalog has {sorted(self.tables)}")
        return self.tables[name]

    def fks_of(self, table: str) -> list[ForeignKey]:
        """FKs declared ON `table` (many-to-one edges out of it)."""
        return [fk for fk in self.fks if fk.child == table]

    def fks_into(self, table: str) -> list[ForeignKey]:
        """FKs referencing `table` (one-to-many edges into children)."""
        return [fk for fk in self.fks if fk.parent == table]

    def to_json(self) -> str:
        return json.dumps(
            {
                "tables": {
                    n: {
                        "pk": list(t.pk),
                        "columns": list(t.columns),
                        "synthetic_pk": t.synthetic_pk,
                        **({"defaults": dict(sorted(t.defaults.items()))} if t.defaults else {}),
                    }
                    for n, t in sorted(self.tables.items())
                },
                "fks": [
                    {
                        "child": fk.child,
                        "child_cols": list(fk.child_cols),
                        "parent": fk.parent,
                        "parent_cols": list(fk.parent_cols),
                    }
                    for fk in self.fks
                ],
            },
            indent=1,
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, text: str) -> "Catalog":
        raw = json.loads(text)
        cat = cls()
        for n, t in raw["tables"].items():
            cat.tables[n] = TableSpec(
                n,
                tuple(t["pk"]),
                tuple(t.get("columns", ())),
                t.get("synthetic_pk", False),
                dict(t.get("defaults", {})),
            )
        for fk in raw["fks"]:
            cat.fks.append(
                ForeignKey(
                    fk["child"], tuple(fk["child_cols"]), fk["parent"], tuple(fk["parent_cols"])
                )
            )
        return cat


def synthesize_pk(columns: list[str]) -> tuple[tuple[str, ...], bool]:
    """Pick a synthetic PK for a table with none declared.

    Mirrors the reference heuristic (id / uuid, else first ``*_id`` /
    ``*key`` column, else all columns) — see
    ``/root/reference/dbcut/database.py:411-428`` for the behavior being
    matched (not copied: that code builds SQLAlchemy constraints).
    """
    for cand in ("id", "uuid"):
        if cand in columns:
            return (cand,), True
    for c in columns:
        if c.endswith("_id") or c.endswith("key"):
            return (c,), True
    return tuple(columns), True


# ---------------------------------------------------------------------------
# Static catalog for the harness testdata (TESTDATA.md).
# FK chain: lineitem→{orders,part,supplier}, orders→customer,
# customer→nation, supplier→nation, nation→region, events→customer.
# ---------------------------------------------------------------------------

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def tpch_catalog() -> Catalog:
    cat = Catalog()
    specs = {
        "region": ("r_regionkey",),
        "nation": ("n_nationkey",),
        "customer": ("c_custkey",),
        "supplier": ("s_suppkey",),
        "part": ("p_partkey",),
        "orders": ("o_orderkey",),
        "lineitem": ("l_orderkey", "l_linenumber"),
        "events": ("event_id",),
        "documents": ("doc_id",),
        "embeddings": ("vec_id",),
    }
    for name, pk in specs.items():
        cat.tables[name] = TableSpec(name, pk)
    cat.fks = [
        ForeignKey("nation", ("n_regionkey",), "region", ("r_regionkey",)),
        ForeignKey("customer", ("c_nationkey",), "nation", ("n_nationkey",)),
        ForeignKey("supplier", ("s_nationkey",), "nation", ("n_nationkey",)),
        ForeignKey("orders", ("o_custkey",), "customer", ("c_custkey",)),
        ForeignKey("lineitem", ("l_orderkey",), "orders", ("o_orderkey",)),
        ForeignKey("lineitem", ("l_partkey",), "part", ("p_partkey",)),
        ForeignKey("lineitem", ("l_suppkey",), "supplier", ("s_suppkey",)),
        ForeignKey("events", ("user_id",), "customer", ("c_custkey",)),
    ]
    return cat


TPCH_CATALOG = tpch_catalog()


def infer_catalog(spark, sf_dir: str, tables: list[str] | None = None) -> Catalog:
    """Infer a catalog from parquet files: columns from the footer schema,
    PK via the synthetic-PK heuristic, FKs by name matching (a column of
    table A equal to the PK column name of table B ⇒ FK A→B).

    This is the parquet-mode analogue of the reference's live reflection
    (``/root/reference/dbcut/database.py:166-211``).
    """
    cat = Catalog()
    names = tables or [
        f[: -len(".parquet")] for f in sorted(os.listdir(sf_dir)) if f.endswith(".parquet")
    ]
    cols_by_table: dict[str, list[str]] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        cols = spark.read.parquet(path).columns
        cols_by_table[name] = cols
        pk, synthetic = synthesize_pk(cols)
        cat.tables[name] = TableSpec(name, pk, tuple(cols), synthetic)
    # FK inference requires an UNAMBIGUOUS PK-name → table mapping: two
    # tables both keyed 'id' would previously collapse onto one
    # arbitrary 'owner', fabricating an FK from every other table's own
    # id column into it — the closure would then join unrelated id
    # spaces (round-10 review). A PK name owned by more than one table
    # infers no edges; generic schemas should supply explicit FKs.
    owners: dict[str, list[str]] = {}
    for n in names:
        if len(cat.tables[n].pk) == 1:
            owners.setdefault(cat.tables[n].pk[0], []).append(n)
    pk_owner = {col: ts[0] for col, ts in owners.items() if len(ts) == 1}
    for name in names:
        for col in cols_by_table[name]:
            owner = pk_owner.get(col)
            if owner and owner != name:
                cat.fks.append(ForeignKey(name, (col,), owner, (cat.tables[owner].pk[0],)))
    return cat


def topo_order(catalog: "Catalog") -> list[str]:
    """Parents before children (insert order); reverse for deletes.
    Pure catalog logic shared by both front doors (CLI and Engine)."""
    order: list[str] = []
    pending = set(catalog.tables)
    while pending:
        progressed = False
        for table in sorted(pending):
            deps = {fk.parent for fk in catalog.fks_of(table)} - {table}
            if deps <= set(order):
                order.append(table)
                pending.remove(table)
                progressed = True
                break
        if not progressed:  # FK cycle: break deterministically
            table = sorted(pending)[0]
            order.append(table)
            pending.remove(table)
    return order


def detect_catalog(spark, source: str) -> "Catalog":
    """Catalog for a source: dialect-agnostic DatabaseMetaData
    reflection for jdbc: URLs; for parquet directories the curated
    static TPC-H catalog when the harness tables are present, else
    schema inference. One sniff, shared by CLI and Engine."""
    import os as _os

    if source.startswith("jdbc:"):
        from dbcut_spark.sources.jdbc import reflect_catalog_metadata

        return reflect_catalog_metadata(spark, source)
    present = {
        f[: -len(".parquet")]
        for f in _os.listdir(source)
        if f.endswith(".parquet")
    } if _os.path.isdir(source) else set()
    # the curated catalog applies only when the directory holds the
    # harness tables AND nothing else: a real dump with extra tables
    # (partsupp, user tables) previously got the static catalog too,
    # making the extras invisible to every command — silently
    # referentially-incomplete cuts with exit code 0 (round-10
    # review). A deep COPY, not the module singleton: callers mutate
    # their catalog (fks.append in notebooks), and handing out the
    # shared instance let one Engine's edit pollute every other
    # consumer and the fixture plans.
    if (
        {"region", "nation", "customer", "orders", "lineitem"} <= present
        and present <= set(TPCH_CATALOG.tables)
    ):
        import copy as _copy

        return _copy.deepcopy(TPCH_CATALOG)
    return infer_catalog(spark, source)
