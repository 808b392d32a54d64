"""Nested JSON export (reference K2): one document per root row with
every relation along the extraction tree embedded recursively.

The reference serializes the loaded ORM object graph
(``/root/reference/dbcut/models.py:55-77`` ``__to_dict__``, encoder
``/root/reference/dbcut/serializer.py:15-54``): scalar relations embed a
single nested object, collections embed lists; datetimes render ISO-8601.

Spark-first re-expression: assemble nested *columns* bottom-up along the
tree — each child subtree reduces to a struct column; ONETOMANY children
are grouped ``collect_list(struct(...))`` (PK-sorted for determinism)
and joined to the parent; MANYTOONE children join 1:1. The result is a
single DataFrame whose rows are the documents — written with
``df.write.json`` so the export is fully distributed (no driver
materialization, unlike the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbcut_spark.graph import Direction, TreeNode
from dbcut_spark.plans.extraction import ExtractionPlan


def _assemble(
    plan: ExtractionPlan, node: TreeNode, frontiers: dict[int, DataFrame]
) -> DataFrame:
    """Return the node's frontier frame with one extra column per child
    relation (struct for ¹, sorted array<struct> for ⁿ)."""
    df = frontiers[id(node)]
    own_cols = list(df.columns)
    rel_cols: list[str] = []
    for child in node.children:
        rel = child.relationship
        assert rel is not None
        child_df = _assemble(plan, child, frontiers)
        # disambiguate colliding relation names (two FKs between the
        # same pair of tables both yield '<child>_collection' / the
        # same scalar stem): withColumn REPLACES an existing column, so
        # the first edge's collection would silently vanish and the
        # scalar mirror would die on an ambiguous reference (round-10
        # review). The first edge keeps the reference-convention name;
        # later ones append their FK source columns.
        rel_name = rel.name
        if rel_name in rel_cols or rel_name in own_cols:
            rel_name = f"{rel_name}__{'_'.join(rel.source_cols)}"
        # collapse the child subtree into one struct column; PK first so
        # sort_array gives deterministic collection order
        pk = list(plan.catalog.table(child.table).pk)
        struct_cols = pk + [c for c in child_df.columns if c not in pk]
        packed = child_df.select(
            *[F.col(c).alias(f"__k_{i}") for i, c in enumerate(rel.target_cols)],
            F.struct(*struct_cols).alias("__doc"),
        )
        if rel.direction is Direction.ONETOMANY:
            grouped = packed.groupBy(*[f"__k_{i}" for i in range(len(rel.source_cols))]).agg(
                F.sort_array(F.collect_list("__doc")).alias("__docs")
            )
            on = [df[s] == grouped[f"__k_{i}"] for i, s in enumerate(rel.source_cols)]
            df = (
                df.join(grouped, on, "left_outer")
                .drop(*[f"__k_{i}" for i in range(len(rel.source_cols))])
                .withColumn(
                    rel_name,
                    # cast to the DataType OBJECT: simpleString() DDL
                    # fails to re-parse column names needing quoting
                    F.coalesce(
                        F.col("__docs"),
                        F.array().cast(grouped.schema["__docs"].dataType),
                    ),
                )
                .drop("__docs")
            )
        else:
            on = [
                df[s] == packed[f"__k_{i}"]
                for i, s in enumerate(rel.source_cols)
            ]
            df = (
                df.join(packed, on, "left_outer")
                .drop(*[f"__k_{i}" for i in range(len(rel.source_cols))])
                .withColumnRenamed("__doc", rel_name)
            )
        rel_cols.append(rel_name)
    return df.select(*own_cols, *rel_cols)


def nested_documents(
    plan: ExtractionPlan, frontiers: dict[int, DataFrame]
) -> DataFrame:
    """One row per root entity, relations embedded as nested columns."""
    return _assemble(plan, plan.tree.root, frontiers)


def nested_export(
    plan: ExtractionPlan,
    frontiers: dict[int, DataFrame],
    path: str,
) -> None:
    """Write the nested documents as JSON lines (ISO-8601 timestamps,
    matching the reference's encoder renderings). Fractional seconds
    are preserved at microsecond precision — a seconds-only format
    silently dropped sub-second data on every timestamp (round-8
    review fix); divergence from the reference: Python isoformat()
    omits the fraction when it is exactly zero, Spark's fixed pattern
    renders .000000."""
    docs = nested_documents(plan, frontiers)
    (
        docs.write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )
