"""Declarative data-quality expectations over a DataFrame — the
deequ-style constraint checker a pipeline runs before trusting a new
source (and the natural companion to operators/profile.py).

Rules are plain dicts; the checker folds every SCALAR rule (not_null,
in_range, accepted_values, matches) plus every uniqueness rule into
ONE aggregate pass over the table — violations are `sum(when(...))`
counters and `count - count_distinct` respectively, all partial-
aggregated map-side. Referential rules (foreign_key) are one LEFT
ANTI join count each against their parent frame (broadcast when the
parent is small — AQE's call). The result is one row per rule::

    rule        string   e.g. "not_null(o_custkey)"
    kind        string   rule type
    checked     long     rows the rule examined
    violations  long     rows that failed
    passed      boolean  violations == 0

Nothing collects: the returned frame is lazy, so a caller can gate a
write on `.filter(~passed).isEmpty()` or persist the report next to
the data.

Scale notes: the single-pass fold means N scalar rules cost one scan
regardless of N. `unique` uses COUNT(DISTINCT ...) which plans an
EXPAND per distinct aggregate — certifiable and fine per-table, but
for many unique rules over a 100 TB table prefer one rule per run or
the approx profiler. NULL semantics follow SQL: in_range /
accepted_values / matches skip NULLs (not_null is the rule that
charges them), and unique counts only fully-non-NULL keys.

Reference parity: the reference validates nothing about the data it
cuts (it trusts the source schema); this is the operator its users
ask for first when the source is an untrusted 100 TB dump.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALAR_KINDS = ("not_null", "in_range", "accepted_values", "matches")


def _rule_id(rule: dict) -> str:
    kind = rule["rule"]
    if kind == "unique":
        return f"unique({','.join(rule['cols'])})"
    if kind == "foreign_key":
        return (
            f"foreign_key({','.join(rule['cols'])} -> "
            f"{rule['ref']}.{','.join(rule['ref_cols'])})"
        )
    return f"{kind}({rule['col']})"


def _validate(rules: list[dict], df_cols: set, refs: dict) -> None:
    if not rules:
        raise ValueError("check_constraints: no rules")
    for r in rules:
        kind = r.get("rule")
        if kind in _SCALAR_KINDS:
            if r.get("col") not in df_cols:
                raise ValueError(
                    f"{_rule_id(r) if r.get('col') else kind}: column "
                    f"{r.get('col')!r} not in the frame"
                )
            if kind == "in_range" and ("lo" not in r or "hi" not in r):
                raise ValueError(f"{_rule_id(r)}: needs lo and hi")
            if kind == "accepted_values" and not r.get("values"):
                raise ValueError(f"{_rule_id(r)}: needs non-empty values")
            if kind == "matches" and not r.get("pattern"):
                raise ValueError(f"{_rule_id(r)}: needs a regex pattern")
        elif kind == "unique":
            missing = [c for c in r.get("cols", []) if c not in df_cols]
            if not r.get("cols") or missing:
                raise ValueError(
                    f"unique rule: columns {missing or '(none)'} invalid"
                )
        elif kind == "foreign_key":
            if r.get("ref") not in refs:
                raise ValueError(
                    f"{_rule_id(r)}: ref {r.get('ref')!r} not provided "
                    f"in refs (has {sorted(refs)})"
                )
            missing = [c for c in r.get("cols", []) if c not in df_cols]
            if not r.get("cols") or missing:
                raise ValueError(
                    f"foreign_key rule: child columns {missing} invalid"
                )
            if len(r["cols"]) != len(r.get("ref_cols", [])):
                raise ValueError(
                    f"{_rule_id(r)}: cols and ref_cols lengths differ"
                )
        else:
            raise ValueError(
                f"unknown rule kind {kind!r}; one of "
                f"{_SCALAR_KINDS + ('unique', 'foreign_key')}"
            )


def check_constraints(
    df: DataFrame, rules: list[dict], refs: dict | None = None
) -> DataFrame:
    """Evaluate ``rules`` against ``df``; see module doc for the rule
    vocabulary and the report schema. ``refs`` maps foreign_key rule
    ``ref`` names to their parent DataFrames."""
    refs = refs or {}
    _validate(rules, set(df.columns), refs)
    spark = df.sparkSession

    aggs = [F.count(F.lit(1)).alias("__rows")]
    fold: list[tuple[dict, str, str]] = []  # (rule, checked_col, viol_col)
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "foreign_key":
            continue
        c = F.col(r["col"]) if kind in _SCALAR_KINDS else None
        if kind == "not_null":
            checked = F.count(F.lit(1))
            viol = F.sum(F.when(c.isNull(), 1).otherwise(0))
        elif kind == "in_range":
            checked = F.count(c)
            viol = F.sum(
                F.when(
                    c.isNotNull()
                    & ((c < F.lit(r["lo"])) | (c > F.lit(r["hi"]))),
                    1,
                ).otherwise(0)
            )
        elif kind == "accepted_values":
            checked = F.count(c)
            viol = F.sum(
                F.when(
                    c.isNotNull() & ~c.isin(list(r["values"])), 1
                ).otherwise(0)
            )
        elif kind == "matches":
            checked = F.count(c)
            viol = F.sum(
                F.when(
                    c.isNotNull() & ~c.rlike(r["pattern"]), 1
                ).otherwise(0)
            )
        else:  # unique
            cols = [F.col(x) for x in r["cols"]]
            nonnull = cols[0].isNotNull()
            for x in cols[1:]:
                nonnull = nonnull & x.isNotNull()
            checked = F.sum(F.when(nonnull, 1).otherwise(0))
            viol = checked - F.count_distinct(*cols)
        aggs.append(checked.cast("long").alias(f"__ck_{i}"))
        aggs.append(F.coalesce(viol.cast("long"), F.lit(0)).alias(f"__vl_{i}"))
        fold.append((r, f"__ck_{i}", f"__vl_{i}"))

    # NOT respread before the fold (profile._spread_for_agg was A/B'd
    # here in round 12 and REJECTED: counts/sum(when)/count_distinct
    # over the 1-split sf0.1 orders ran 0.77s serial vs 1.13s spread —
    # unlike the profiler's decimal-moment aggregates, this fold is too
    # cheap per row to pay a full-row shuffle for map-side parallelism)
    one = df.agg(*aggs)
    parts = [
        f"'{_rule_id(r)}', '{r['rule']}', {ck}, {vl}"
        for r, ck, vl in fold
    ]
    report = None
    if parts:
        report = one.select(
            F.expr(
                f"stack({len(parts)}, {', '.join(parts)}) AS "
                "(rule, kind, checked, violations)"
            )
        )

    for r in rules:
        if r["rule"] != "foreign_key":
            continue
        parent = refs[r["ref"]]
        bad = [c for c in r["ref_cols"] if c not in parent.columns]
        if bad:
            raise ValueError(
                f"{_rule_id(r)}: ref columns {bad} not in parent frame"
            )
        child = df.select(*r["cols"])
        nonnull = F.col(r["cols"][0]).isNotNull()
        for c in r["cols"][1:]:
            nonnull = nonnull & F.col(c).isNotNull()
        child = child.filter(nonnull)
        pk = parent.select(
            *[
                F.col(rc).alias(f"__ref_{i}")
                for i, rc in enumerate(r["ref_cols"])
            ]
        ).distinct()
        cond = None
        for i, cc in enumerate(r["cols"]):
            e = F.col(cc) == F.col(f"__ref_{i}")
            cond = e if cond is None else (cond & e)
        orphans = child.join(pk, cond, "left_anti")
        row = child.agg(
            F.count(F.lit(1)).cast("long").alias("checked")
        ).crossJoin(
            orphans.agg(
                F.count(F.lit(1)).cast("long").alias("violations")
            )
        ).select(
            F.lit(_rule_id(r)).alias("rule"),
            F.lit("foreign_key").alias("kind"),
            "checked",
            "violations",
        )
        report = row if report is None else report.unionByName(row)

    return report.select(
        "rule",
        "kind",
        "checked",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("rule")
