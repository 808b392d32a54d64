"""Dump the executed physical plan of every headline query to
EXPLAIN.md — the review artifact for "is this the plan you'd want at
100 TB": check PushedFilters/ReadSchema on every scan, broadcast vs
shuffle joins, partial aggregation, codegen spans (`*(n)`).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from bench import HEADLINE
    from dbcut_spark.queries import QUERIES
    from dbcut_spark.session import get_spark

    spark = get_spark("plan-dump")
    out = [
        "# EXPLAIN — executed physical plans (headline queries, "
        f"{sf_dir})",
        "",
        "Regenerate: `python tools/dump_plans.py`. Reviewed properties:",
        "filters/projection pushed to the scan, dimension joins broadcast,",
        "partial aggregation before shuffles, `*(n)` codegen spans wide,",
        "no Python eval in relational paths.",
        "",
    ]
    for name in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        df.collect()  # AQE: final plan only exists after execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        # keep the final plan section only (drop AQE's initial-plan echo)
        plan = plan.split("+- == Initial Plan ==")[0].rstrip()
        # text-cleaning queries carry raw control chars in literals —
        # escape them so the artifact stays a text file
        plan = "".join(
            ch if ch in "\n\t" or ord(ch) >= 0x20 else f"\\x{ord(ch):02x}"
            for ch in plan
        )
        out.append(f"## {name}\n\n```\n{plan}\n```\n")
        spark.catalog.clearCache()

    with open(os.path.join(os.path.dirname(__file__), "..", "EXPLAIN.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(HEADLINE)} plans)")


if __name__ == "__main__":
    main()
