"""Dump `.explain("formatted")` for named queries to plans/r12/.

Usage: python tools/explain_r11.py <tag> <query> [query ...]
       python tools/explain_r11.py <tag> --file <list.txt>

Writes plans/r12/<query>_<tag>.txt (tag = before|after). Planning only:
the query function builds the frame and we capture the formatted plan
without executing it (no AQE finalization — the judge-checkable
artifact for Exchange counts, join strategy, PushedFilters, ReadSchema,
codegen spans, Python eval nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    if sys.argv[2] == "--file":
        with open(sys.argv[3]) as f:
            names = [l.strip() for l in f if l.strip()]
    else:
        names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dbcut_spark.operators.pinning import release_pinned
    from dbcut_spark.queries import QUERIES
    from dbcut_spark.session import get_spark

    spark = get_spark("explain-r12")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        plan = "".join(
            ch if ch in "\n\t" or ord(ch) >= 0x20 else f"\\x{ord(ch):02x}"
            for ch in plan
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        release_pinned()
        spark.catalog.clearCache()
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
