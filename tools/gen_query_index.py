"""Generate docs/queries.md — one row per registered query: name,
defining module, oracle coverage, and the first docstring line.

Regenerate after adding queries: python tools/gen_query_index.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from dbcut_spark.queries import ORACLES, QUERIES

    lines = [
        "# Query index",
        "",
        f"{len(QUERIES)} registered queries "
        f"({sum(1 for q in QUERIES if q in ORACLES)} with a DuckDB "
        "value-hash oracle). Regenerate: `python tools/gen_query_index.py`.",
        "",
        "| query | module | oracle | summary |",
        "|---|---|---|---|",
    ]
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        mod = getattr(fn, "__module__", "?").replace("dbcut_spark.", "")
        doc = (fn.__doc__ or "").strip().splitlines()
        summary = doc[0].rstrip() if doc else ""
        oracle = "yes" if name in ORACLES else "rows-only"
        lines.append(f"| `{name}` | {mod} | {oracle} | {summary} |")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "queries.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
