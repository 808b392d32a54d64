"""dbcut_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``itsolutionsfactory/dbcut``.

The reference (surveyed in /root/repo/SURVEY.md) extracts a
referentially-consistent subset of a relational database: a YAML query
selects root rows, an FK-graph traversal computes the closure of rows
reachable from those roots, and sinks write the result (DB insert-ignore,
nested JSON, SQL dump) with a content-addressed result cache.

This package re-expresses that engine Spark-first:

- plan construction (FK graph, traversal, include/exclude/depth pruning)
  stays on the driver — it operates on *metadata*, never rows;
- all row movement is DataFrame ops (scans, filters, top-k, semi-joins,
  anti-joins, collect_list nesting) so Catalyst gets predicate pushdown,
  column pruning and join-strategy selection for free;
- beyond-reference operators for large-scale training-data pipelines
  (dedup, similarity search, text analysis, multimodal plumbing,
  streaming) live in ``operators/`` / ``functions/`` / ``streaming/``.
"""

__version__ = "0.1.0"

from dbcut_spark.session import get_spark  # noqa: F401
