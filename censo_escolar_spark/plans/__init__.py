"""Query library exposed through __spark_entry__.py.

Each module registers (name -> callable) in ``QUERIES`` and a matching
ANSI-SQL oracle in ``ORACLE``. The driver runs both sides on the same
parquet and compares row-count + schema + order-insensitive value hash,
so every query is written to be cross-engine deterministic:

- sums/averages go through DECIMAL(18,2) so results are exact and
  independent of summation order (float += is order-dependent; decimal
  is not);
- every computed column is aliased identically on both sides;
- integer widths are pinned with explicit casts (DuckDB's year()/length()
  return BIGINT, Spark's return INT — one side is cast);
- top-k orderings carry a unique tie-break key.
"""

from censo_escolar_spark.plans.registry import ORACLE, QUERIES, register

__all__ = ["QUERIES", "ORACLE", "register"]
