"""Driver-checked queries exercising the censo-parity ETL engine.

The Family-B censo fixtures live only in tests/, so these queries stage
censo-shaped string columns from the driver's tables and push them
through the REAL convention engine (etl/pipeline.py) — the DuckDB oracle
re-states the decode semantics in plain SQL. This puts P2-P6 (dict
decode null-on-miss, boolean decode, try-cast int, dual-format date
parse) inside the hash-checked correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from censo_escolar_spark.etl.pipeline import decode_column
from censo_escolar_spark.plans.registry import register
from censo_escolar_spark.sources.readers import load_table

# Deliberately missing "P": exercises null-on-unmapped (reference dict.get).
_STATUS_MAP = {"O": "Open", "F": "Finished"}


@register(
    "c01_censo_conventions",
    oracle="""
    SELECT o_orderkey,
      CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished' END AS TP_STATUS,
      CASE WHEN o_orderpriority = '1-URGENT' THEN true
           WHEN o_orderpriority = '2-HIGH' THEN false
           ELSE NULL END AS IN_URGENT,
      TRY_CAST(CASE WHEN month(o_orderdate) = 1 THEN 'bad'
                    ELSE CAST(year(o_orderdate) AS VARCHAR) END AS INTEGER) AS NU_YEAR,
      CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS DT_MODERN,
      CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS DT_LEGACY
    FROM orders
    """,
)
def c01_censo_conventions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage censo-convention string columns, then run the real engine.

    - TP_STATUS: dict decode with a deliberately-missing key ('P' → NULL);
    - IN_URGENT: "1"/"0"/other-string boolean decode;
    - NU_YEAR:   try-cast int with planted malformed values;
    - DT_MODERN: dd/MM/yyyy parse (year>2014 branch);
    - DT_LEGACY: SAS ddMMMyyyy:HH:mm:ss parse (year<=2014 branch).
    """
    o = load_table(spark, sf_dir, "orders")
    staged = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("TP_STATUS"),
        F.when(F.col("o_orderpriority") == "1-URGENT", "1")
        .when(F.col("o_orderpriority") == "2-HIGH", "0")
        .otherwise("9")
        .alias("IN_URGENT"),
        F.when(F.month("o_orderdate") == 1, "bad")
        .otherwise(F.year("o_orderdate").cast("string"))
        .alias("NU_YEAR"),
        F.date_format("o_orderdate", "dd/MM/yyyy").alias("DT_MODERN"),
        F.concat(
            F.date_format("o_orderdate", "dd"),
            F.upper(F.date_format("o_orderdate", "MMM")),
            F.date_format("o_orderdate", "yyyy"),
            F.lit(":00:00:00"),
        ).alias("DT_LEGACY"),
    )
    # decode_column is the per-column convention engine that
    # apply_conventions fans out over a whole table (the fused path is
    # oracle-adjacent via tests/test_etl_censo.py). Using it directly here
    # lets the two date columns take different year branches in ONE narrow
    # projection — the alternative (two apply_conventions calls joined on
    # o_orderkey) re-scans orders and shuffles 150k rows per side at sf0.1.
    common = dict(table="synthetic", maps={"TP_STATUS": _STATUS_MAP})
    decoded = staged.select(
        "o_orderkey",
        decode_column("TP_STATUS", year=2020, date_columns=(), **common),
        decode_column("IN_URGENT", year=2020, date_columns=(), **common),
        decode_column("NU_YEAR", year=2020, date_columns=(), **common),
        decode_column("DT_MODERN", year=2020, date_columns=("DT_MODERN",), **common),
        decode_column("DT_LEGACY", year=2013, date_columns=("DT_LEGACY",), **common),
    )
    # DateType → midnight timestamp for the hash compare only: pandas (the
    # oracle's transport) has no date dtype. The DateType semantics proper
    # are asserted in tests/test_etl_censo.py.
    return decoded.withColumn("DT_MODERN", F.col("DT_MODERN").cast("timestamp")).withColumn(
        "DT_LEGACY", F.col("DT_LEGACY").cast("timestamp")
    )
