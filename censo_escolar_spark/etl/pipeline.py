"""Census-transform pipeline: the reference's ETL semantics, Spark-first.

Re-implements the per-table transform (reference transform.py:140-148 and
its helpers) as ONE declarative ``select`` of native Catalyst expressions —
no Python UDFs, no per-column withColumn chains (70-240 plan nodes in the
reference become one projection here, keeping whole-stage codegen intact
and letting the parquet/CSV reader prune columns).

Column-name conventions ARE the type system (SURVEY.md §1):
- ``TP_*`` / ``CO_*`` — categorical codes decoded via maps (miss → NULL)
  [transform.py:68-77];
- ``IN_*`` — "0"/"1" flags → boolean, anything else NULL
  [transform.py:80-92];
- ``NU_*`` / ``QT_*`` — integers, malformed → NULL (try_cast: Spark 4's
  default ANSI mode would otherwise throw where the reference yields NULL)
  [transform.py:95-101];
- ``DT_*`` — dates, year-dependent format, escolas only
  [transform.py:104-109];
- everything else passes through untouched.

Year-conditional drift handling [transform.py:112-137]:
- P8 OR-merge for pre-2019 escolas;
- P9 rename implements the EVIDENT INTENT (rename old→new, drop old).
  The reference drops the two dormitório columns it just created
  (transform.py:135 lists the NEW names) — almost certainly a bug; the
  divergence is deliberate and documented here and in SURVEY.md §2b.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from censo_escolar_spark.functions.dates import parse_census_date
from censo_escolar_spark.functions.decode import map_expr

#: Columns decoded as dates, per table (transform.py:104-109: escolas only).
DATE_COLUMNS = {"escolas": ("DT_ANO_LETIVO_INICIO", "DT_ANO_LETIVO_TERMINO")}

#: P8 OR-merges: new_col -> (source_a, source_b); escolas, year < 2019
#: (transform.py:112-126).
OR_MERGES = {
    "IN_MANT_ESCOLA_PRIV_ONG_OSCIP": ("IN_MANT_ESCOLA_PRIVADA_ONG", "IN_MANT_ESCOLA_PRIVADA_OSCIP"),
    "IN_ESGOTO_FOSSA": ("IN_ESGOTO_FOSSA_SEPTICA", "IN_ESGOTO_FOSSA_COMUM"),
}

#: P9 renames: old -> new; escolas, year < 2019 (transform.py:129-137,
#: intent semantics — see module docstring).
RENAMES = {
    "IN_ALOJAM_ALUNO": "IN_DORMITORIO_ALUNO",
    "IN_ALOJAM_PROFESSOR": "IN_DORMITORIO_PROFESSOR",
    "CO_LINGUA_INDIGENA": "CO_LINGUA_INDIGENA_1",
}


def prefix_columns(df: DataFrame, prefix: str) -> DataFrame:
    """P1: alias every column to ``{prefix}_{column}`` — one projection.

    (Defined-but-never-called in the reference, transform.py:21-23;
    shipped here because namespacing columns before a wide join is the
    actual use the reference anticipated.)"""
    return df.select([F.col(c).alias(f"{prefix}_{c}") for c in df.columns])


def decode_column(
    name: str,
    *,
    year: int,
    table: str,
    maps: Mapping[str, Mapping[str, str]],
    date_columns: Sequence[str] | None = None,
) -> Column:
    """The convention engine for ONE column: name prefix → native expression."""
    if date_columns is None:
        date_columns = DATE_COLUMNS.get(table, ())
    c = F.col(name)
    if name.startswith(("TP_", "CO_")) and name in maps:
        return map_expr(maps[name], c).alias(name)
    if name.startswith("IN_"):
        return (
            F.when(c == "1", F.lit(True)).when(c == "0", F.lit(False)).otherwise(F.lit(None))
        ).alias(name)
    if name.startswith(("NU_", "QT_")):
        return c.try_cast("int").alias(name)
    if name.startswith("DT_") and name in date_columns:
        return parse_census_date(c, year).alias(name)
    return c


def apply_conventions(
    df: DataFrame,
    *,
    table: str,
    year: int,
    maps: Mapping[str, Mapping[str, str]],
    date_columns: Sequence[str] | None = None,
) -> DataFrame:
    """P3+P4+P5+P7 as a single projection (one plan node, codegen-friendly)."""
    return df.select(
        *[
            decode_column(n, year=year, table=table, maps=maps, date_columns=date_columns)
            for n in df.columns
        ]
    )


def merge_or_columns(df: DataFrame, *, table: str, year: int) -> DataFrame:
    """P8: pre-2019 escolas OR-merge, then drop the source columns.

    Spark's ``drop`` of absent columns is a silent no-op — relied on for
    year >= 2019 exactly as the reference does (transform.py:122-125).
    """
    if table != "escolas" or year >= 2019:
        return df
    out = df
    for new, (a, b) in OR_MERGES.items():
        if a in out.columns and b in out.columns:
            out = out.withColumn(new, F.col(a) | F.col(b))
    return out.drop(*[c for pair in OR_MERGES.values() for c in pair])


def rename_drifted_columns(df: DataFrame, *, table: str, year: int) -> DataFrame:
    """P9 (intent): pre-2019 escolas, rename old column names to the
    post-2019 names and drop the old ones."""
    if table != "escolas" or year >= 2019:
        return df
    out = df
    for old, new in RENAMES.items():
        if old in out.columns:
            out = out.withColumn(new, F.col(old)).drop(old)
    return out


def transform_table(
    df: DataFrame,
    *,
    table: str,
    year: int,
    maps: Mapping[str, Mapping[str, str]],
) -> DataFrame:
    """P11: the fused per-table pipeline (S1 → P3-P9), one lazy narrow chain."""
    out = apply_conventions(df, table=table, year=year, maps=maps)
    out = merge_or_columns(out, table=table, year=year)
    out = rename_drifted_columns(out, table=table, year=year)
    return out


def union_shards(shards: Sequence[DataFrame]) -> DataFrame:
    """U1: n-ary union of regional shards. unionByName (not positional
    unionAll as the reference, transform.py:151-152) so column-order drift
    across shards can never silently mis-align data."""
    return reduce(DataFrame.unionByName, shards)


def missing_partitions(
    spark: SparkSession,
    wanted: Sequence[int],
    sink_path: str,
    partition_col: str = "NU_ANO_CENSO",
) -> list[int]:
    """O1: incremental anti-join — which wanted years are not yet in the sink.

    The reference lists bucket blobs with a regex (censo_escolar.py:39-60);
    here the wanted set left-anti-joins the sink's partition values (a
    metadata-only scan: partition pruning reads no row data).
    """
    wanted_df = spark.createDataFrame([(int(y),) for y in wanted], f"{partition_col} int")
    try:
        existing = spark.read.parquet(sink_path).select(partition_col).distinct()
    except Exception:  # sink does not exist yet → everything is missing
        return [int(y) for y in wanted]
    remaining = wanted_df.join(existing, partition_col, "left_anti")
    return sorted(r[0] for r in remaining.collect())
