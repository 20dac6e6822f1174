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
  Second divergence, also deliberate: the reference's drop list runs
  UNCONDITIONALLY — year >= 2019 escolas (and any table carrying these
  names) also lose IN_DORMITORIO_ALUNO / IN_DORMITORIO_PROFESSOR /
  CO_LINGUA_INDIGENA there, while this engine applies the drift logic
  only where drift exists (pre-2019 escolas) and KEEPS the native
  post-2019 columns. Consumers expecting reference-identical post-2019
  schemas will see these extra (populated) columns here.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from censo_escolar_spark.functions.dates import parse_census_date
from censo_escolar_spark.functions.decode import (
    decode_with_broadcast_join,
    map_as_dimension,
    map_expr,
)

#: Above this many entries a dict is decoded via broadcast LEFT join
#: instead of an inline ``create_map`` literal. The reference's biggest
#: dicts (CO_IES 6,296 entries, CO_MUNICIPIO 5,570 — maps.json) would
#: otherwise each become a 12k+-literal Catalyst expression; several such
#: columns in one projection blow up analysis/codegen time and constant
#: pool size, while a broadcast join ships the dict ONCE per executor.
BROADCAST_DECODE_THRESHOLD = 1024

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
    broadcast_threshold: int = BROADCAST_DECODE_THRESHOLD,
) -> DataFrame:
    """P3+P4+P5+P7 as a single projection (one plan node, codegen-friendly).

    Map columns whose dict exceeds ``broadcast_threshold`` entries are
    decoded by broadcast LEFT join after the projection instead of an
    inline map literal — same miss→NULL semantics, no fact-side shuffle,
    but the dict travels as broadcast data rather than a giant expression
    tree (see BROADCAST_DECODE_THRESHOLD)."""
    big_map_cols = [
        n
        for n in df.columns
        if n.startswith(("TP_", "CO_"))
        and n in maps
        and len(maps[n]) > broadcast_threshold
    ]
    small_maps = {k: v for k, v in maps.items() if k not in set(big_map_cols)}
    out = df.select(
        *[
            F.col(n)
            if n in big_map_cols
            else decode_column(
                n, year=year, table=table, maps=small_maps, date_columns=date_columns
            )
            for n in df.columns
        ]
    )
    spark = df.sparkSession
    for n in big_map_cols:
        out = decode_with_broadcast_join(out, map_as_dimension(spark, maps[n]), n)
    return out


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
    from pyspark.errors import AnalysisException

    wanted_df = spark.createDataFrame([(int(y),) for y in wanted], f"{partition_col} int")
    try:
        existing = spark.read.parquet(sink_path).select(partition_col).distinct()
    except AnalysisException as e:
        # ONLY "sink does not exist yet" means everything is missing. A
        # transient failure (permissions, bad mount) must raise — treating
        # it as empty would re-append every year and duplicate the sink
        # (the O1 idempotency guarantee, reference censo_escolar.py:39-60).
        cond = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", None)
        condition = cond() if cond is not None else None
        # UNABLE_TO_INFER_SCHEMA = the directory exists but holds no
        # parquet yet (first run died between mkdir and commit) — that is
        # still "empty sink", not a transient failure.
        if condition in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA") or (
            "Path does not exist" in str(e) or "Unable to infer schema" in str(e)
        ):
            return [int(y) for y in wanted]
        raise
    remaining = wanted_df.join(existing, partition_col, "left_anti")
    return sorted(r[0] for r in remaining.collect())
