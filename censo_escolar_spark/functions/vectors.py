"""Vector (embedding) column expressions — JVM-side, no UDFs.

Dot products / norms via ``zip_with`` + ``aggregate`` fold in double
precision. The left-to-right fold order makes results bit-identical to
DuckDB's ``list_dot_product`` on double-cast lists (verified empirically),
so cosine queries are oracle-matched without rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def max_abs(a: Column) -> Column:
    """max |x| over the vector — the symmetric-quantization range."""
    return F.array_max(F.transform(a, lambda x: F.abs(x)))


def quantize_scale(a: Column) -> Column:
    """Per-vector int8 symmetric-quantization scale: 127 / max|x|.
    One division of exact inputs — bit-identical cross-engine.

    An all-zero vector (padding row, failed encode) has no scale: NULL,
    so downstream quantized elements are NULL too. Unguarded, 127/0 =
    Inf and 0·Inf = NaN, whose int cast throws under ANSI mode."""
    m = max_abs(a)
    return F.when(m > 0, F.lit(127.0) / m)


def quantize_element(x: Column, scale: Column) -> Column:
    """round-half-up via floor(x·scale + 0.5): floor is exact on doubles,
    unlike round(), whose half-way tie rule differs between engines."""
    return F.floor(x * scale + F.lit(0.5)).cast("int")
