"""Dual-format date parsing (reference parity P6, transform.py:41-50).

The reference's census files switch format at 2014: ``dd/MM/yyyy`` for
year > 2014, SAS-style ``ddMMMyyyy:HH:mm:ss`` (English month abbrevs,
e.g. ``01FEB2013:00:00:00``) before. The reference used a per-row Python
UDF; here both formats are native ``to_date``/``to_timestamp`` Catalyst
expressions (null on malformed input — same semantics as the UDF's
exception path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MODERN_FORMAT = "dd/MM/yyyy"
SAS_FORMAT = "ddMMMyyyy:HH:mm:ss"


def parse_census_date(col: str | Column, year: int) -> Column:
    """Year-dependent date parse; malformed/NULL input → NULL (DateType)."""
    c = F.col(col) if isinstance(col, str) else col
    if year > 2014:
        return F.try_to_timestamp(c, F.lit(MODERN_FORMAT)).cast("date")
    # SAS month abbreviations are uppercase English (01JAN2011:00:00:00);
    # Spark's parser wants title-case (Jan) under the default locale, so
    # normalize case first: initcap of the 3-letter month slice.
    normalized = F.concat(
        F.substring(c, 1, 2),
        F.initcap(F.lower(F.substring(c, 3, 3))),
        F.substring(c, 6, 100),
    )
    return F.try_to_timestamp(normalized, F.lit(SAS_FORMAT)).cast("date")
