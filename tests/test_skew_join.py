"""salted_join must be row-identical to the plain join for every
supported join type — including NULL keys, NULL salt sources, unmatched
rows on either side, and a hot key — and must refuse build-preserving
join types (which would duplicate unmatched build rows n_salts times).
"""

from __future__ import annotations

import pytest

from censo_escolar_spark.operators.skew import salted_join


@pytest.fixture()
def sides(spark):
    # key 1 is "hot" (4 of 6 probe rows); key 9 unmatched in build;
    # NULL key and NULL salt-source rows exercise the hash path.
    probe = spark.createDataFrame(
        [
            (1, 10, "a"),
            (1, 11, "b"),
            (1, 12, "c"),
            (1, 13, "d"),
            (2, 14, "e"),
            (9, 15, "f"),
            (None, 16, "g"),
            (2, None, "h"),
        ],
        "k long, line long, payload string",
    )
    build = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k long, label string"
    )
    return probe, build


def _sorted_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_row_identical_to_plain_join(spark, sides, how):
    probe, build = sides
    plain = probe.join(build, ["k"], how)
    salted = salted_join(probe, build, ["k"], salt_from="line", n_salts=4, how=how)
    assert _sorted_rows(salted) == _sorted_rows(plain)
    assert "__salt" not in salted.columns


def test_hot_key_rows_spread_across_salts(spark, sides):
    probe, _ = sides
    from pyspark.sql import functions as F

    salts = (
        probe.filter("k = 1")
        .select(F.pmod(F.xxhash64("line"), F.lit(4)).alias("s"))
        .distinct()
        .count()
    )
    assert salts > 1, "4 hot-key rows should land in >1 salt bucket"


def test_build_preserving_joins_rejected(sides):
    probe, build = sides
    with pytest.raises(ValueError, match="probe-preserving"):
        salted_join(probe, build, ["k"], salt_from="line", how="full")
