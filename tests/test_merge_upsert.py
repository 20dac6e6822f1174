"""merge_upsert edge semantics (q62 oracle covers fixture parity)."""

from __future__ import annotations

from censo_escolar_spark.operators.merge import merge_upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)],
        "k long, s string, v double",
    )


def _cdc(spark, rows):
    return spark.createDataFrame(rows, "k long, op string, s string, v double")


def _merged(spark, rows):
    cdc = _cdc(spark, rows).select("k", "s", "v", "op")
    out = merge_upsert(_base(spark), cdc, "k").collect()
    return {r["k"]: (r["s"], r["v"]) for r in out}


def test_update_matched_row(spark):
    got = _merged(spark, [(2, "U", "B2", 99.0)])
    assert got == {1: ("a", 10.0), 2: ("B2", 99.0), 3: (None, 30.0)}


def test_insert_new_key(spark):
    got = _merged(spark, [(9, "I", "new", 1.0)])
    assert got[9] == ("new", 1.0) and len(got) == 4


def test_delete_matched_and_unmatched(spark):
    # delete of key 2 removes it; delete of absent key 42 is a no-op
    got = _merged(spark, [(2, "D", None, None), (42, "D", None, None)])
    assert set(got) == {1, 3}


def test_update_can_set_null_payload(spark):
    got = _merged(spark, [(1, "U", None, 5.0)])
    assert got[1] == (None, 5.0)


def test_base_null_payload_survives_untouched(spark):
    got = _merged(spark, [(2, "U", "x", 0.0)])
    assert got[3] == (None, 30.0)


def test_mixed_batch(spark):
    got = _merged(
        spark,
        [(1, "D", None, None), (2, "U", "u", 2.5), (7, "I", "i", 7.0)],
    )
    assert set(got) == {2, 3, 7}
    assert got[2] == ("u", 2.5) and got[7] == ("i", 7.0)
