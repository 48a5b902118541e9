"""Filter-layer tests — value_filter_test.cc / filter_list_test.cc
cases transliterated to the visible-cell model."""

from __future__ import annotations

from pyspark.sql import functions as F

from tera_spark.operators.filters import (
    FilterList,
    ValueFilter,
    apply_row_filter,
    decode_typed,
    encode_typed,
)


def visible(spark, rows):
    """rows: (row_key, cf, qualifier, ts, value_bytes)"""
    return spark.createDataFrame(
        rows, "row_key string, cf string, qualifier string, ts long, value binary"
    )


def keys(df):
    return sorted({r.row_key for r in df.collect()})


def test_decode_typed_roundtrip(spark):
    cases = [
        ("int64", -1234567890123), ("uint64", 2**63 + 17), ("int32", -70000),
        ("uint32", 4000000000), ("int16", -3000), ("uint16", 60000),
        ("int8", -100), ("uint8", 200),
    ]
    rows = [(t, encode_typed(v, t)) for t, v in cases]
    df = spark.createDataFrame(rows, "t string, b binary")
    for t, v in cases:
        got = df.filter(F.col("t") == t).select(decode_typed(F.col("b"), t).alias("d")).collect()
        assert int(got[0].d) == v, (t, v, got[0].d)


def test_value_filter_int64_ops(spark):
    rows = [
        (f"r{i}", "f", "x", 1, encode_typed(i * 10, "int64")) for i in range(5)
    ]  # values 0,10,20,30,40
    v = visible(spark, rows)
    assert keys(apply_row_filter(v, ValueFilter(">", "f", "x", 15))) == ["r2", "r3", "r4"]
    assert keys(apply_row_filter(v, ValueFilter("<=", "f", "x", 10))) == ["r0", "r1"]
    assert keys(apply_row_filter(v, ValueFilter("==", "f", "x", 30))) == ["r3"]
    assert keys(apply_row_filter(v, ValueFilter("!=", "f", "x", 30))) == ["r0", "r1", "r2", "r4"]


def test_filter_if_missing_both_ways(spark):
    rows = [
        ("r1", "f", "x", 1, encode_typed(5, "int64")),
        ("r1", "f", "y", 1, b"aux"),
        ("r2", "f", "y", 1, b"no x column"),
    ]
    v = visible(spark, rows)
    # default: missing column keeps the row (value_filter.h:51-58)
    assert keys(apply_row_filter(v, ValueFilter(">", "f", "x", 0))) == ["r1", "r2"]
    # filter_if_missing=True: row without the column drops
    assert keys(
        apply_row_filter(v, ValueFilter(">", "f", "x", 0, filter_if_missing=True))
    ) == ["r1"]


def test_whole_row_semantics(spark):
    # a failing filter suppresses ALL cells of the row, not just the tested one
    rows = [
        ("r1", "f", "x", 1, encode_typed(1, "int64")),
        ("r1", "g", "z", 1, b"other-cell"),
        ("r2", "f", "x", 1, encode_typed(100, "int64")),
        ("r2", "g", "z", 1, b"other-cell"),
    ]
    v = visible(spark, rows)
    out = apply_row_filter(v, ValueFilter(">", "f", "x", 50))
    assert keys(out) == ["r2"]
    assert out.count() == 2  # both of r2's cells survive


def test_newest_version_decides(spark):
    rows = [
        ("r1", "f", "x", 1, encode_typed(100, "int64")),  # old: passes
        ("r1", "f", "x", 2, encode_typed(1, "int64")),    # newest: fails
    ]
    v = visible(spark, rows)
    assert keys(apply_row_filter(v, ValueFilter(">", "f", "x", 50))) == []


def test_empty_qualifier_legacy_mode(spark):
    # every cell in the cf must match (FilterCellWithEmptyQualifier)
    rows = [
        ("r1", "f", "a", 1, encode_typed(10, "int64")),
        ("r1", "f", "b", 1, encode_typed(20, "int64")),
        ("r2", "f", "a", 1, encode_typed(10, "int64")),
        ("r2", "f", "b", 1, encode_typed(99, "int64")),
    ]
    v = visible(spark, rows)
    assert keys(apply_row_filter(v, ValueFilter("<", "f", "", 50))) == ["r1"]


def test_filter_list_and_or(spark):
    rows = []
    for i in range(6):
        rows.append((f"r{i}", "f", "x", 1, encode_typed(i, "int64")))
        rows.append((f"r{i}", "f", "y", 1, encode_typed(10 - i, "int64")))
    v = visible(spark, rows)
    fx = ValueFilter(">=", "f", "x", 2)      # r2..r5
    fy = ValueFilter(">", "f", "y", 6)       # y>6 → i<4 → r0..r3
    both = FilterList("and", [fx, fy])       # r2, r3
    either = FilterList("or", [fx, fy])      # r0..r5
    assert keys(apply_row_filter(v, both)) == ["r2", "r3"]
    assert keys(apply_row_filter(v, either)) == ["r0", "r1", "r2", "r3", "r4", "r5"]
    nested = FilterList("and", [fx, FilterList("or", [fy, ValueFilter("==", "f", "x", 5)])])
    assert keys(apply_row_filter(v, nested)) == ["r2", "r3", "r5"]


def test_decimal_epsilon_compare(spark):
    rows = [
        ("r1", "f", "d", 1, encode_typed(3.14159, "decimal")),
        ("r2", "f", "d", 1, encode_typed(3.14159 + 5e-11, "decimal")),  # inside epsilon
        ("r3", "f", "d", 1, encode_typed(2.5, "decimal")),
    ]
    v = visible(spark, rows)
    assert keys(apply_row_filter(v, ValueFilter("==", "f", "d", 3.14159, "decimal"))) == [
        "r1",
        "r2",
    ]
    assert keys(apply_row_filter(v, ValueFilter("<", "f", "d", 3.0, "decimal"))) == ["r3"]


def test_binary_comparator(spark):
    rows = [("r1", "f", "b", 1, b"apple"), ("r2", "f", "b", 1, b"banana"), ("r3", "f", "b", 1, b"cherry")]
    v = visible(spark, rows)
    assert keys(apply_row_filter(v, ValueFilter(">=", "f", "b", b"banana", "binary"))) == [
        "r2",
        "r3",
    ]
