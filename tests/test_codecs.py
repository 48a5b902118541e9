import struct

from pyspark.sql import functions as F

from tera_spark.functions.codecs import (
    be_double_decode,
    be_i64_decode,
    be_i64_encode,
    le_i64_decode,
    le_i64_encode,
    py_encode_be_double,
    py_encode_be_i64,
    py_encode_le_i64,
)

CASES = [0, 1, -1, 42, -42, 2**62, -(2**62), 2**63 - 1, -(2**63), 123456789012345]


def test_i64_roundtrip_decode(spark):
    rows = [(i, py_encode_be_i64(v), py_encode_le_i64(v), v) for i, v in enumerate(CASES)]
    df = spark.createDataFrame(rows, "id int, be binary, le binary, expect long")
    got = (
        df.select(
            "expect",
            be_i64_decode(F.col("be")).alias("d_be"),
            le_i64_decode(F.col("le")).alias("d_le"),
        )
        .collect()
    )
    for r in got:
        assert r.d_be == r.expect, f"BE decode {r}"
        assert r.d_le == r.expect, f"LE decode {r}"


def test_i64_encode_matches_struct_pack(spark):
    df = spark.createDataFrame([(v,) for v in CASES], "v long")
    got = df.select(
        "v", be_i64_encode(F.col("v")).alias("be"), le_i64_encode(F.col("v")).alias("le")
    ).collect()
    for r in got:
        assert bytes(r.be) == struct.pack(">q", r.v)
        assert bytes(r.le) == struct.pack("<q", r.v)


def test_double_decode(spark):
    vals = [0.0, 1.0, -1.0, 3.141592653589793, -2.5e-10, 1.7e300, 123456.789]
    df = spark.createDataFrame([(py_encode_be_double(v), v) for v in vals], "b binary, expect double")
    for r in df.select("expect", be_double_decode(F.col("b")).alias("d")).collect():
        assert abs(r.d - r.expect) <= abs(r.expect) * 1e-12, r
