from tera_spark.functions.codecs import (
    be_i64_decode,
    be_i64_encode,
    le_i64_decode,
    le_i64_encode,
    be_double_decode,
    py_encode_be_i64,
    py_encode_le_i64,
    py_decode_be_i64,
    py_decode_le_i64,
)

__all__ = [
    "be_i64_decode",
    "be_i64_encode",
    "le_i64_decode",
    "le_i64_encode",
    "be_double_decode",
    "py_encode_be_i64",
    "py_encode_le_i64",
    "py_decode_be_i64",
    "py_decode_le_i64",
]
