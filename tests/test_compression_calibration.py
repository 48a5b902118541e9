"""zlib calibration pins for the compression-ratio oracle.

The text_compression_ratio oracle carries zlib output lengths
computed at oracle-build time by the driver's zlib. This file
HARDCODES the values of this environment's zlib so that a zlib/
zlib-ng upgrade that changes compressed sizes trips a loud, explained
failure here (and only here) instead of a mysterious driver
hash-mismatch."""

from __future__ import annotations

from tera_spark.functions.text import calibration_pins, calibration_texts

# (raw_bytes, comp_bytes, ratio) per class, pinned 2026-08 (CPython
# bundled zlib). If THIS test fails after an interpreter upgrade, the
# oracle stays self-consistent (it recomputes); update these pins.
EXPECTED = [
    (4096, 28, 0.006835),
    (2048, 24, 0.011718),
    (2160, 72, 0.033333),
    (4035, 221, 0.05477),
    (2048, 1699, 0.829589),
    (1280, 251, 0.196093),
    (2020, 100, 0.049504),
    (1024, 122, 0.11914),
]


def test_pins_match_this_environments_zlib():
    assert calibration_pins() == EXPECTED


def test_classes_span_the_signal_range():
    ratios = [r for _, _, r in calibration_pins()]
    assert min(ratios) < 0.01  # degenerate repetition
    assert max(ratios) > 0.8  # hash-chain noise
    assert len(set(ratios)) == 8  # all classes distinguishable


def test_texts_are_deterministic_and_content_free():
    """The strings derive from constants only — regenerating testdata
    can never move the pins."""
    a, b = calibration_texts(), calibration_texts()
    assert a == b
    assert [len(s.encode()) for s in a] == [raw for raw, _, _ in EXPECTED]


def test_kernel_matches_pins_through_spark(spark):
    """The PRODUCTION kernel (Arrow pandas UDF) reproduces the pinned
    byte counts and floor-truncated ratios end-to-end."""
    from pyspark.sql import functions as F

    from tera_spark.operators.textops import compression_ratio

    texts = calibration_texts()
    df = spark.createDataFrame(
        [(i, texts[i]) for i in range(8)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in compression_ratio(df, include_comp=True).collect()
    }
    for c, (raw, comp, ratio) in enumerate(EXPECTED):
        assert (rows[c].n_bytes, rows[c].comp_bytes, rows[c].ratio) == (
            raw,
            comp,
            ratio,
        )


def test_empty_text_ratio_is_one(spark):
    from tera_spark.operators.textops import compression_ratio

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = compression_ratio(df).collect()[0]
    assert (r.n_bytes, r.ratio) == (0, 1.0)
