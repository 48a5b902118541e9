"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched Pandas UDFs over mapInPandas.

The decode step itself is STUBBED (the image/audio codec libraries are
not in this container): `decode_image`/`decode_audio` raise
NotImplementedError unless ``fake=True``, in which case a deterministic
fake derived from the raw bytes stands in. Everything around the stub —
schema, batch iteration, partition-size control, UDF signatures — is
the real Spark plumbing a production pipeline needs, and the fake path
is deterministic so it is oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media asset table schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, head_byte int, "
    "byte_sum long, width int, height int"
)


def decode_image(payload: bytes, *, fake: bool = False) -> dict:
    """Stub decode: a real deployment plugs PIL/libvips here."""
    if not fake:
        raise NotImplementedError("image codecs not available in this container")
    # deterministic fake: derive pseudo-dimensions from the bytes
    n = len(payload)
    return {
        "width": 16 + (payload[0] if n else 0) % 64,
        "height": 16 + (payload[-1] if n else 0) % 64,
    }


def decode_audio(payload: bytes, *, fake: bool = False) -> dict:
    """Stub decode: a real deployment plugs ffmpeg/soundfile here. The
    deterministic fake derives sample_rate/n_samples from the bytes so
    downstream duration math is testable."""
    if not fake:
        raise NotImplementedError("audio codecs not available in this container")
    n = len(payload)
    rate = 8000 * (1 + (payload[0] if n else 0) % 3)  # 8/16/24 kHz
    return {"sample_rate": rate, "n_samples": n * 256}


def extract_features(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one feature
    row per asset out. Partition count is preserved, so upstream
    repartitioning controls decode parallelism and batch memory."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].apply(lambda b: bytes(b) if b is not None else b"")
            dims = payloads.apply(lambda b: decode_image(b, fake=fake_decode))
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.apply(len).astype("int64"),
                    "head_byte": payloads.apply(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "byte_sum": payloads.apply(lambda b: sum(b) % (1 << 31)).astype("int64"),
                    "width": dims.apply(lambda d: d["width"]).astype("int32"),
                    "height": dims.apply(lambda d: d["height"]).astype("int32"),
                }
            )
            yield out

    from tera_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(media).mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame index to decode,
    computed from metadata (n_frames) without touching payloads — the
    shuffle-free fan-out a distributed decoder consumes."""
    # try_element_at: ANSI mode makes plain element_at throw on maps
    # lacking the key; assets without frame metadata plan zero frames
    n_frames = F.coalesce(
        F.try_element_at(F.col("meta"), F.lit("n_frames")).cast("int"), F.lit(0)
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("asset_id", F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"))
    )


RESIZED_SCHEMA = (
    "asset_id long, media_type string, payload binary, "
    "width int, height int, n_bytes long"
)


def resize_image(payload: bytes, width: int, height: int, *, fake: bool = False) -> bytes:
    """Stub resize: a real deployment plugs PIL/libvips here. The fake
    path is deterministic — output length is width*height//256 bytes of
    the payload cycled — so the batch plumbing is testable."""
    if not fake:
        raise NotImplementedError("image codecs not available in this container")
    n = max(width * height // 256, 1)
    if not payload:
        return bytes(n)
    reps = -(-n // len(payload))
    return (bytes(payload) * reps)[:n]


def resize_images(
    media: DataFrame, *, width: int = 64, height: int = 64, fake_decode: bool = True
) -> DataFrame:
    """mapInPandas resize stage: Arrow batches of (payload, meta) in,
    re-encoded payloads + new dimensions out. Same partition-preserving
    shape as extract_features — upstream repartitioning bounds per-task
    decode memory; payload bytes never cross a shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].apply(lambda b: bytes(b) if b is not None else b"")
            resized = payloads.apply(lambda b: resize_image(b, width, height, fake=fake_decode))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "n_bytes": resized.apply(len).astype("int64"),
                }
            )

    from tera_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(media).mapInPandas(op, schema=RESIZED_SCHEMA)


AUDIO_SCHEMA = (
    "asset_id long, n_bytes long, sample_rate int, n_samples long, duration_ms long"
)


def extract_audio_features(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """mapInPandas audio feature extraction (sample rate, sample count,
    duration) through the stubbed decoder — same partition-preserving
    Arrow-batch shape as the image path."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].apply(lambda b: bytes(b) if b is not None else b"")
            dec = payloads.apply(lambda b: decode_audio(b, fake=fake_decode))
            rate = dec.apply(lambda d: d["sample_rate"]).astype("int32")
            samples = dec.apply(lambda d: d["n_samples"]).astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.apply(len).astype("int64"),
                    "sample_rate": rate,
                    "n_samples": samples,
                    "duration_ms": (samples * 1000 // rate).astype("int64"),
                }
            )

    from tera_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(media).mapInPandas(op, schema=AUDIO_SCHEMA)


def phash64(payload: bytes, *, fake: bool = False) -> int:
    """Perceptual hash of an image payload. A real deployment decodes
    pixels and DCT-hashes them (pHash); the container has no codecs,
    so the decode is the stubbed deterministic fake — but the hash
    math downstream of "pixels" is real: an 8x8 mean-threshold bit
    matrix packed into 64 bits. Near-identical payloads (e.g. the
    same image re-encoded with small byte diffs) land within a small
    Hamming distance; unrelated payloads differ in ~32 bits."""
    if not fake:
        raise NotImplementedError("image codecs not available in this container")
    if not payload:
        return 0
    # fake "pixels": average byte value per 8x8 grid cell over the raw
    # payload (stands in for decoded luma; deterministic)
    n = len(payload)
    cell = max(n // 64, 1)
    cells = [
        sum(payload[i * cell : (i + 1) * cell]) / max(len(payload[i * cell : (i + 1) * cell]), 1)
        for i in range(64)
    ]
    mean = sum(cells) / 64
    bits = 0
    for i, c in enumerate(cells):
        if c > mean:
            bits |= 1 << i
    # two's-complement wrap: column type is signed int64 (Arrow rejects
    # uint64 values above 2^63-1); XOR/bit_count are sign-agnostic
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def phash_duplicates(
    media: DataFrame, *, max_hamming: int = 4, fake_decode: bool = True
) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: compute the
    64-bit pHash per asset (mapInPandas, Arrow-batched), band the hash
    into four 16-bit keys, and pair assets sharing a band whose full
    Hamming distance <= max_hamming — the SimHash/LSH banding trick
    applied to images (a pair within distance 4 must agree exactly on
    at least one of 4 bands). One shuffle on the band key; the payload
    never travels past the hash stage."""
    from collections.abc import Iterator as _It

    def op(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for b in batches:
            out = pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "phash": [
                        phash64(bytes(p) if p is not None else b"", fake=fake_decode)
                        for p in b["payload"]
                    ],
                }
            )
            yield out

    imgs = media.filter(F.col("media_type") == "image")
    hashed = imgs.mapInPandas(op, "asset_id long, phash long")
    banded = hashed.select(
        "asset_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("phash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("b"),
    ).select("asset_id", "phash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a, b2 = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(b2, ["band", "key"])
        .filter(F.col("a.asset_id") < F.col("b.asset_id"))
        .select(
            F.col("a.asset_id").alias("id_a"),
            F.col("b.asset_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
