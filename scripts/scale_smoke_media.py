#!/usr/bin/env python
"""Round-6 media-tier scale smoke: container sniffing, MP3 metadata
walk, audio fingerprints, and scene cuts at asset volumes the sf
fixtures can't provide. All payloads are deterministic (the same
fixture encoders the oracle queries use — no RNG state); synthesis
and analysis run inside one mapInPandas pass per stage, so the smoke
measures the real decode path, not disk. Results land in SCALE.md.
Run: python scripts/scale_smoke_media.py [scale]
(scale=1 → 200k assets per stage).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from tera_spark.session import get_spark  # noqa: E402

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N = int(200_000 * SCALE)


def docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(997)).alias("n_chars"),
    ).repartition(64)


def timed(label, df, n_assets):
    t0 = time.monotonic()
    cnt = df.count()
    dt = time.monotonic() - t0
    print(f"{label}: {cnt} rows over {n_assets} assets in {dt:.1f}s "
          f"({n_assets / dt:,.0f} assets/s)")
    return dt


def main():
    spark = get_spark("scale-media")
    from functools import reduce

    from pyspark.sql import DataFrame

    from tera_spark.operators.multimodal import (
        audio_fingerprints,
        extract_mp3_metadata,
        scene_cuts,
        sniff_formats,
        synth_mp3_media,
        synth_wav_media,
        synth_y4m_media,
    )

    d = docs(spark, N)

    # 1. MP3 metadata walk (encode + ID3 skip + frame-sync walk)
    mp3 = synth_mp3_media(d)
    meta = extract_mp3_metadata(mp3)
    timed("mp3_metadata", meta, N)
    agg = meta.agg(
        F.sum("n_frames").alias("frames"), F.sum("n_bytes").alias("bytes")
    ).collect()[0]
    print(f"  ({agg['frames']:,} frames walked, {agg['bytes'] / 1e9:.2f} GB of stream)")

    # 2. Container triage census over a 4-way mixed bag (cheap encoders:
    #    mp3/wav/y4m + garbage — the sniffer itself is format-agnostic
    #    JVM expressions, identical cost for every magic)
    per = N // 4
    parts = [
        synth_mp3_media(d.filter(F.col("doc_id") % 4 == 0).limit(per)),
        synth_wav_media(d.filter(F.col("doc_id") % 4 == 1).limit(per)),
        synth_y4m_media(d.filter(F.col("doc_id") % 4 == 2).limit(per)),
        d.filter(F.col("doc_id") % 4 == 3).limit(per).select(
            F.col("doc_id").alias("asset_id"),
            F.lit("unknown").alias("media_type"),
            F.expr("unhex('00DEADBEEF')").alias("payload"),
            F.create_map().cast("map<string,string>").alias("meta"),
        ),
    ]
    bag = reduce(DataFrame.unionByName, parts)
    census = sniff_formats(bag).groupBy("format").count()
    t0 = time.monotonic()
    rows = {r["format"]: r["count"] for r in census.collect()}
    dt = time.monotonic() - t0
    total = sum(rows.values())
    print(f"sniff_census: {rows} in {dt:.1f}s ({total / dt:,.0f} assets/s)")
    assert set(rows) == {"mp3", "wav", "y4m", "unknown"}, rows

    # 3. Audio fingerprints (real PCM16 decode + window energies)
    timed("audio_fingerprint", audio_fingerprints(synth_wav_media(d)), N)

    # 4. Scene cuts (real Y4M decode + frame diffs)
    timed("scene_cuts", scene_cuts(synth_y4m_media(d)), N)

    # 5. FLAC full decode (round 7): every sample reconstructed through
    #    the FIXED/LPC/mid-side paths AND verified against frame CRCs +
    #    the STREAMINFO MD5 — the heaviest per-byte stage by design
    from tera_spark.operators.multimodal import (
        extract_flac_features,
        synth_flac_media,
    )

    flac = extract_flac_features(synth_flac_media(d))
    dt = timed("flac_decode", flac, N)
    agg = flac.agg(
        F.sum("n_samples").alias("samples"), F.sum("n_bytes").alias("bytes")
    ).collect()[0]
    print(
        f"  ({agg['samples']:,} samples decoded+MD5-verified, "
        f"{agg['bytes'] / 1e6:.0f} MB of stream, "
        f"{agg['samples'] / dt / 1e6:.2f} M samples/s)"
    )


if __name__ == "__main__":
    main()
