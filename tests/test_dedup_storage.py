"""Storage-backed fingerprint mode for verified_near_duplicates.

The cached (persist) mode pins the MinHash fingerprint table in the
executor heap — measured at 5M docs, that required a 64 GB driver heap
in local mode (SCALE.md §11). The storage mode writes the fingerprint
and band-signature intermediates to Parquet and lets every consumer
scan storage, making the pipeline heap-independent. These tests pin
the contract: identical rows in both modes, and the intermediates
really live on disk.
"""

from __future__ import annotations

from pathlib import Path

from tera_spark.operators.dedup import verified_near_duplicates


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _rows(df):
    return sorted(
        (r.id_a, r.id_b, r.jaccard) for r in df.collect()
    )


def test_storage_mode_matches_cached_mode(spark, tmp_path):
    docs = _docs(spark)
    cached = _rows(verified_near_duplicates(docs, threshold=0.5))
    stored = _rows(
        verified_near_duplicates(docs, threshold=0.5, storage=str(tmp_path / "fp"))
    )
    assert stored == cached
    assert stored, "fixture corpus has planted near-duplicates"


def test_storage_mode_materializes_to_parquet(spark, tmp_path):
    store = tmp_path / "fp2"
    verified_near_duplicates(docs=_docs(spark), threshold=0.5, storage=str(store))
    # both shared intermediates are real Parquet tables on disk
    for sub in ("fingerprints", "band_sigs"):
        files = list((store / sub).glob("*.parquet"))
        assert files, f"{sub} not written to storage"
    fp = spark.read.parquet(str(store / "fingerprints"))
    assert {"id", "sh", "sig"} <= set(fp.columns)
    assert fp.count() == _docs(spark).count()


def test_storage_mode_respects_bucket_cap(spark, tmp_path):
    docs = _docs(spark)
    capped_cache = _rows(
        verified_near_duplicates(docs, threshold=0.5, max_bucket_size=4)
    )
    capped_store = _rows(
        verified_near_duplicates(
            docs, threshold=0.5, max_bucket_size=4, storage=str(tmp_path / "fp3")
        )
    )
    assert capped_store == capped_cache


def test_minhash_pairs_storage_mode_matches(spark, tmp_path):
    from tera_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs(spark)
    cached = sorted((r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect())
    stored = sorted(
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, storage=str(tmp_path / "mp")).collect()
    )
    assert stored == cached and stored


def test_containment_pairs_storage_mode_matches(spark, tmp_path):
    from tera_spark.operators.dedup import containment_pairs

    docs = _docs(spark)
    key = lambda r: (r.id_a, r.id_b, r.containment, r.direction)
    cached = sorted(map(key, containment_pairs(docs, threshold=0.5).collect()))
    stored = sorted(
        map(
            key,
            containment_pairs(
                docs, threshold=0.5, storage=str(tmp_path / "cp")
            ).collect(),
        )
    )
    assert stored == cached and stored


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_semantic_pairs_storage_mode_matches(spark, tmp_path):
    """The three embedding-side bucket/cluster operators share the same
    storage contract as the text dedup family: intermediates to
    Parquet, identical rows."""
    from tera_spark.operators.similarity import (
        hyperplane_lsh_pairs,
        ivf_near_pairs,
        train_kmeans,
        windowed_semantic_pairs,
    )

    emb = _emb(spark)
    cents = train_kmeans(emb, k=4, iters=1)
    key = lambda r: (r.id_a, r.id_b, r.sim)

    for op, kw in (
        (ivf_near_pairs, {"centroids": cents, "threshold": 0.3}),
        (windowed_semantic_pairs, {"centroids": cents, "threshold": 0.3}),
        (hyperplane_lsh_pairs, {"threshold": 0.3}),
    ):
        cached = sorted(map(key, op(emb, **kw).collect()))
        stored = sorted(
            map(
                key,
                op(emb, storage=str(tmp_path / op.__name__), **kw).collect(),
            )
        )
        assert stored == cached, op.__name__
        assert stored, op.__name__
