"""Regression tests for the round-5 ADVICE findings: gated (not
unconditional) LM broadcast hints, single-class classifier guard,
drift-monitor spine covering batch-only groups, per-app LM scratch
reuse, and the power-iteration zero-norm guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tera_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def test_score_trigrams_shuffle_path_matches_broadcast_path(spark):
    """broadcast_row_cap=0 forces every count-relation join onto the
    shuffle path; the integer micro-nat contract means the scores must
    be bit-identical to the (test-scale) broadcast path."""
    from tera_spark.operators.lm import ngram_counts, score_trigrams, trigram_stream

    docs = load(spark, SF, "documents").limit(200)
    c3, cb, c1 = ngram_counts(docs.filter("doc_id % 2 = 0"))
    tri = trigram_stream(docs)
    bcast = {r.doc_id: r.avg_nll_micro for r in score_trigrams(tri, c3, cb, c1).collect()}
    shuf = {
        r.doc_id: r.avg_nll_micro
        for r in score_trigrams(tri, c3, cb, c1, broadcast_row_cap=0).collect()
    }
    assert bcast and bcast == shuf


def test_classifier_single_class_does_not_divide_by_zero(spark):
    from tera_spark.operators.classifier import train_surface_classifier

    df = spark.range(20).select(
        F.lit(1.0).alias("y"),
        (F.col("id") % 7 / 7.0).alias("x1"),
        (F.col("id") % 5 / 5.0).alias("x2"),
        (F.col("id") % 3 / 3.0).alias("x3"),
    )
    w = train_surface_classifier(df, balanced=True)  # all-positive corpus
    assert len(w) == 4
    w0 = train_surface_classifier(df.withColumn("y", F.lit(0.0)), balanced=True)
    assert len(w0) == 4


def test_classifier_empty_corpus_raises(spark):
    from tera_spark.operators.classifier import train_surface_classifier

    df = spark.range(0).select(
        F.lit(1.0).alias("y"),
        F.lit(0.0).alias("x1"),
        F.lit(0.0).alias("x2"),
        F.lit(0.0).alias("x3"),
    )
    with pytest.raises(ValueError):
        train_surface_classifier(df)


def test_drift_monitor_surfaces_batch_only_group(spark, tmp_path):
    """A group present in the micro-batch but absent from the reference
    must appear in the PSI log (and score hot), not vanish."""
    from tera_spark.streaming.drift import DriftMonitor

    mon = DriftMonitor(spark, str(tmp_path / "d"), lo=0.0, hi=200.0, bins=20)
    ev = load(spark, "/root/testdata/sf0.01", "events")
    mon.set_reference(ev.filter("event_type <> 'click'"))
    out = {r.g: r.psi_nano for r in mon.observe(ev, 0).collect()}
    assert "click" in out
    known = [p for g, p in out.items() if g != "click"]
    assert known and all(out["click"] > p for p in known), out


def test_power_iteration_zero_covariance_guard():
    from tera_spark.operators.pca import power_iteration

    v, lam = power_iteration([[0.0] * 4 for _ in range(4)], iters=8)
    assert lam == 0.0 and len(v) == 4


def test_lm_persisted_query_reuses_one_scratch_dir(spark):
    """text_lm_persisted_score must not leak one model dir per run —
    the scratch path is keyed by the Spark applicationId (via
    app_scratch_dir, which also atexit-reaps it) and overwritten on
    rebuild."""
    import tempfile
    from pathlib import Path

    from tera_spark.queries.curation import text_lm_persisted_score

    root = Path(tempfile.gettempdir())
    pat = (
        "tera_spark_scratch_"
        + spark.sparkContext.applicationId
        + "_ngram_lm*"
    )
    text_lm_persisted_score(spark, SF).count()
    first = {p.name for p in root.glob(pat)}
    text_lm_persisted_score(spark, SF).count()
    second = {p.name for p in root.glob(pat)}
    assert first == second and len(second) == 1  # one slot per app, reused


def test_canonical_url_twins_and_dedup(spark):
    """URL canonicalization (crawl first-stage dedup key): the Spark
    and DuckDB twins agree on the tricky cases, and the fixture's four
    variants (case/www/default-port/trailing-slash/tracking/fragment)
    collapse onto one canonical key."""
    import duckdb
    from pyspark.sql import functions as F

    from tera_spark.functions.text import canonical_url, sql_canonical_url
    from tera_spark.queries.llmops import dedup_url_canonical

    cases = [
        "HTTP://WWW.Ex.COM:80/a/b/?utm_source=1",
        "https://ex.com:8443/a?z=1&a=2",      # non-default port kept
        "ftp://Ex.com:21/file",               # other scheme: port kept
        "https://ex.com",                     # empty path -> '/'
        "https://ex.com/?fbclid=abc&gclid=1&ref=x",  # all-tracking query
        "https://Ex.com/path#frag?notquery",  # fragment swallows fake query
    ]
    got = spark.createDataFrame([(c,) for c in cases], "u string").select(
        canonical_url(F.col("u")).alias("c")
    ).collect()
    con = duckdb.connect()
    for c, row in zip(cases, got):
        assert row.c == con.execute(f"select {sql_canonical_url(repr(c))}").fetchone()[0]
    assert got[0].c == "http://ex.com/a/b"
    assert got[1].c == "https://ex.com:8443/a?a=2&z=1"
    assert got[4].c == "https://ex.com/"

    out = dedup_url_canonical(spark, SF).collect()
    assert out and all(r.n_dups == 4 or r.n_dups < 4 for r in out)
    assert max(r.n_dups for r in out) == 4  # the four variants collapsed
    for r in out:
        assert r.keep_doc % 4 == 0 or r.n_dups < 4  # keep = min(doc_id)


def test_canonical_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): the canonical form is a
    fixed point, so re-running the dedup stage over already-canonical
    keys is a no-op (pipeline-restart safety)."""
    from pyspark.sql import functions as F

    from tera_spark.functions.text import canonical_url

    urls = [
        "HTTP://WWW.A.COM:80/x/?utm_source=1&b=2&a=3#f",
        "https://b.org:9443/p/q//",
        "ftp://C.net/z?x=1",
        "https://d.io",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(canonical_url(F.col("u")).alias("c"))
    twice = once.select(F.col("c").alias("u")).select(
        canonical_url(F.col("u")).alias("c")
    )
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]


def test_gopher_rules_on_crafted_text(spark):
    """Pin the Gopher-rule semantics on text engineered to pass/fail
    specific rules (the synthetic corpus never trips rule 5, so the
    crafted cases carry the stop-word and symbol logic)."""
    from tera_spark.operators.textops import gopher_rules

    good = ("the quick brown fox jumps over that lazy dog have with " * 6).strip()
    hashy = ("the of " + "#tag " * 60).strip()          # symbol ratio blown
    short = "the of and"                                 # < 50 words
    numeric = ("the of " + "123 456 " * 30).strip()      # alpha fraction low
    df = spark.createDataFrame(
        [(1, good), (2, hashy), (3, short), (4, numeric)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].keep == 1 and out[1].n_required_stops >= 2
    assert out[2].keep == 0 and out[2].pass_symbol_ratio == 0
    assert out[3].keep == 0 and out[3].pass_word_count == 0
    assert out[4].keep == 0 and out[4].pass_alpha_words == 0
    # every pass flag is the conjunction input it claims to be
    r = out[1]
    assert (
        r.pass_word_count and r.pass_mean_word_len and r.pass_symbol_ratio
        and r.pass_alpha_words and r.pass_stop_words
    )


def test_canonical_url_twin_fuzz(spark):
    """Randomized twin parity: 250 structured-random URLs plus
    degenerate strings must canonicalize IDENTICALLY in Spark (Java
    regex) and DuckDB (RE2) — dialect divergence here would silently
    split dedup groups between the engine and its oracle."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    from tera_spark.functions.text import canonical_url, sql_canonical_url

    rng = np.random.RandomState(42)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp", "a+b-c"]
    hosts = ["Ex.COM", "www.ex.com", "WWW.a.b.ORG", "ex.com:80",
             "ex.com:443", "ex.com:8080", "x"]
    paths = ["", "/", "/a/b", "/a/b/", "/a//b///", "/%7Euser", "/a.b"]
    params = ["", "a=1", "utm_source=x", "b=2&a=1", "fbclid=9&z=0",
              "ref=h&a=", "a", "=v", "a=1&a=0", "gclid=", "utm_=1", "xutm_a=1"]
    frags = ["", "#f", "#a?b=1", "##"]
    urls = []
    for _ in range(250):
        u = (schemes[rng.randint(len(schemes))] + "://"
             + hosts[rng.randint(len(hosts))] + paths[rng.randint(len(paths))])
        q = params[rng.randint(len(params))]
        if q:
            u += "?" + q
        u += frags[rng.randint(len(frags))]
        urls.append(u)
    urls += ["", "notaurl", "://nohost", "http://", "http:///path",
             "http://h?#", "http://h?&&&"]

    sp = [r.c for r in spark.createDataFrame([(u,) for u in urls], "u string")
          .select(canonical_url(F.col("u")).alias("c")).collect()]
    con = duckdb.connect()
    for u, s in zip(urls, sp):
        lit = "'" + u.replace("'", "''") + "'"
        assert s == con.execute(f"select {sql_canonical_url(lit)}").fetchone()[0], u
