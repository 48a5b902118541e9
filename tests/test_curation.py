"""Round-5 curation operators: count-min heavy hitters, CCNet-style
stupid-backoff perplexity, distilled surface-feature classifier —
structural invariants + layout-independence (oracle parity itself is
covered by tests/test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tera_spark.operators.classifier import (
    score_surface_classifier,
    train_surface_classifier,
)
from tera_spark.operators.sketches import cms_heavy_hitters, count_min_cells
from tera_spark.operators.textops import stupid_backoff_nll
from tera_spark.sources.tables import load

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


# --- count-min sketch ------------------------------------------------------

def test_cms_never_underestimates(spark):
    """The CMS guarantee: est >= exact for EVERY key (collisions only
    inflate), so overcount is non-negative on all reported rows."""
    ev = load(spark, SF, "events")
    hh = cms_heavy_hitters(ev, key_col="user_id", top_k=1000).collect()
    assert len(hh) > 0
    assert all(r.overcount >= 0 for r in hh)
    assert all(r.cms_count >= r.exact_count for r in hh)


def test_cms_cells_mergeable_across_slices(spark):
    """Building per-slice sketches and adding matching cells equals the
    one-shot sketch — the property that makes incremental/streaming
    builds free."""
    ev = load(spark, SF_SMALL, "events")
    whole = {
        (r.r, r.b): r.c for r in count_min_cells(ev, key_col="user_id").collect()
    }
    lo = count_min_cells(ev.filter("event_id % 2 = 0"), key_col="user_id")
    hi = count_min_cells(ev.filter("event_id % 2 = 1"), key_col="user_id")
    merged: dict = {}
    for r in lo.unionByName(hi).collect():
        merged[(r.r, r.b)] = merged.get((r.r, r.b), 0) + r.c
    assert merged == whole


def test_cms_heavy_hitter_estimates_track_exact(spark):
    """With d=4 rows the top heavy hitter's estimate stays close to
    exact (error bound e·N/w with prob 1-(1/2)^d)."""
    ev = load(spark, SF, "events")
    n = ev.count()
    top = cms_heavy_hitters(ev, key_col="user_id", d=4, w=64, top_k=5).collect()
    for r in top:
        assert r.cms_count - r.exact_count <= 3 * n / 64, r


# --- stupid-backoff perplexity ---------------------------------------------

def test_backoff_train_split_scores_lower_than_heldout(spark):
    """The LM is trained on even doc_ids: in aggregate the train split
    must score lower avg-surprisal than held-out docs (it has seen its
    own trigrams), which proves the split actually reaches training."""
    docs = load(spark, SF, "documents")
    nll = stupid_backoff_nll(docs)
    rows = nll.groupBy((F.col("doc_id") % 2 == 0).alias("is_train")).agg(
        F.avg("avg_nll_micro").alias("m")
    ).collect()
    m = {r.is_train: r.m for r in rows}
    assert m[True] < m[False], m


def test_backoff_short_docs_drop_and_counts_match(spark):
    """Docs with <3 tokens have no trigram stream; all others emit
    exactly n_tokens-2 scored positions."""
    docs = load(spark, SF_SMALL, "documents")
    nll = stupid_backoff_nll(docs)
    ntok = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    )
    joined = ntok.join(nll, "doc_id", "left").collect()
    for r in joined:
        if r.n >= 3:
            assert r.n_scored == r.n - 2, r
        else:
            assert r.n_scored is None, r


def test_backoff_layout_invariant(spark):
    """Floor-micro quantisation before the sum makes the per-doc NLL
    independent of partitioning/row order."""
    docs = load(spark, SF_SMALL, "documents")
    a = {r.doc_id: r.avg_nll_micro for r in stupid_backoff_nll(docs).collect()}
    shuffled = docs.orderBy(F.md5(F.col("text"))).repartition(7)
    b = {r.doc_id: r.avg_nll_micro for r in stupid_backoff_nll(shuffled).collect()}
    assert a == b


# --- distilled classifier ---------------------------------------------------

def _feats(spark, sf):
    from tera_spark.operators.textops import language_id, quality_features

    docs = load(spark, sf, "documents")
    qf = quality_features(docs).select("doc_id", "n_tokens", "stop_ratio", "alpha_ratio")
    x3 = F.floor(
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 1_000_000
    ).cast("double") / 1_000_000
    return (
        docs.select("doc_id", language_id(F.col("text")).alias("lang_guess"))
        .join(qf, "doc_id")
        .select(
            "doc_id",
            F.when(F.col("lang_guess") == "en", 1.0).otherwise(0.0).alias("y"),
            (F.col("stop_ratio") * 10.0).alias("x1"),
            F.col("alpha_ratio").alias("x2"),
            x3.alias("x3"),
        )
    )


def test_classifier_learns_signal(spark):
    """x1 is the ENGLISH stopword ratio, so the distilled model must
    beat the majority-class baseline at reproducing the langid
    teacher's is-English verdict."""
    feats = _feats(spark, SF)
    w = train_surface_classifier(feats)
    scored = score_surface_classifier(feats, w)
    agg = scored.agg(
        F.avg((F.col("pred") == F.col("y").cast("int")).cast("double")).alias("acc"),
        F.avg("y").alias("pos_rate"),
    ).collect()[0]
    baseline = max(agg.pos_rate, 1 - agg.pos_rate)
    assert agg.acc > baseline + 0.05, (agg.acc, baseline)
    # stopword-ratio weight should be positive (more en-stopwords -> en)
    assert w[1] > 0, w


def test_classifier_training_layout_invariant(spark):
    """Gradient contributions are floor-quantised integers, so the
    trained weights are bit-identical under any partitioning."""
    feats = _feats(spark, SF_SMALL)
    w1 = train_surface_classifier(feats, steps=3)
    w2 = train_surface_classifier(feats.repartition(13), steps=3)
    assert w1 == w2


# --- theta sketch -----------------------------------------------------------

def test_theta_sketch_merge_is_min_rank_selection(spark):
    """Union sketch == k smallest of the concatenated sketches (the
    associativity that makes theta sketches mergeable across slices)."""
    from tera_spark.operators.sketches import theta_sketch

    ev = load(spark, SF, "events").withColumn("g", F.lit("all"))
    whole, _ = theta_sketch(ev, key_col="user_id", group_col="g", k=16)
    lo, _ = theta_sketch(ev.filter("event_id % 2 = 0"), key_col="user_id", group_col="g", k=16)
    hi, _ = theta_sketch(ev.filter("event_id % 2 = 1"), key_col="user_id", group_col="g", k=16)
    merged = sorted({r.h for r in lo.collect()} | {r.h for r in hi.collect()})[:16]
    assert sorted(r.h for r in whole.collect()) == merged


def test_theta_exact_branch_below_k(spark):
    """Groups with fewer than k distinct keys get theta = M and the
    estimates ARE the exact counts."""
    from tera_spark.operators.sketches import theta_set_ops, theta_sketch

    ev = load(spark, SF, "events").withColumn("g", F.col("event_type"))
    sk, th = theta_sketch(ev, key_col="user_id", group_col="g", k=10_000)
    pairs = spark.createDataFrame([("click", "purchase")], "ga string, gb string")
    est = theta_set_ops(sk, th, pairs).collect()[0]
    a = load(spark, SF, "events")
    na = a.filter("event_type = 'click'").select("user_id").distinct().count()
    nb = a.filter("event_type = 'purchase'").select("user_id").distinct().count()
    nu = a.filter("event_type IN ('click','purchase')").select("user_id").distinct().count()
    assert est.est_a == float(na) and est.est_b == float(nb)
    assert est.est_union == float(nu)
    assert est.est_intersect == float(na + nb - nu)


def test_theta_estimates_within_tolerance(spark):
    """At k=32 over ~50-70 element daily sets, union estimates stay
    within 25% of exact on every consecutive-day pair (KMV error
    ~1/sqrt(k) ≈ 18%)."""
    from tera_spark.queries.curation import events_theta_purchaser_overlap

    rows = events_theta_purchaser_overlap(spark, SF).collect()
    assert len(rows) >= 20
    for r in rows:
        assert abs(r.est_union - r.exact_union) / r.exact_union < 0.25, r


# --- persisted n-gram LM -----------------------------------------------------

def test_ngram_lm_build_score_matches_inline(spark, tmp_path):
    """NgramLM.build on the even split + score == the inline
    stupid_backoff_nll (same counts, same floor-micro math)."""
    from tera_spark.operators.lm import NgramLM

    docs = load(spark, SF_SMALL, "documents")
    lm = NgramLM.build(docs.filter("doc_id % 2 = 0"), str(tmp_path / "lm"))
    via_lm = {r.doc_id: (r.n_scored, r.avg_nll_micro) for r in lm.score(docs).collect()}
    inline = {
        r.doc_id: (r.n_scored, r.avg_nll_micro)
        for r in stupid_backoff_nll(docs).collect()
    }
    assert via_lm == inline


def test_ngram_lm_extend_equals_rebuild(spark, tmp_path):
    """Appending a slice's partial counts then scoring == building on
    the union corpus (counts add; merge-on-read re-aggregates)."""
    from tera_spark.operators.lm import NgramLM

    docs = load(spark, SF_SMALL, "documents")
    a, b = docs.filter("doc_id % 3 = 0"), docs.filter("doc_id % 3 != 0")
    inc = NgramLM.build(a, str(tmp_path / "inc"))
    inc.extend(b)
    full = NgramLM.build(docs, str(tmp_path / "full"))
    target = docs.limit(50)
    got = {r.doc_id: r.avg_nll_micro for r in inc.score(target).collect()}
    want = {r.doc_id: r.avg_nll_micro for r in full.score(target).collect()}
    assert got == want


def test_ngram_lm_reload_and_cross_corpus(spark, tmp_path):
    """A reloaded LM scores a DIFFERENT corpus (the CCNet deployment
    shape: reference LM trained once, every snapshot scored by it) —
    OOV tokens hit the add-one floor, never error."""
    from tera_spark.operators.lm import NgramLM

    ref = load(spark, SF_SMALL, "documents").filter("lang = 'en'")
    NgramLM.build(ref, str(tmp_path / "ref"))
    lm = NgramLM.load(spark, str(tmp_path / "ref"))
    crawl = load(spark, SF_SMALL, "documents").filter("lang != 'en'")
    rows = lm.score(crawl).collect()
    assert len(rows) > 0
    assert all(r.avg_nll_micro > 0 for r in rows)


# --- distributed PCA ---------------------------------------------------------

def test_pca_matches_numpy_eigendecomposition(spark):
    """8 quantized power steps must land on numpy's top eigenpair of
    the same covariance matrix: |cos(v, v_np)| > 0.999 and eigenvalue
    within 0.1%."""
    import numpy as np

    from tera_spark.operators.pca import (
        covariance_from_moments,
        power_iteration,
        second_moments,
    )

    emb = load(spark, SF_SMALL, "embeddings")
    n, s1, s2 = second_moments(emb)
    cov = np.array(covariance_from_moments(n, s1, s2))
    v, lam = power_iteration(cov.tolist(), iters=128)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    vn = np.array(v) / np.linalg.norm(v)
    assert abs(float(vn @ top)) > 0.999, float(vn @ top)
    assert abs(lam - evals[-1]) / evals[-1] < 1e-3, (lam, evals[-1])


def test_pca_moments_layout_invariant(spark):
    """Moment sums are exact integers — identical under repartition."""
    from tera_spark.operators.pca import second_moments

    emb = load(spark, SF_SMALL, "embeddings")
    a = second_moments(emb)
    b = second_moments(emb.repartition(17))
    assert a == b


def test_pca_moment_table_extend_equals_rebuild(spark, tmp_path):
    """Persisted moment table: appending a slice's partial sums then
    solving == building on the union corpus (exact integers merge)."""
    from tera_spark.operators.pca import MomentTable, pca_top_component

    emb = load(spark, SF_SMALL, "embeddings")
    inc = MomentTable.build(emb.filter("vec_id % 2 = 0"), str(tmp_path / "m"))
    inc.extend(emb.filter("vec_id % 2 = 1"))
    v_inc, lam_inc = inc.top_component(iters=16)
    direct = {
        (r.component, r.loading, r.eigval)
        for r in pca_top_component(emb, iters=16).collect()
    }
    want = {(i, v_inc[i], lam_inc) for i in range(64)}
    assert direct == want


def test_ngram_lm_torn_extend_is_invisible(spark, tmp_path):
    """A crash mid-extend (staging written, never renamed) must leave
    scores unchanged — the slice publish is the atomic point."""
    from pathlib import Path

    from tera_spark.operators.lm import NgramLM, ngram_counts

    docs = load(spark, SF_SMALL, "documents")
    lm = NgramLM.build(docs.filter("doc_id % 3 = 0"), str(tmp_path / "lm"))
    target = docs.limit(30)
    before = {r.doc_id: r.avg_nll_micro for r in lm.score(target).collect()}
    # simulate the crash: write staging for a second slice, do NOT rename
    c3, cb, c1 = ngram_counts(docs.filter("doc_id % 3 = 1"))
    stage = Path(str(tmp_path / "lm")) / ".stage-torn"
    c3.write.parquet(str(stage / "c3"))
    cb.write.parquet(str(stage / "cb"))  # crash before c1 / before rename
    after = {r.doc_id: r.avg_nll_micro for r in lm.score(target).collect()}
    assert before == after


def test_moment_table_torn_extend_is_invisible(spark, tmp_path):
    from pathlib import Path

    from tera_spark.operators.pca import MomentTable, _moment_rows

    emb = load(spark, SF_SMALL, "embeddings")
    t = MomentTable.build(emb.filter("vec_id % 2 = 0"), str(tmp_path / "m"))
    before = t.moments()
    stage = Path(str(tmp_path / "m")) / ".stage-torn"
    _moment_rows(emb.filter("vec_id % 2 = 1"), "embedding", 64).write.parquet(
        str(stage / "moments")
    )
    assert t.moments() == before
