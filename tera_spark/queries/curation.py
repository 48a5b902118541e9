"""Corpus-curation operators round 5: CCNet-style held-out perplexity
bucketing + the persisted-LM cross-corpus scoring path, a distilled
surface-feature classifier trained by unrolled deterministic gradient
descent (+ its margin-decile calibration report), count-min-sketch
heavy hitters, theta/KMV sketch set algebra, distributed PCA by
pinned power iteration, and a PSI distribution-drift audit.

Like every other oracled query, the DuckDB SQL is GENERATED from the
same constants/ops as the Spark plan (hash = functions.text.h60,
quantisation = floor micro-units), so results compare bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.functions import text as X
from tera_spark.queries import query
from tera_spark.queries.llmops import _SQL_ALPHA, _SQL_NTOK, _SQL_STOPR, _sql_lang_case, _t6
from tera_spark.sources.tables import load

# --- CCNet-style perplexity buckets ---------------------------------------

def _sql_backoff_perdoc(train_cond: str, score_cond: str = "TRUE") -> str:
    """CTE chain ending in ``perdoc(doc_id, lang, n_scored,
    avg_nll_micro)``: stupid-backoff trigram LM trained on the
    ``train_cond`` docs, scoring the ``score_cond`` trigram stream —
    the same derived-count structure as operators/lm.py."""
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, {X.sql_tokens('text')} AS t FROM documents
    ),
    tri AS (
      SELECT doc_id, lang, {train_cond} AS is_train,
             t[i-2] AS w1, t[i-1] AS w2, t[i] AS w3
      FROM toks, unnest(range(3, len(t)+1)) AS u(i)
    ),
    bi AS (
      SELECT t[i-1] AS u1, t[i] AS u2
      FROM toks, unnest(range(2, len(t)+1)) AS u(i) WHERE {train_cond}
    ),
    uni AS (SELECT unnest(t) AS w FROM toks WHERE {train_cond}),
    c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tri WHERE is_train GROUP BY 1,2,3),
    cctx AS (SELECT w1, w2, count(*) AS cctx FROM tri WHERE is_train GROUP BY 1,2),
    cb AS (SELECT u1, u2, count(*) AS cb FROM bi GROUP BY 1,2),
    c1ctx AS (SELECT u1, count(*) AS c1ctx FROM bi GROUP BY 1),
    c1 AS (SELECT w, count(*) AS c1 FROM uni GROUP BY 1),
    tot AS (SELECT count(*)::double AS n_tok, count(DISTINCT w)::double AS v_tok FROM uni),
    scored AS (
      SELECT tri.doc_id, tri.lang,
        CASE WHEN c3.c3 IS NOT NULL THEN c3.c3::double / cctx.cctx::double
             WHEN cb.cb IS NOT NULL THEN 0.4 * cb.cb::double / c1ctx.c1ctx::double
             ELSE 0.16000000000000003
                  * (coalesce(c1.c1, 0) + 1)::double / (tot.n_tok + tot.v_tok)
        END AS p
      FROM tri
      LEFT JOIN c3 ON tri.w1 = c3.w1 AND tri.w2 = c3.w2 AND tri.w3 = c3.w3
      LEFT JOIN cctx ON tri.w1 = cctx.w1 AND tri.w2 = cctx.w2
      LEFT JOIN cb ON tri.w2 = cb.u1 AND tri.w3 = cb.u2
      LEFT JOIN c1ctx ON tri.w2 = c1ctx.u1
      LEFT JOIN c1 ON tri.w3 = c1.w
      CROSS JOIN tot
      WHERE {score_cond}
    ),
    perdoc AS (
      SELECT doc_id, lang, count(*) AS n_scored,
             floor(sum(floor(-ln(p) * 1000000)::bigint)::double / count(*))::bigint
               AS avg_nll_micro
      FROM scored GROUP BY 1, 2
    )
    """


_SQL_PPL = _sql_backoff_perdoc("doc_id % 2 = 0") + """
    SELECT cast(doc_id AS bigint) AS doc_id, lang,
           cast(n_scored AS bigint) AS n_scored, avg_nll_micro,
           CASE ntile(3) OVER (PARTITION BY lang ORDER BY avg_nll_micro, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM perdoc
"""


@query("text_perplexity_buckets", _SQL_PPL)
def text_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): a stupid-
    backoff trigram LM (Brants et al. 2007) trained on the even-doc_id
    split scores EVERY doc's trigram stream (held-out docs genuinely
    exercise the backoff/OOV chain), then docs are cut into
    head/middle/tail terciles per language by average surprisal —
    the standard reference-LM corpus filter.

    Scale shape: count relations are vocabulary-bounded (Zipf-small)
    -> broadcast onto the trigram stream; corpus scanned once; one
    doc_id shuffle for the fold + one per-language window."""
    from pyspark.sql import Window as W

    from tera_spark.operators.textops import stupid_backoff_nll

    docs = load(spark, sf, "documents")
    nll = stupid_backoff_nll(docs)
    d = docs.select("doc_id", "lang").join(nll, "doc_id")
    nt = F.ntile(3).over(W.partitionBy("lang").orderBy("avg_nll_micro", "doc_id"))
    bucket = (
        F.when(nt == 1, F.lit("head")).when(nt == 2, F.lit("middle")).otherwise(F.lit("tail"))
    )
    return d.select("doc_id", "lang", "n_scored", "avg_nll_micro", bucket.alias("bucket"))


_SQL_LM_CROSS = _sql_backoff_perdoc("lang = 'en'", "tri.lang <> 'en'") + """
    SELECT cast(doc_id AS bigint) AS doc_id, lang,
           cast(n_scored AS bigint) AS n_scored, avg_nll_micro
    FROM perdoc
"""


@query("text_lm_persisted_score", _SQL_LM_CROSS)
def text_lm_persisted_score(spark: SparkSession, sf: str) -> DataFrame:
    """The CCNet deployment shape end-to-end through the PERSISTED
    model path: NgramLM.build writes the English reference corpus'
    count tables to parquet, then lm.score reads them back
    (merge-on-read) and scores the non-English docs — held-out by
    construction, so the backoff and add-one-OOV branches carry the
    whole score. The driver row therefore value-checks the full
    build → parquet round-trip → merge → score pipeline, not just the
    in-plan math.

    Scale shape: identical to text_perplexity_buckets scoring plus one
    parquet write/read of the vocabulary-sized count tables. The model
    lands in ONE fixed per-Spark-app scratch dir (NgramLM.build
    overwrites it), so repeated invocations reuse the slot instead of
    leaking a directory per run; the dir itself is atexit-reaped
    (functions/cache.py::app_scratch_dir) so it doesn't outlive the
    process either."""
    from pathlib import Path

    from tera_spark.functions.cache import app_scratch_dir
    from tera_spark.operators.lm import NgramLM

    docs = load(spark, sf, "documents")
    scratch = Path(app_scratch_dir(spark, "ngram_lm"))
    lm = NgramLM.build(docs.filter(F.col("lang") == "en"), str(scratch))
    crawl = docs.filter(F.col("lang") != "en")
    nll = lm.score(crawl)
    return crawl.select("doc_id", "lang").join(nll, "doc_id").select(
        "doc_id", "lang", "n_scored", "avg_nll_micro"
    )


# --- Distilled surface-feature classifier ---------------------------------

_CLF_STEPS = 4
_CLF_LR = 1.0
_SQL_X3 = _t6(f"least({_SQL_NTOK}::double / 100.0, 1.0)")


def _sql_classifier(
    steps: int = _CLF_STEPS, lr: float = _CLF_LR, *, calibrated: bool = False
) -> str:
    """Generate the unrolled-GD oracle: one gradient CTE + one weight
    CTE per step, float-op order identical to operators/classifier.py
    (left-associated margin, softsign link, balanced class weights
    from exact counts, floor-micro gradients). With ``calibrated``,
    append the decile reliability report instead of per-doc scores."""
    feats = (
        f"SELECT doc_id, lang, CASE WHEN {_sql_lang_case()} = 'en' THEN 1.0 ELSE 0.0 END AS y, "
        f"({_SQL_STOPR} * 10.0) AS x1, {_SQL_ALPHA} AS x2, {_SQL_X3} AS x3 FROM documents"
    )
    xs = ["x1", "x2", "x3"]

    def zexpr() -> str:
        z = "(w0::double / 1000000.0)"
        for j, x in enumerate(xs, start=1):
            z = f"({z} + ((w{j}::double / 1000000.0) * {x}))"
        return z

    def sig(z: str) -> str:
        return f"(0.5 + ((0.5 * {z}) / (1.0 + abs({z}))))"

    cw = "(CASE WHEN y = 1.0 THEN (n / (2.0 * np)) ELSE (n / (2.0 * (n - np))) END)"
    ctes = [
        f"feats AS ({feats})",
        "nn AS (SELECT count(*)::double AS n, sum(y)::double AS np FROM feats)",
        "w0s AS (SELECT 0::bigint AS w0, 0::bigint AS w1, 0::bigint AS w2, 0::bigint AS w3)",
    ]
    prev = "w0s"
    for k in range(1, steps + 1):
        resid = f"(({sig(zexpr())} - y) * {cw})"
        gsel = [f"sum(floor({resid} * 1000000.0)::bigint) AS g0"]
        gsel += [
            f"sum(floor(({resid} * {x}) * 1000000.0)::bigint) AS g{j}"
            for j, x in enumerate(xs, start=1)
        ]
        ctes.append(
            f"g{k}s AS (SELECT {', '.join(gsel)} FROM feats CROSS JOIN {prev} CROSS JOIN nn)"
        )
        wsel = [
            f"(w{j} - floor(({lr} * g{j}::double) / n)::bigint)::bigint AS w{j}"
            for j in range(len(xs) + 1)
        ]
        ctes.append(
            f"w{k}s AS (SELECT {', '.join(wsel)} FROM {prev} CROSS JOIN g{k}s CROSS JOIN nn)"
        )
        prev = f"w{k}s"
    final_z = zexpr()
    scored = (
        "SELECT cast(doc_id AS bigint) AS doc_id, lang, cast(y AS int) AS label, "
        f"floor({final_z} * 1000000.0)::bigint AS margin_micro, "
        f"CASE WHEN floor({final_z} * 1000000.0) >= 0 THEN 1 ELSE 0 END::int AS pred "
        f"FROM feats CROSS JOIN {prev}"
    )
    if not calibrated:
        return "WITH " + ",\n".join(ctes) + "\n" + scored
    ctes.append(f"scored AS ({scored})")
    ctes.append(
        "bkt AS (SELECT label, margin_micro, "
        "ntile(10) OVER (ORDER BY margin_micro, doc_id) AS bucket FROM scored)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT cast(bucket AS int) AS bucket, cast(count(*) AS bigint) AS n_docs, "
        "floor(sum(margin_micro)::double / count(*))::bigint AS mean_margin_micro, "
        "(floor((sum(label)::double / count(*)) * 1000000)::double / 1000000) AS pos_rate "
        "FROM bkt GROUP BY bucket"
    )


@query("pipeline_quality_classifier", _sql_classifier())
def pipeline_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Distilled curation classifier (GPT-3 appendix A shape): learn to
    reproduce an expensive teacher's verdict — here the marker-lexicon
    langid model's is-English call — from three cheap surface features
    (stopword ratio, alpha ratio, capped token count) via unrolled
    full-batch GD steps, then score every document with the learned
    weights. Training math is engine-replayable (softsign link,
    floor-micro gradient quantisation; see operators/classifier.py),
    so the DuckDB oracle re-trains bit-identically.

    Scale shape: K=4 aggregation passes over a persisted map-only
    feature relation (each collapses to 4 numbers via map-side
    partials), then a map-only scoring projection — no shuffle grows
    with the corpus; driver state is O(K) 4-vectors like the k-means
    trainer."""
    return _classifier_scored(spark, sf).select(
        "doc_id", "lang", F.col("y").cast("int").alias("label"), "margin_micro", "pred"
    )


def _classifier_scored(spark: SparkSession, sf: str) -> DataFrame:
    """Shared train+score: the scored per-doc relation both classifier
    queries project from."""
    from tera_spark.operators.classifier import (
        score_surface_classifier,
        train_surface_classifier,
    )
    from tera_spark.operators.textops import language_id, quality_features

    docs = load(spark, sf, "documents")
    qf = quality_features(docs).select("doc_id", "n_tokens", "stop_ratio", "alpha_ratio")
    x3 = F.floor(
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 1_000_000
    ).cast("double") / 1_000_000
    teacher = language_id(F.col("text"))
    feats = (
        docs.select("doc_id", "lang", teacher.alias("lang_guess"))
        .join(qf, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.when(F.col("lang_guess") == "en", 1.0).otherwise(0.0).alias("y"),
            (F.col("stop_ratio") * 10.0).alias("x1"),
            F.col("alpha_ratio").alias("x2"),
            x3.alias("x3"),
        )
    )
    feats = feats.persist()
    try:
        w = train_surface_classifier(feats, steps=_CLF_STEPS, lr=_CLF_LR)
    finally:
        feats.unpersist()
    return score_surface_classifier(feats, w)


@query("pipeline_classifier_calibration", _sql_classifier(calibrated=True))
def pipeline_classifier_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability report for the distilled classifier: margin deciles
    vs observed teacher-label rate — the calibration curve a curation
    pipeline reads before picking a keep-threshold (GPT-3 picked
    theirs by Pareto-sampling scores; the decile table is the audit
    that makes any threshold defensible). Monotone pos_rate across
    buckets = the margin actually ranks quality.

    Scale shape: the training passes of the classifier plus ONE global
    ntile window — at 100 TB swap ntile for fixed margin bins (same
    note as the equi-depth histogram)."""
    from pyspark.sql import Window as W

    scored = _classifier_scored(spark, sf)
    bkt = scored.select(
        F.col("y").cast("int").alias("label"),
        "margin_micro",
        F.ntile(10).over(W.orderBy("margin_micro", "doc_id")).alias("bucket"),
    )
    pos = F.floor((F.sum("label").cast("double") / F.count(F.lit(1))) * 1_000_000).cast(
        "double"
    ) / 1_000_000
    return bkt.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.floor(F.sum("margin_micro").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_margin_micro"),
        pos.alias("pos_rate"),
    )


# --- Distributed PCA (power iteration) --------------------------------------

# flat random-ish spectra (λ2/λ1 ≈ 0.93 on the fixture cloud) need
# ~0.93^t ≪ 1 → 128 pinned steps; the oracle chain is MATERIALIZED so
# its cost is linear in iterations, and the driver loop is O(dim²·t)
_PCA_ITERS = 128
_PCA_DIM = 64


def _sql_pca(dim: int = _PCA_DIM, iters: int = _PCA_ITERS) -> str:
    """Unrolled power-iteration oracle with the exact pinned fold
    orders of operators/pca.py (ascending-index list_reduce; 1e-6
    vector re-quantisation per step)."""
    rng = f"range(1, {dim + 1})"
    matvec = (
        f"list_reduce(list_transform({rng}, j -> c.cs[j] * v.vl[j]), (a, b) -> a + b)"
    )
    ctes = [
        (
            "q AS MATERIALIZED (SELECT vec_id, list_transform("
            f"{rng}, i -> floor(embedding[i]::double * 1000000.0)::bigint) AS q "
            "FROM embeddings)"
        ),
        "nn AS (SELECT count(*)::double AS n FROM q)",
        f"el AS MATERIALIZED (SELECT vec_id, i, q[i] AS qi FROM q, unnest({rng}) AS u(i))",
        "s1 AS MATERIALIZED (SELECT i, sum(qi) AS s FROM el GROUP BY i)",
        (
            "s2 AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.qi * b.qi) AS s "
            "FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i GROUP BY 1, 2)"
        ),
        (
            "covfull AS MATERIALIZED (SELECT s2.i, s2.j, "
            "((s2.s::double - ((sa.s::double * sb.s::double) / nn.n)) / nn.n) "
            "/ 1000000000000.0 AS c "
            "FROM s2 JOIN s1 sa ON sa.i = s2.i JOIN s1 sb ON sb.i = s2.j CROSS JOIN nn)"
        ),
        (
            "symm AS MATERIALIZED (SELECT i, j, c FROM covfull "
            "UNION ALL SELECT j AS i, i AS j, c FROM covfull WHERE i < j)"
        ),
        "crow AS MATERIALIZED (SELECT i, list(c ORDER BY j) AS cs FROM symm GROUP BY i)",
        f"v0 AS MATERIALIZED (SELECT list_transform({rng}, x -> 0.125) AS vl)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"u{t} AS MATERIALIZED (SELECT c.i AS i, {matvec} AS u FROM crow c CROSS JOIN v{t - 1} v)"
        )
        ctes.append(
            f"n{t} AS MATERIALIZED (SELECT sqrt(list_reduce(list_transform("
            f"(SELECT list(u ORDER BY i) FROM u{t}), x -> x * x), (a, b) -> a + b)) AS nrm)"
        )
        ctes.append(
            f"v{t} AS MATERIALIZED (SELECT list(floor((u.u / n.nrm) * 1000000.0)::double / 1000000.0 "
            f"ORDER BY u.i) AS vl FROM u{t} u CROSS JOIN n{t} n)"
        )
    last = f"v{iters}"
    ctes.append(
        f"w AS MATERIALIZED (SELECT c.i AS i, {matvec} AS u FROM crow c CROSS JOIN {last} v)"
    )
    ctes.append(
        "lam AS (SELECT floor(list_reduce(list_transform("
        f"{rng}, i -> v.vl[i] * wl.ws[i]), (a, b) -> a + b) * 1000000.0)::double "
        f"/ 1000000.0 AS eigval FROM {last} v CROSS JOIN "
        "(SELECT list(u ORDER BY i) AS ws FROM w) wl)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT (f.i - 1)::int AS component, v.vl[f.i] AS loading, lam.eigval AS eigval "
        f"FROM (SELECT unnest({rng}) AS i) f CROSS JOIN {last} v CROSS JOIN lam"
    )


@query("ann_pca_top_component", _sql_pca())
def ann_pca_top_component(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed PCA: the embedding cloud's dominant principal
    direction and explained variance via one exact-integer moment pass
    (corpus touched once, 2 080 map-side-collapsed groups) + a pinned
    driver power iteration. Complements ann_embedding_health's
    anisotropy MAGNITUDE with the actual axis — the direction you
    subtract for the all-but-the-top correction (Mu & Viswanath 2018)
    or whiten against. DuckDB oracle replays moments, covariance, and
    all _PCA_ITERS (=128) power iterations bit-for-bit."""
    from tera_spark.operators.pca import pca_top_component

    emb = load(spark, sf, "embeddings")
    return pca_top_component(emb, dim=_PCA_DIM, iters=_PCA_ITERS)


# --- Theta-sketch set algebra ----------------------------------------------

_THETA_K = 32
_THETA_M = 1 << 60


def _sql_theta(k: int = _THETA_K) -> str:
    def est(n: str) -> str:
        return (
            f"(floor((({n}::double * {float(_THETA_M)!r}) / theta::double) * 10000)"
            "::double / 10000)"
        )

    return f"""
    WITH u AS (
      SELECT DISTINCT ts::date::varchar AS g, user_id::varchar AS k
      FROM events WHERE event_type = 'purchase'
    ),
    hs AS (SELECT DISTINCT g, {X.sql_h60('k')} AS h FROM u),
    ranked AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM hs),
    sk AS (SELECT g, h FROM ranked WHERE rk <= {k}),
    th AS (SELECT g, coalesce(max(CASE WHEN rk = {k} THEN h END), {_THETA_M}) AS theta
           FROM ranked WHERE rk <= {k} GROUP BY g),
    days AS (SELECT DISTINCT g FROM u),
    pairs AS (SELECT a.g AS ga, b.g AS gb FROM days a JOIN days b
              ON b.g = (a.g::date + 1)::varchar),
    fl AS (
      SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        SELECT p.ga, p.gb, s.h, 1 AS in_a, 0 AS in_b FROM pairs p JOIN sk s ON s.g = p.ga
        UNION ALL
        SELECT p.ga, p.gb, s.h, 0 AS in_a, 1 AS in_b FROM pairs p JOIN sk s ON s.g = p.gb
      ) GROUP BY 1, 2, 3
    ),
    below AS (
      SELECT f.ga, f.gb, f.in_a, f.in_b, least(ta.theta, tb.theta) AS theta
      FROM fl f JOIN th ta ON ta.g = f.ga JOIN th tb ON tb.g = f.gb
      WHERE f.h < least(ta.theta, tb.theta)
    ),
    agg AS (
      SELECT ga, gb, max(theta) AS theta, count(*) AS n_u, sum(in_a * in_b) AS n_i,
             sum(in_a) AS n_a, sum(in_b) AS n_b
      FROM below GROUP BY 1, 2
    ),
    efl AS (
      SELECT ga, gb, k, max(ia) AS ia, max(ib) AS ib FROM (
        SELECT p.ga, p.gb, x.k, 1 AS ia, 0 AS ib FROM pairs p JOIN u x ON x.g = p.ga
        UNION ALL
        SELECT p.ga, p.gb, x.k, 0 AS ia, 1 AS ib FROM pairs p JOIN u x ON x.g = p.gb
      ) GROUP BY 1, 2, 3
    ),
    eagg AS (SELECT ga, gb, count(*) AS exact_union, sum(ia * ib) AS exact_intersect
             FROM efl GROUP BY 1, 2)
    SELECT agg.ga AS day_a, agg.gb AS day_b,
           {est('n_a')} AS est_a, {est('n_b')} AS est_b,
           {est('n_u')} AS est_union, {est('n_i')} AS est_intersect,
           cast(exact_union AS bigint) AS exact_union,
           cast(exact_intersect AS bigint) AS exact_intersect
    FROM agg JOIN eagg ON agg.ga = eagg.ga AND agg.gb = eagg.gb
    """


@query("events_theta_purchaser_overlap", _sql_theta())
def events_theta_purchaser_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Day-over-day repeat-purchaser analysis through theta/KMV
    sketches: each day's distinct-purchaser set becomes a k-smallest-
    hash sketch, and every consecutive-day pair's union/intersection
    (i.e. returning vs churned purchasers) is estimated from the two
    sketches alone — the set algebra HLL cannot do. Exact counts ride
    along for audit (affordable at test scale; at 100 TB you keep only
    the sketch columns, which is the point).

    Scale shape: one distinct shuffle on (day, user-hash) — the floor
    for any distinct question — then a per-day window; all pair math
    runs on k-row sketches with the theta table broadcast."""
    from tera_spark.operators.sketches import theta_set_ops, theta_sketch

    ev = load(spark, sf, "events").filter(F.col("event_type") == "purchase")
    day = F.to_date("ts").cast("string")
    u = ev.select(day.alias("g"), F.col("user_id").cast("string").alias("k")).distinct()
    sk, th = theta_sketch(
        ev.withColumn("g", day), key_col="user_id", group_col="g", k=_THETA_K
    )
    days = u.select("g").distinct()
    pairs = (
        days.select(
            F.col("g").alias("ga"),
            F.date_add(F.col("g").cast("date"), 1).cast("string").alias("gb"),
        )
        .join(days.select(F.col("g").alias("gb")), "gb")
        .select("ga", "gb")
    )
    est = theta_set_ops(sk, th, pairs)

    ea = u.join(F.broadcast(pairs), u.g == pairs.ga).select(
        "ga", "gb", "k", F.lit(1).alias("ia"), F.lit(0).alias("ib")
    )
    eb = u.join(F.broadcast(pairs), u.g == pairs.gb).select(
        "ga", "gb", "k", F.lit(0).alias("ia"), F.lit(1).alias("ib")
    )
    efl = (
        ea.unionByName(eb)
        .groupBy("ga", "gb", "k")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    eagg = efl.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).cast("long").alias("exact_union"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("exact_intersect"),
    )
    return est.join(F.broadcast(eagg), ["ga", "gb"]).select(
        F.col("ga").alias("day_a"),
        F.col("gb").alias("day_b"),
        "est_a",
        "est_b",
        "est_union",
        "est_intersect",
        "exact_union",
        "exact_intersect",
    )


# --- Signal rank correlation (Spearman) --------------------------------------

_SQL_PUNCT = _t6(
    "length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::double / greatest(length(text), 1)"
)
_SPEAR_SIGNALS = ["alpha", "ntok", "punct", "stop"]


def _sql_spearman() -> str:
    from itertools import combinations

    sig_sql = {
        "ntok": f"cast({_SQL_NTOK} AS bigint)",
        "alpha": _SQL_ALPHA,
        "stop": _SQL_STOPR,
        "punct": _SQL_PUNCT,
    }
    feats = ", ".join(f"{sig_sql[s]} AS s_{s}" for s in _SPEAR_SIGNALS)
    ranks = ", ".join(
        f"row_number() OVER (ORDER BY s_{s}, doc_id) AS r_{s}" for s in _SPEAR_SIGNALS
    )
    pairs = list(combinations(_SPEAR_SIGNALS, 2))
    d2 = ", ".join(
        f"sum((r_{a} - r_{b}) * (r_{a} - r_{b})) AS d2_{a}_{b}" for a, b in pairs
    )

    def rho(a: str, b: str) -> str:
        return _t6(
            f"1.0 - ((6.0 * d2_{a}_{b}::double) / (n * ((n * n) - 1.0)))"
        )

    arms = " UNION ALL ".join(
        f"SELECT '{a}' AS signal_a, '{b}' AS signal_b, {rho(a, b)} AS rho FROM m"
        for a, b in pairs
    )
    return f"""
    WITH feats AS (SELECT doc_id, {feats} FROM documents),
    ranks AS (SELECT doc_id, {ranks} FROM feats),
    m AS (SELECT count(*)::double AS n, {d2} FROM ranks)
    {arms}
    """


@query("text_signal_spearman", _sql_spearman())
def text_signal_spearman(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman rank correlation between the quality signals (alpha /
    token-count / punctuation / stopword ratios) — the diagnostic that
    tells a curation pipeline which heuristics are redundant (|rho|
    high: filters double-count one property) and which are
    independent evidence. Ranks are tie-broken by doc_id (total order
    → deterministic), so rho = 1 − 6·Σd²/(n(n²−1)) is exact integer
    math until the final division.

    Scale shape: each signal's rank uses the distributed global-rank
    machinery (sources/sharding.py `distributed_rank`: range-
    partitioned slices + O(partitions) offset map — NO single-
    partition Exchange), then one doc_id-keyed join of the rank
    columns and a single 6-sum aggregate."""
    from itertools import combinations

    from tera_spark.operators.textops import quality_features
    from tera_spark.sources.sharding import distributed_rank

    docs = load(spark, sf, "documents")
    qf = quality_features(docs).select(
        "doc_id",
        F.col("alpha_ratio").alias("s_alpha"),
        F.col("n_tokens").alias("s_ntok"),
        F.col("punct_ratio").alias("s_punct"),
        F.col("stop_ratio").alias("s_stop"),
    ).persist()
    joined = qf.select("doc_id")
    for s in _SPEAR_SIGNALS:
        r = distributed_rank(
            qf.select("doc_id", f"s_{s}"), [f"s_{s}", "doc_id"], out=f"r_{s}"
        ).select("doc_id", f"r_{s}")
        joined = joined.join(r, "doc_id")
    pairs = list(combinations(_SPEAR_SIGNALS, 2))
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for a, b in pairs:
        d = F.col(f"r_{a}") - F.col(f"r_{b}")
        aggs.append(F.sum((d * d).cast("decimal(38,0)")).alias(f"d2_{a}_{b}"))
    m = joined.agg(*aggs)
    n = F.col("n")

    def rho(a: str, b: str):
        raw = F.lit(1.0) - (
            (F.lit(6.0) * F.col(f"d2_{a}_{b}").cast("double")) / (n * ((n * n) - F.lit(1.0)))
        )
        return F.floor(raw * 1_000_000).cast("double") / 1_000_000

    structs = [
        F.struct(
            F.lit(a).alias("signal_a"), F.lit(b).alias("signal_b"), rho(a, b).alias("rho")
        )
        for a, b in pairs
    ]
    return m.select(F.explode(F.array(*structs)).alias("x")).select("x.*")


# --- Distribution drift (PSI) -----------------------------------------------

_PSI_BINS = 20
_PSI_WIDTH = 10.0
_PSI_CUT = "2024-01-16"

_SQL_PSI = f"""
    WITH binned AS (
      SELECT event_type,
             least({_PSI_BINS - 1}, greatest(0, floor(value / {_PSI_WIDTH})))::int AS bin,
             CASE WHEN ts < TIMESTAMP '{_PSI_CUT}' THEN 1 ELSE 0 END AS is_ref
      FROM events
    ),
    cnt AS (
      SELECT event_type, bin,
             sum(is_ref) AS cr, sum(1 - is_ref) AS cc
      FROM binned GROUP BY 1, 2
    ),
    spine AS (
      SELECT t.event_type, b.bin
      FROM (SELECT DISTINCT event_type FROM binned) t
      CROSS JOIN (SELECT unnest(range(0, {_PSI_BINS}))::int AS bin) b
    ),
    filled AS (
      SELECT s.event_type, s.bin,
             coalesce(c.cr, 0) AS cr, coalesce(c.cc, 0) AS cc
      FROM spine s LEFT JOIN cnt c ON c.event_type = s.event_type AND c.bin = s.bin
    ),
    tot AS (
      SELECT event_type, sum(cr)::double AS nr, sum(cc)::double AS nc
      FROM filled GROUP BY 1
    ),
    terms AS (
      SELECT f.event_type,
             floor(((((f.cr + 1)::double / (t.nr + {_PSI_BINS}.0))
                     - ((f.cc + 1)::double / (t.nc + {_PSI_BINS}.0)))
                    * ln(((f.cr + 1)::double / (t.nr + {_PSI_BINS}.0))
                         / ((f.cc + 1)::double / (t.nc + {_PSI_BINS}.0))))
                   * 1000000000)::bigint AS term,
             t.nr, t.nc
      FROM filled f JOIN tot t ON t.event_type = f.event_type
    )
    SELECT event_type, cast(max(nr) AS bigint) AS n_ref,
           cast(max(nc) AS bigint) AS n_cur,
           cast(sum(term) AS bigint) AS psi_nano
    FROM terms GROUP BY event_type
"""


@query("events_drift_psi", _SQL_PSI)
def events_drift_psi(spark: SparkSession, sf: str) -> DataFrame:
    """Population-stability-index drift audit: per event type, PSI of
    the value distribution between the reference slice (first half of
    the month) and the current slice — the standard gate before
    retraining on or admitting a new data drop (PSI < 0.1 stable,
    > 0.25 drifted). Laplace-smoothed over a fixed 20-bin spine so
    empty bins stay defined; per-bin terms are floor-quantized to
    nano-units before the sum (each term is provably >= 0: (p-q) and
    ln(p/q) share sign), so the fold is associative and engine-exact.

    Scale shape: one map-side-partial count keyed by (type, bin) —
    the facts are touched once; everything downstream is bins × types
    rows. Mergeable across slices like the histogram sketch tables."""
    ev = load(spark, sf, "events")
    bins = _PSI_BINS
    b = F.least(
        F.lit(bins - 1), F.greatest(F.lit(0), F.floor(F.col("value") / _PSI_WIDTH))
    ).cast("int")
    is_ref = F.when(F.col("ts") < F.lit(_PSI_CUT).cast("timestamp"), 1).otherwise(0)
    binned = ev.select("event_type", b.alias("bin"), is_ref.alias("is_ref"))
    # cnt is persisted: it feeds the spine (type list), the fill join,
    # and the totals — unpersisted, each would rescan the facts
    cnt = binned.groupBy("event_type", "bin").agg(
        F.sum("is_ref").alias("cr"), F.sum(1 - F.col("is_ref")).alias("cc")
    ).persist()
    spine = (
        cnt.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(bins).select(F.col("id").cast("int").alias("bin"))
        )
    )
    filled = spine.join(cnt, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("cr", F.lit(0)).alias("cr"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    tot = filled.groupBy("event_type").agg(
        F.sum("cr").cast("double").alias("nr"), F.sum("cc").cast("double").alias("nc")
    )
    p = (F.col("cr") + 1).cast("double") / (F.col("nr") + float(bins))
    q = (F.col("cc") + 1).cast("double") / (F.col("nc") + float(bins))
    term = F.floor(((p - q) * F.log(p / q)) * 1_000_000_000).cast("long")
    terms = filled.join(F.broadcast(tot), "event_type").select(
        "event_type", term.alias("term"), "nr", "nc"
    )
    return terms.groupBy("event_type").agg(
        F.max("nr").cast("long").alias("n_ref"),
        F.max("nc").cast("long").alias("n_cur"),
        F.sum("term").cast("long").alias("psi_nano"),
    )


# --- Count-min heavy hitters ----------------------------------------------

_CMS_D = 4
_CMS_W = 64
_CMS_K = 20


def _sql_cms(d: int = _CMS_D, w: int = _CMS_W, top_k: int = _CMS_K) -> str:
    def bucket(i: int, key: str) -> str:
        salted = "'" + str(i) + ":' || " + key
        return f"({X.sql_h60(salted)} % {w})"

    arms = [
        f"SELECT {i} AS r, {bucket(i, 'user_id::varchar')} AS b, "
        "count(*) AS c FROM events GROUP BY 2"
        for i in range(d)
    ]
    joins = "\n".join(
        f"  JOIN cells c{i} ON c{i}.r = {i} AND c{i}.b = {bucket(i, 'k')}"
        for i in range(d)
    )
    least = ", ".join(f"c{i}.c" for i in range(d))
    return f"""
    WITH cells AS (
      {' UNION ALL '.join(arms)}
    ),
    keys AS (SELECT user_id::varchar AS k, count(*) AS exact_count FROM events GROUP BY 1),
    est AS (
      SELECT k, exact_count, least({least}) AS cms
      FROM keys
{joins}
    )
    SELECT k AS user_id, cast(cms AS bigint) AS cms_count,
           cast(exact_count AS bigint) AS exact_count,
           cast(cms - exact_count AS bigint) AS overcount
    FROM est ORDER BY cms DESC, k LIMIT {top_k}
    """


@query("events_cms_heavy_hitters", _sql_cms())
def events_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Heavy hitters through a count-min sketch (Cormode &
    Muthukrishnan 2005): the sketch is a d×w cell relation built
    map-side in one pass (mergeable across slices by cell addition —
    the streaming/incremental form comes free), each key's frequency
    estimate is the min of its d bucket counts, and the top-20
    estimates are reported next to exact counts so collision
    overestimates stay auditable. Hashes are the shared 60-bit md5
    prefix (functions/text.h60), so the oracle fills identical cells.

    Scale shape: facts touched once for the sketch (d·w cells, KBs);
    the estimate side shuffles only the distinct-key relation and
    broadcasts the cell slices onto it."""
    from tera_spark.operators.sketches import cms_heavy_hitters

    ev = load(spark, sf, "events")
    return cms_heavy_hitters(ev, key_col="user_id", d=_CMS_D, w=_CMS_W, top_k=_CMS_K)
