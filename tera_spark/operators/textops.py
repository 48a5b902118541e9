"""Text analysis operators: language-ID, quality scoring, token
statistics, document fingerprinting — all built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tera_spark.functions.text import fingerprint, tokens
from tera_spark.sources.tables import ensure_parallelism

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}

STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "for", "on", "with"]


def _marker_hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(words)))


def language_id(text: Column) -> Column:
    """Stopword-marker vote: the language with the most marker hits
    wins, ties broken by code order (first-listed wins); no hits →
    'und'. Expressed as greatest+CASE so the DuckDB oracle can mirror
    it token for token."""
    toks = tokens(text)
    hits = {code: _marker_hits(toks, ws) for code, ws in sorted(LANG_MARKERS.items())}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for code in reversed(sorted(LANG_MARKERS)):
        expr = F.when((best > 0) & (hits[code] == best), F.lit(code)).otherwise(expr)
    return expr


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / alpha ratios + composite score."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(t, "[^.!?,;:]", ""))
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(STOPWORDS)))

    def trunc6(x):
        # floor-truncation instead of round: bit-stable across engines
        # (round() tie-breaking on doubles differs between Spark and
        # DuckDB; floor of identical doubles cannot)
        return F.floor(x * 1_000_000).cast("double") / 1_000_000

    alpha_ratio = trunc6(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)))
    stop_ratio = trunc6(n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)))
    punct_ratio = trunc6(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)))
    mean_tok_len = trunc6(
        (n_chars - n_tokens + 1).cast("double") / F.greatest(n_tokens, F.lit(1))
    )
    score = trunc6(
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + alpha_ratio * 0.3
    )
    return ensure_parallelism(docs).select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        score.alias("quality_score"),
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return ensure_parallelism(docs).select(
        "doc_id",
        fingerprint(F.col(text_col)).alias("fp"),
        F.md5(text_col).alias("exact_hash"),
    )
