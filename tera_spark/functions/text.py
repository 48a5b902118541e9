"""Text primitives shared by the dedup / text-analysis operators.

Every primitive exists twice from the SAME constants: a Spark Column
expression (JVM-side, codegen'd) and a DuckDB SQL fragment generator,
so operators built on them are oracle-checkable bit-for-bit. The
shared hash H(s) is the first 15 hex chars (60 bits) of md5 — both
engines parse it into an exact int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: keeps (a*x+b) products inside int64
P31 = 2_147_483_647

# deterministic MinHash coefficient families (shared by both engines)
N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS
MINHASH_A = [((2 * j + 1) * 1_000_003 + 12_345) % P31 for j in range(N_MINHASH)]
MINHASH_B = [((j * j + 7) * 998_244_353 + 7) % P31 for j in range(N_MINHASH)]

SIMHASH_BITS = 60


# --- Spark side -----------------------------------------------------------

def h60(col: Column) -> Column:
    """60-bit md5-prefix hash → exact int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-grams; documents shorter than n words collapse to one
    whole-text shingle (both engines implement the same guard)."""
    toks = tokens(text)
    make = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + k) for k in range(n)]),
    )
    return F.when(F.size(toks) >= n, make).otherwise(F.array(F.trim(text)))


def minhash_signature(text: Column) -> Column:
    """Array of N_MINHASH min-hash values over 3-gram shingles."""
    sh = shingles(text)
    hs = F.transform(sh, lambda s: h60(s) % P31)
    sigs = [
        F.array_min(F.transform(hs, lambda x: (F.lit(a) * x + F.lit(b)) % P31))
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    return F.array(*sigs)


def band_keys(sig: Column | str) -> Column:
    """LSH band buckets: md5 of ':'-joined slice per band, prefixed by
    the band index so buckets from different bands never collide.

    Pass the COLUMN NAME (str) on hot paths: the whole expression then
    builds as one parsed SQL string — a single py4j round-trip instead
    of ~30 (driver construction latency is a measured chunk of
    sub-second query latency; see the SQL-text twins note below). The
    Column form stays for composed expressions."""
    if isinstance(sig, str):
        keys = []
        for b in range(N_BANDS):
            part = f"slice(`{sig}`, {b * ROWS_PER_BAND + 1}, {ROWS_PER_BAND})"
            joined = ", ".join(f"get({part}, {i})" for i in range(ROWS_PER_BAND))
            keys.append(f"md5(concat_ws(':', '{b}', {joined}))")
        return F.expr("array(" + ", ".join(keys) + ")")
    keys = []
    for b in range(N_BANDS):
        part = F.slice(sig, b * ROWS_PER_BAND + 1, ROWS_PER_BAND)
        joined = F.concat_ws(":", F.lit(str(b)), *[part[i] for i in range(ROWS_PER_BAND)])
        keys.append(F.md5(joined))
    return F.array(*keys)


def simhash(text: Column) -> Column:
    """60-bit SimHash over whitespace tokens (count-weighted)."""
    toks = tokens(text)
    hs = F.transform(toks, lambda t: h60(t))

    def vote_fn(b: int):
        return lambda acc, h: acc + (F.shiftright(h, b) % 2) * 2 - 1

    bit_terms = []
    for b in range(SIMHASH_BITS):
        vote = F.aggregate(hs, F.lit(0).cast("long"), vote_fn(b))
        bit_terms.append(F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def fingerprint(text: Column) -> Column:
    """Order-sensitive positional fingerprint:
    sum((pos+1) * (H(token) % P31)) mod 2^61-1."""
    toks = tokens(text)
    terms = F.transform(toks, lambda t, i: (i + 1) * (h60(t) % P31))
    return F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x) % F.lit((1 << 61) - 1)


# --- Staged DataFrame builders -------------------------------------------
#
# The pure-Column composers above are convenient but, composed nested
# (e.g. band_keys(minhash_signature(c))), every outer reference copies
# the inner expression tree — 16 band references × 16 sig mins inline
# the md5/shingle subtree ~256×, blowing up codegen and re-evaluating
# the hashes per copy (observed 200s for 500 rows). The staged
# builders below put each intermediate behind a real projection;
# CollapseProject keeps multiply-referenced non-cheap expressions in
# their own stage, so each hash is computed exactly once per row.


# --- Spark SQL-text twins of the hot Column builders ----------------------
#
# A Column composed from pyspark functions costs one py4j round-trip
# per expression node; the MinHash signature alone is several hundred
# (measured ~0.5 s of DRIVER construction latency per query at steady
# state — more than its sf0.1 execution). The twins below emit the
# same expression as one SQL string for F.expr: one round-trip, one
# JVM parse, identical analyzed operators (the dedup oracle family
# re-proves value-level equality bit-for-bit).

def sx_tokens(expr: str) -> str:
    return f"split(trim({expr}), '\\\\s+')"


def sx_h60(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def sx_shingles(expr: str, n: int = 3) -> str:
    toks = sx_tokens(expr)
    parts = ", ".join(f"get({toks}, i + {k})" for k in range(n))
    return (
        f"(case when size({toks}) >= {n} then "
        f"transform(sequence(0, size({toks}) - {n}), i -> concat_ws(' ', {parts})) "
        f"else array(trim({expr})) end)"
    )


def with_minhash_signature(df, text_col: str = "text", out: str = "sig"):
    """Add an N_MINHASH-wide signature column, hashing each shingle once."""
    hs = f"transform({sx_shingles(f'`{text_col}`')}, s -> {sx_h60('s')} % {P31})"
    staged = df.withColumn("__mh_hs", F.expr(hs))
    sigs = ", ".join(
        f"array_min(transform(__mh_hs, x -> ({a}L * x + {b}L) % {P31}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return staged.withColumn(out, F.expr(f"array({sigs})")).drop("__mh_hs")


def with_simhash(df, text_col: str = "text", out: str = "simhash"):
    """Add a 60-bit SimHash column, hashing each token once."""
    hs = F.transform(tokens(F.col(text_col)), lambda t: h60(t))
    staged = df.withColumn("__sh_hs", hs)

    def vote_fn(b: int):
        return lambda acc, h: acc + (F.shiftright(h, b) % 2) * 2 - 1

    bit_terms = []
    for b in range(SIMHASH_BITS):
        vote = F.aggregate(F.col("__sh_hs"), F.lit(0).cast("long"), vote_fn(b))
        bit_terms.append(
            F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return staged.withColumn(out, total).drop("__sh_hs")


# --- DuckDB side (SQL fragment generators from the same constants) --------

def sql_h60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::bigint)"


def sql_tokens(expr: str) -> str:
    return f"string_split_regex(trim({expr}), '\\s+')"


def sql_shingles(expr: str, n: int = 3) -> str:
    toks = sql_tokens(expr)
    parts = " || ' ' || ".join(f"__t[i+{k}]" for k in range(n))
    return (
        f"(CASE WHEN len({toks}) >= {n} THEN "
        f"(SELECT list_transform(range(1, len(__t) - {n - 2}), i -> {parts}) FROM (SELECT {toks} AS __t)) "
        f"ELSE [trim({expr})] END)"
    )


def sql_minhash_signature(expr: str) -> str:
    sh = sql_shingles(expr)
    hs = f"list_transform({sh}, s -> {sql_h60('s')} % {P31})"
    sigs = ", ".join(
        f"list_aggregate(list_transform(__h, x -> ({a}::bigint * x + {b}) % {P31}), 'min')"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return f"(SELECT [{sigs}] FROM (SELECT {hs} AS __h))"


def sql_band_keys(sig_expr: str) -> str:
    keys = []
    for b in range(N_BANDS):
        cols = " || ':' || ".join(
            f"__s[{b * ROWS_PER_BAND + i + 1}]" for i in range(ROWS_PER_BAND)
        )
        keys.append(f"md5('{b}' || ':' || {cols})")
    return f"(SELECT [{', '.join(keys)}] FROM (SELECT {sig_expr} AS __s))"


def sql_simhash(expr: str) -> str:
    hs = f"list_transform({sql_tokens(expr)}, t -> {sql_h60('t')})"
    bits = " + ".join(
        f"(CASE WHEN list_reduce(list_transform(__h, h -> ((h >> {b}) % 2) * 2 - 1), (a, b) -> a + b) > 0 "
        f"THEN {1 << b}::bigint ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"(SELECT {bits} FROM (SELECT {hs} AS __h))"


def sql_fingerprint(expr: str) -> str:
    toks = sql_tokens(expr)
    return (
        f"(SELECT list_reduce(list_transform(range(1, len(__t) + 1), i -> "
        f"i * ({sql_h60('__t[i]')} % {P31})), (a, b) -> a + b) % {(1 << 61) - 1} "
        f"FROM (SELECT {toks} AS __t))"
    )


# --- URL canonicalization (crawl-pipeline first-stage dedup key) ----------
# Same twin-implementation contract as the hashes above: one Spark
# Column expression, one DuckDB fragment, identical semantics —
# lowercase scheme+host, strip a leading 'www.', strip the scheme's
# default port (:80 http / :443 https), drop the fragment, drop
# tracking query params (utm_*, fbclid, gclid, ref), sort surviving
# params byte-lexicographically (ASCII assumption documented), and
# collapse trailing path slashes (empty path -> '/'). Non-default
# ports, other schemes, and unknown params are preserved.

URL_TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url(url: Column) -> Column:
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host0 = F.regexp_replace(F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1)), r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host0, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host0, r":443$", ""))
        .otherwise(host0)
    )
    pathq = F.regexp_replace(F.regexp_extract(rest, r"^[^/?#]*(.*)$", 1), r"#.*$", "")
    path0 = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", "")
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    query0 = F.regexp_extract(pathq, r"^[^?]*\?(.*)$", 1)
    kept = F.filter(
        F.split(query0, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(URL_TRACKING_PARAM_RE),
    )
    q = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def sql_canonical_url(expr: str) -> str:
    scheme = f"lower(regexp_extract({expr}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace(trim({expr}), '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    host0 = f"regexp_replace(lower(regexp_extract({rest}, '^([^/?#]*)', 1)), '^www\\.', '')"
    host = (
        f"(CASE WHEN {scheme} = 'http' THEN regexp_replace({host0}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host0}, ':443$', '') "
        f"ELSE {host0} END)"
    )
    pathq = f"regexp_replace(regexp_extract({rest}, '^[^/?#]*(.*)$', 1), '#.*$', '')"
    path0 = f"regexp_replace(regexp_extract({pathq}, '^([^?]*)', 1), '/+$', '')"
    path = f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END)"
    query0 = f"regexp_extract({pathq}, '^[^?]*\\?(.*)$', 1)"
    kept = (
        f"list_filter(string_split({query0}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{URL_TRACKING_PARAM_RE}'))"
    )
    # coalesce: DuckDB's array_to_string of an EMPTY list is NULL (the
    # Spark twin's array_join returns ''), and concat ignores NULLs —
    # without it a query-less URL grows a bare '?'
    q = f"coalesce(array_to_string(list_sort({kept}), '&'), '')"
    return (
        f"concat({scheme}, '://', {host}, {path}, "
        f"(CASE WHEN {q} = '' THEN '' ELSE concat('?', {q}) END))"
    )


# --- zlib calibration corpus (compression-ratio oracle) -------------------
# The compression-ratio kernel (operators/textops.compression_ratio)
# is the one deliberately non-SQL-expressible text operator: DuckDB
# has no zlib. To still give the driver a VALUE-level check, the
# registry query compresses these eight FIXED strings — constructed
# from doc_id only, never from testdata content, so the pins survive
# testdata regeneration — and the oracle carries their zlib output
# lengths as a literal relation computed by the same interpreter's
# zlib at oracle-build time. The classes span the signal range the
# operator exists to measure: degenerate repetition (ratio ~0.007)
# through natural-language boilerplate up to hash-chain noise (~0.83).


def _hashchain(seed: str, blocks: int) -> str:
    import hashlib

    out = bytearray()
    for i in range(blocks):
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
    return "".join(chr(33 + b % 90) for b in out)


def calibration_texts() -> list[str]:
    """Eight deterministic strings, one per doc_id % 8 class."""
    return [
        "a" * 4096,
        "ab" * 1024,
        "the quick brown fox jumps over the lazy dog. " * 48,
        " ".join(f"token{i % 97}" for i in range(512)),
        _hashchain("tera-calib-4", 64),
        _hashchain("tera-calib-5", 8) + "z" * 1024,
        (
            "lorem ipsum dolor sit amet, consectetur adipiscing elit, "
            "sed do eiusmod tempor incididunt ut labore. "
        )
        * 20,
        "".join(chr(97 + (i * 7919 + i // 26) % 26) for i in range(1024)),
    ]


def calibration_pins() -> list[tuple[int, int, float]]:
    """(raw_bytes, comp_bytes, ratio) per class — computed by the
    DRIVER's zlib, the same library the Spark workers load (one
    interpreter locally; on a heterogeneous cluster, pin the zlib
    build across workers or this check degrades to an alarm). Ratio
    uses the kernel's exact floor-truncation."""
    import zlib

    out = []
    for s in calibration_texts():
        raw = s.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        out.append(
            (len(raw), comp, float(int(comp / len(raw) * 1_000_000)) / 1_000_000)
        )
    return out


def sql_compression_pins() -> str:
    """DuckDB VALUES relation (cls, raw_bytes, comp_bytes, ratio)."""
    rows = ", ".join(
        f"({c}, {raw}, {comp}, {ratio})"
        for c, (raw, comp, ratio) in enumerate(calibration_pins())
    )
    return f"(VALUES {rows}) AS pins(cls, raw_bytes, comp_bytes, ratio)"
