#!/usr/bin/env python
"""Deterministic scale-factor generator for the bench-scaling study
(round-9 task: one measured sf-scaling datapoint for the relational
bench). Produces the SAME ten-table schema as /root/testdata —
`region nation customer supplier part orders lineitem events
documents embeddings` — at any sf, with distributions matched to the
driver's generator (value domains, group cardinalities, key fan-outs,
the 30-day events span with sf-scaled user count, vocab-bag document
texts, 64-dim clustered embeddings).

Determinism: every column derives from xxhash64(id, salt) — no RNG
state, no Python UDFs; the same (sf, row id) always produces the same
row. The driver's own values are NOT reproduced (seed unknown); the
point of the generated corpus is apples-to-apples per-query runtime
SLOPES between two sfs of THIS generator, with gen-sf0.1 vs the real
sf0.1 as the sanity row (same shape, comparable absolute times —
recorded in SCALE.md).

Usage: python scripts/gen_sf.py <sf> <outdir>
e.g.   python scripts/gen_sf.py 0.5 /tmp/sfgen/sf0.5
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402


def _u(col, salt: int, n):
    """Deterministic uniform integer in [0, n) from (col, salt)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(n))


def _uf(col, salt: int):
    """Deterministic uniform double in [0, 1)."""
    return _u(col, salt, 1_000_000) / F.lit(1_000_000.0)


REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "red", "small", "dark", "light", "cold"]
PNOUN = ["ring", "bolt", "case", "drum", "pipe", "disk", "cup", "rod"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]  # en ~41%, rest ~15% each
VOCAB = (
    "spark batch part line column order small sort fast value scan hash "
    "slow group agg filter big merge stream the key query table join "
    "window vector data customer a index plan row cache"
).split()


def _pick(col, salt: int, values: list[str]):
    return F.element_at(F.array(*[F.lit(v) for v in values]), (_u(col, salt, len(values)) + 1).cast("int"))


def main() -> None:
    sf = float(sys.argv[1])
    out = Path(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)

    from tera_spark.session import get_spark

    spark = get_spark("gen_sf")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line_per = 4  # lineitem = 4 x orders, line numbers 1..4
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)  # 30-day span fixed; density per user constant
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)

    def write(df, name, parts):
        df.coalesce(parts).write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
        print(f"{name}: {spark.read.parquet(str(out / f'{name}.parquet')).count()} rows")

    region = spark.createDataFrame(
        [(i, n) for i, n in enumerate(REGIONS)], "r_regionkey int, r_name string"
    )
    write(region, "region", 1)

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        F.pmod(F.col("id"), F.lit(5)).cast("int").alias("n_regionkey"),
    )
    write(nation, "nation", 1)

    customer = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("c_name"),
        _u(F.col("id"), 11, 25).cast("int").alias("c_nationkey"),
        F.round(_uf(F.col("id"), 12) * 11000 - 1000, 2).alias("c_acctbal"),
        _pick(F.col("id"), 13, SEGMENTS).alias("c_mktsegment"),
    )
    write(customer, "customer", 4)

    supplier = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("s_name"),
        _u(F.col("id"), 21, 25).cast("int").alias("s_nationkey"),
        F.round(_uf(F.col("id"), 22) * 11000 - 1000, 2).alias("s_acctbal"),
    )
    write(supplier, "supplier", 1)

    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(_pick(F.col("id"), 31, PADJ), F.lit(" "), _pick(F.col("id"), 32, PNOUN)).alias("p_name"),
        F.concat(F.lit("Brand#"), _u(F.col("id"), 33, 25).cast("string")).alias("p_brand"),
        _pick(F.col("id"), 34, PTYPES).alias("p_type"),
        (_u(F.col("id"), 35, 50) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.col("id") % 10000 / F.lit(10.0), 2).alias("p_retailprice"),
    )
    write(part, "part", 4)

    day = 86400
    span_days = 2404  # 1995-01-01 .. 2001-08-01, matching the driver
    t0 = F.to_timestamp(F.lit("1995-01-01"))
    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        _u(F.col("id"), 41, max(n_cust, 1)).alias("o_custkey"),
        _pick(F.col("id"), 42, ["F", "O", "P"]).alias("o_orderstatus"),
        F.round(_uf(F.col("id"), 43) * 499000 + 1000, 2).alias("o_totalprice"),
        F.timestamp_seconds(
            F.unix_timestamp(t0) + _u(F.col("id"), 44, span_days) * day
        ).alias("o_orderdate"),
        _pick(F.col("id"), 45, PRIORITIES).alias("o_orderpriority"),
    )
    write(orders, "orders", 8)

    li = spark.range(n_ord * n_line_per).select(
        (F.col("id") / n_line_per).cast("long").alias("l_orderkey"),
        F.col("id").alias("_lid"),
        (F.pmod(F.col("id"), F.lit(n_line_per)) + 1).cast("int").alias("l_linenumber"),
    )
    lineitem = li.select(
        "l_orderkey",
        _u(F.col("_lid"), 51, max(n_part, 1)).alias("l_partkey"),
        _u(F.col("_lid"), 52, max(n_supp, 1)).alias("l_suppkey"),
        "l_linenumber",
        (_u(F.col("_lid"), 53, 50) + 1).cast("double").alias("l_quantity"),
        F.round(_uf(F.col("_lid"), 54) * 104100 + 900, 2).alias("l_extendedprice"),
        (F.round(_u(F.col("_lid"), 55, 11) / F.lit(100.0), 2)).alias("l_discount"),
        (F.round(_u(F.col("_lid"), 56, 9) / F.lit(100.0), 2)).alias("l_tax"),
        _pick(F.col("_lid"), 57, ["A", "N", "R"]).alias("l_returnflag"),
        _pick(F.col("_lid"), 58, ["F", "O"]).alias("l_linestatus"),
        F.timestamp_seconds(
            F.unix_timestamp(t0)
            + _u(F.col("l_orderkey"), 44, span_days) * day  # = o_orderdate
            + (_u(F.col("_lid"), 59, 94) + 1) * day  # ship 1..94 days later
        ).alias("l_shipdate"),
    )
    write(lineitem, "lineitem", 16)

    e0 = F.to_timestamp(F.lit("2024-01-01"))
    span_s = 30 * day  # 30-day window, fixed across sf (density scales via users)
    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.unix_timestamp(e0) * 1_000_000)
            + (_u(F.col("id"), 61, span_s) * 1_000_000 + _u(F.col("id"), 62, 1_000_000))
        ).alias("ts"),
        _u(F.col("id"), 63, max(n_users, 1)).alias("user_id"),
        _pick(F.col("id"), 64, ETYPES).alias("event_type"),
        F.round(_uf(F.col("id"), 65) * 560, 2).alias("value"),
        F.concat(F.lit('{"k": '), _u(F.col("id"), 66, 100).cast("string"), F.lit("}")).alias("props"),
    )
    # events are time-ordered on disk in the driver corpus (an append
    # log); sort so scan/watermark behavior matches
    write(events.sort("ts"), "events", 8)

    # documents: vocab-bag texts, 8..110 words (avg chars ~297), en-heavy
    # lang mix, 20 uniform sources, and a ~0.2% exact-dup rate (dup docs
    # copy the text of doc id-1) so exact/near-dup operators have signal
    words = F.transform(
        F.sequence(F.lit(0), _u(F.col("id"), 71, 103) + 7),
        lambda j: _pick(F.xxhash64(F.col("id"), j), 72, VOCAB),
    )
    dup = _u(F.col("id"), 73, 500) == 0
    base_text = F.concat_ws(" ", words)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            dup & (F.col("id") > 0),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), _u(F.col("id") - 1, 71, 103) + 7),
                    lambda j: _pick(F.xxhash64(F.col("id") - 1, j), 72, VOCAB),
                ),
            ),
        )
        .otherwise(base_text)
        .alias("text"),
        F.when(_u(F.col("id"), 74, 100) < 41, F.lit("en"))
        .otherwise(_pick(F.col("id"), 75, ["de", "es", "fr", "zh"]))
        .alias("lang"),
        F.concat(F.lit("src"), _u(F.col("id"), 76, 20).cast("string")).alias("source"),
    )
    docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    write(docs, "documents", 2)

    # embeddings: 64-dim float, 10 labels, clustered (label centroid +
    # per-vector noise) like the driver corpus — ANN recall depends on
    # cluster structure existing
    lbl = _u(F.col("id"), 81, 10)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (
            (_u(F.xxhash64(lbl, j), 82, 2001) - 1000) / F.lit(1000.0)
            + (_u(F.xxhash64(F.col("id"), j), 83, 2001) - 1000) / F.lit(3000.0)
        ).cast("float"),
    )
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        lbl.cast("int").alias("label"),
    )
    write(emb, "embeddings", 2)

    print(f"done: sf={sf} at {out}")


if __name__ == "__main__":
    main()
