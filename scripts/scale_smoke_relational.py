#!/usr/bin/env python
"""Relational scale smoke: multiply the sf0.1 fact tables N× (key-
shifted copies, so join fan-out and group cardinality scale the way
real data does) and measure the flagship relational plan shapes —
aggregation (Q1), join+topk (Q3-like), window — for scaling linearity.

Results land in SCALE.md §4. Run: `python scripts/scale_smoke_relational.py [mult]`.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from tera_spark.session import get_spark  # noqa: E402

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SF = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("rel_smoke")
    m = spark.range(MULT).select(F.col("id").alias("rep"))

    li0 = spark.read.parquet(f"{SF}/lineitem.parquet")
    od0 = spark.read.parquet(f"{SF}/orders.parquet")
    n_orders = od0.count()
    # key-shifted replicas: order keys stay unique per replica so the
    # join fan-out per key is constant (real growth), not multiplied
    li = li0.crossJoin(m).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("rep") * F.lit(10_000_000)
    )
    od = od0.crossJoin(m).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("rep") * F.lit(10_000_000)
    )
    li = li.repartition(64).cache()
    od = od.repartition(64).cache()
    n_li, n_od = li.count(), od.count()

    out = {"mult": MULT, "lineitem_rows": n_li, "orders_rows": n_od}

    def best_of(make, n=2):
        # build a FRESH DataFrame per execution: re-collecting one
        # plan object reuses its shuffle stage outputs and under-reports
        make().collect()  # warm (codegen compile, cache touch)
        b = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            make().collect()
            b = min(b, time.perf_counter() - t0)
        return round(b, 2)

    from pyspark.sql import Window as W

    # Q1 shape: wide aggregation over the full fact
    def q1():
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"),
            F.avg("l_discount"), F.count(F.lit(1)),
        )

    out["q1_agg_s"] = best_of(q1)

    # Q3 shape: fact-fact join + aggregation + top-k
    def q3():
        return (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderdate")
            .agg(F.sum(li.l_extendedprice * (1 - li.l_discount)).alias("rev"))
            .orderBy(F.desc("rev"))
            .limit(10)
        )

    out["q3_join_topk_s"] = best_of(q3)

    # window shape: rank within order
    def qw():
        return (
            li.select(
                "l_orderkey",
                F.row_number().over(
                    W.partitionBy("l_orderkey").orderBy(F.desc("l_extendedprice"))
                ).alias("rn"),
            )
            .filter(F.col("rn") == 1)
            .groupBy()
            .count()
        )

    out["window_rank_s"] = best_of(qw)

    out["rows_per_s_q1"] = round(n_li / out["q1_agg_s"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
