#!/usr/bin/env python
"""Dump .explain('formatted') for every bench query to plans/<tag>/<query>_<suffix>.txt."""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import BENCH_QUERIES
    from tera_spark.session import get_spark
    import tera_spark.queries as Q

    Q.load_all()
    spark = get_spark("plan_dump")
    out_dir = Path(_REPO) / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names or BENCH_QUERIES:
        df = Q.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
