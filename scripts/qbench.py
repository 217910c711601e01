"""Targeted micro-bench: time a subset of declared queries, min-of-2.

Usage: python scripts/qbench.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Same methodology as bench.py (count() action, warm session, dictionary
memo pre-warm) but restricted to the named queries so a single change
can be measured without a full 221-query run.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_tensors_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session(app_name="qbench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    from spark_tensors_spark.io.readers import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    try:
        spark.range(10_000).repartition(
            spark.sparkContext.defaultParallelism
        ).mapInPandas(
            lambda it: (pdf.assign(id=pdf["id"]) for pdf in it),
            "id long",
        ).count()
    except Exception:
        pass
    try:
        from spark_tensors_spark.queries.kg import _encoded

        _raw, _ent, _rel, _enc = _encoded(spark, sf_dir)
        _enc.count()
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 4)
            best = dt if best is None else min(best, dt)
        timings[name] = best
    print(json.dumps({
        "queries": timings,
        "total": round(sum(timings.values()), 4),
        "loadavg": list(os.getloadavg()),
    }))


if __name__ == "__main__":
    main()
