"""Profile one declared query: per-job wall + summed stage metrics.

Usage: python scripts/profile_query.py <query> [<query>...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.

Enables the UI's REST status API (load-robust summed executor run/CPU
time per stage) and prints, per query: build wall (query-fn call, which
runs internal localCheckpoint actions), action wall (.count()), job
list with descriptions, and stage totals.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_tensors_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session(
        app_name="profile-query",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
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
        from spark_tensors_spark.queries.kg import _encoded

        _raw, _ent, _rel, _enc = _encoded(spark, sf_dir)
        _enc.count()
    except Exception:
        pass

    app_id = spark.sparkContext.applicationId
    base = f"http://127.0.0.1:4099/api/v1/applications/{app_id}"

    def rest(path):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    for name in names:
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        sc = spark.sparkContext
        sc.setJobDescription(f"{name}: build")
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        sc.setJobDescription(f"{name}: action")
        df.count()
        t2 = time.perf_counter()
        sc.setJobDescription(None)
        print(f"\n=== {name}: build {t1-t0:.2f}s action {t2-t1:.2f}s "
              f"total {t2-t0:.2f}s")
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        stage_ids = set()
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            def _ms(s):
                from datetime import datetime
                try:
                    return datetime.strptime(
                        s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
                    ).timestamp()
                except Exception:
                    return None
            a, b = _ms(sub), _ms(comp)
            wall = f"{b-a:6.2f}s" if a and b else "  ?   "
            print(f"  job {j['jobId']:4d} {wall} stages={len(j['stageIds'])} "
                  f"tasks={j['numTasks']:5d}  {j.get('description','')[:80]}")
            stage_ids.update(j["stageIds"])
            if a and b and b - a > 0.5:
                for sid in sorted(j["stageIds"]):
                    try:
                        for att in rest(f"/stages/{sid}"):
                            print(f"      stage {sid}: {att.get('name','')[:90]}"
                                  f" tasks={att.get('numCompleteTasks')}"
                                  f" run={att.get('executorRunTime',0)/1e3:.2f}s")
                    except Exception:
                        pass
        run = cpu = srd = swr = 0
        ntasks = 0
        for s in rest("/stages?status=complete"):
            if s["stageId"] in stage_ids:
                run += s.get("executorRunTime", 0)
                cpu += s.get("executorCpuTime", 0)
                srd += s.get("shuffleReadBytes", 0)
                swr += s.get("shuffleWriteBytes", 0)
                ntasks += s.get("numCompleteTasks", 0)
        print(f"  stage totals: run {run/1e3:.1f}s cpu {cpu/1e9:.1f}s "
              f"tasks {ntasks} shuffleR {srd/1e6:.1f}MB shuffleW {swr/1e6:.1f}MB")
    spark.stop()


if __name__ == "__main__":
    main()
