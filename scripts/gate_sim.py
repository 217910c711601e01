"""Simulate the driver's correctness gate: run the EXACT first-50
registry window (least-recently-gated order) through the type-faithful
oracle harness at sf0.01.

Usage: python scripts/gate_sim.py [sf_dir] [n_window]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from pyspark.sql import SparkSession


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = (
        SparkSession.builder
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from tests.oracle_harness import compare, duck_connection

    qs, osql = e.queries(), e.oracle_sql()
    window = list(e._registry()[0])[:n]
    con = duck_connection(sf)
    fails = []
    t_all = time.time()
    for name in window:
        t0 = time.time()
        if name not in osql:
            try:
                nr = qs[name](spark, sf).count()
                print(f"{name:34s} ROWS-ONLY {nr} rows "
                      f"{time.time()-t0:.1f}s", flush=True)
            except Exception as ex:
                print(f"{name:34s} ERROR {ex}", flush=True)
                fails.append((name, str(ex)[:200]))
            continue
        try:
            ok, det = compare(qs[name], osql[name], spark, sf, con)
        except Exception as ex:
            ok, det = False, f"EXC {type(ex).__name__}: {ex}"
        print(f"{name:34s} {'OK ' if ok else 'FAIL'} {det[:140]} "
              f"{time.time()-t0:.1f}s", flush=True)
        if not ok:
            fails.append((name, det[:300]))
    con.close()
    print(f"\n=== window {len(window)}: {len(fails)} failures, "
          f"{time.time()-t_all:.0f}s ===")
    for nm, d in fails:
        print(f"FAIL {nm}: {d}")
    spark.stop()
    sys.exit(1 if fails else 0)


main()
