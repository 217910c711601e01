"""Capture `.explain('formatted')` for declared queries into plan files.

Usage: python scripts/r14_plans.py <outdir> <suffix> <query> [<query> ...]

Writes <outdir>/<query>_<suffix>.txt for each query.  Building a query
DataFrame may run its internal actions (localCheckpoint barriers etc.);
the captured plan is the plan of the RETURNED DataFrame — the one the
bench times with .count().
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_tensors_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session(app_name="r14-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
