"""Sweep every declared query's physical plan for shape smells.

For each query: capture `.explain("formatted")`, then count
- parquet scans OUTSIDE any InMemoryRelation subtree (a cached frame's
  storage plan is printed under each InMemoryTableScan, so raw scan
  counts over-report; an indent-aware walk excludes those subtrees),
- Exchange nodes (same exclusion),
- Python-boundary nodes (BatchEvalPython should never appear; Arrow
  nodes are informational),
- SortMergeJoin vs BroadcastHashJoin mix.

High un-cached scan counts flag the duplicated-subtree smell that bit
graph_adamic_adar (72 scans, 0 reused) in round 14.

Usage: python scripts/plan_smells.py [min_scans] [query ...]
"""
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def tree_lines(formatted: str) -> list:
    """The operator-tree portion of a formatted explain (before the
    numbered detail section)."""
    out = []
    for line in formatted.splitlines():
        if re.match(r"^\(\d+\) ", line):
            break
        out.append(line)
    return out


def _depth(line: str) -> int:
    m = re.search(r"[+:]- ", line)
    return m.start() if m else -1


def count_outside_cache(lines: list, needle: str) -> int:
    """Count tree nodes containing `needle` that are NOT inside an
    InMemoryRelation subtree (depth-based ancestor check)."""
    n = 0
    cache_depths: list = []
    for line in lines:
        d = _depth(line)
        if d < 0:
            continue
        while cache_depths and d <= cache_depths[-1]:
            cache_depths.pop()
        inside = bool(cache_depths)
        if "InMemoryRelation" in line:
            cache_depths.append(d)
        if needle in line and not inside:
            n += 1
    return n


def main():
    args = sys.argv[1:]
    min_scans = int(args[0]) if args and args[0].isdigit() else 6
    names = args[1:] if args and args[0].isdigit() else args
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_tensors_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session(app_name="plan-smells")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    rows = []
    for name in sorted(names or qs):
        try:
            df = qs[name](spark, sf)
        except Exception as exc:  # streaming wrappers etc.
            rows.append((name, f"ERR {type(exc).__name__}"))
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        lines = tree_lines(buf.getvalue())
        scans = count_outside_cache(lines, "Scan parquet")
        exch = count_outside_cache(lines, "Exchange")
        smj = count_outside_cache(lines, "SortMergeJoin")
        bhj = count_outside_cache(lines, "BroadcastHashJoin")
        py = sum(1 for ln in lines if "BatchEvalPython" in ln)
        arrow = sum(
            1
            for ln in lines
            if "ArrowEvalPython" in ln
            or "MapInPandas" in ln
            or "FlatMapGroupsInPandas" in ln
        )
        rows.append(
            (name, f"scans={scans} exch={exch} smj={smj} bhj={bhj} "
                   f"batchpy={py} arrow={arrow}")
        )
        if scans >= min_scans or py:
            print(f"FLAG {name}: {rows[-1][1]}", flush=True)
    print("---- all ----")
    for name, desc in rows:
        print(f"{name}: {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
