"""Compare two bench JSON records (e.g. BENCH_LOCAL_r7 vs r8): total on
common queries, per-query regressions above a threshold, and
added/removed names.

Usage: python scripts/bench_diff.py OLD.json NEW.json [ratio=1.15]
"""
import json
import sys


def main():
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.15
    common = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"common {len(common)}: {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old:.2f}x)")
    regs = [
        (new[q] / old[q], old[q], new[q], q)
        for q in common
        if new[q] > old[q] * thr and new[q] - old[q] > 0.3
    ]
    for r, o, n, q in sorted(regs, reverse=True):
        print(f"  REG {r:.2f}x {o:.2f}->{n:.2f}s {q}")
    added = sorted(set(new) - set(old))
    if added:
        t_add = sum(new[q] for q in added)
        print(f"added {len(added)} (+{t_add:.1f}s):")
        for q in added:
            print(f"  +{new[q]:.2f}s {q}")
    removed = sorted(set(old) - set(new))
    if removed:
        print("removed:", removed)


if __name__ == "__main__":
    main()
