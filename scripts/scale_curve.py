"""Generate the SCALE.md scale-curve table from the two per-scale
bench records (`BENCH_FULL_sf0.01.json` / `BENCH_FULL_sf0.1.json`,
written by bench.py — run each ALONE; concurrent runs corrupt
timings).

Usage: python scripts/scale_curve.py [top_n] [lo_sf hi_sf]  # markdown
  (lo_sf/hi_sf select which BENCH_FULL_sf{X}.json pair to compare;
  default 0.01 vs 0.1 — pass e.g. `0.1 1.0` for the r13 scale decade)

The interesting signal is the wall-time ratio across a 10× data step:
ratio ≪ 10 = startup-constant-dominated (streaming, tiny fixtures),
ratio ≈ 10 = linear, ratio ≫ 10 = superlinear — fix before a 100×
deployment.  bench.py performs the same comparison mechanically per
run (`superlinear_vs_sibling` in its JSON).
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) not in (1, 2, 4):
        print(
            "usage: scale_curve.py [top_n] [lo_sf hi_sf]  "
            "(scale args must be given together)",
            file=sys.stderr,
        )
        return 2
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    lo_sf = sys.argv[2] if len(sys.argv) == 4 else "0.01"
    hi_sf = sys.argv[3] if len(sys.argv) == 4 else "0.1"
    try:
        lo = json.load(open(os.path.join(ROOT, f"BENCH_FULL_sf{lo_sf}.json")))
        hi = json.load(open(os.path.join(ROOT, f"BENCH_FULL_sf{hi_sf}.json")))
    except FileNotFoundError as e:
        print(f"missing per-scale record: {e}", file=sys.stderr)
        return 2
    data_ratio = hi["sf"] / lo["sf"]
    # the flag scan covers EVERY shared query — top_n bounds only the
    # DISPLAY table (a superlinear query outside the top rows must not
    # be reported as 'none', review r11)
    all_rows = [
        (n, t_lo, t_hi, t_hi / t_lo)
        for n, t_hi in sorted(hi["queries"].items(), key=lambda kv: -kv[1])
        if (t_lo := lo["queries"].get(n)) is not None and t_lo > 0
    ]
    flagged = [
        n for n, t_lo, t_hi, r in all_rows
        if r > 2 * data_ratio and t_hi >= 1.0
    ]
    rows = [
        x for x in all_rows if x[0] in flagged
    ] + [x for x in all_rows if x[0] not in flagged][:top_n]
    print(
        f"Top-{top_n} slowest shared queries by sf{hi_sf} wall time; flagged "
        "superlinear queries are ALWAYS included regardless of rank.\n"
    )
    print(f"| query | sf{lo_sf} s | sf{hi_sf} s "
          f"| ratio (data ×{data_ratio:.0f}) |")
    print("|---|---|---|---|")
    for n, t_lo, t_hi, r in rows:
        note = " **superlinear**" if n in flagged else ""
        print(f"| `{n}` | {t_lo:.2f} | {t_hi:.2f} | {r:.1f}{note} |")
    print(
        f"\nflagged superlinear (ratio > {2 * data_ratio:.0f}): "
        f"{flagged or 'none'}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
