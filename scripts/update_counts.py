"""Regenerate the README.md query/oracle/test counts from the LIVE
registry + pytest collection (VERDICT r9 #7: three rounds of
hand-edited drift; counts are now generated, never typed).

Usage: python scripts/update_counts.py            # rewrite README.md
       python scripts/update_counts.py --check    # exit 1 on drift

Counts live ONLY next to explicit HTML-comment anchors in README.md —
`<!--count:q-->N`, `<!--count:o-->N`, `<!--count:t-->N` — so an
unrelated "(N tests)" phrase elsewhere (a subset, a historical count)
can never be clobbered with the global total (ADVICE r10; the old
free-text regexes matched ANY such occurrence).  Prose that needs a
live count must carry the anchor.
"""

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def live_counts() -> tuple[int, int, int]:
    import __spark_entry__ as e

    n_q = len(e.queries())
    n_o = len(e.oracle_sql())
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:  # pytest >= 8 phrasing: "N tests collected in ..."
        m = re.search(r"collected (\d+)", out.stdout)
    n_t = int(m.group(1)) if m else -1
    return n_q, n_o, n_t


def rewrite(text: str, n_q: int, n_o: int, n_t: int) -> str:
    for marker, n in (("q", n_q), ("o", n_o), ("t", n_t)):
        pat = rf"<!--count:{marker}-->\d+"
        if not re.search(pat, text):
            raise SystemExit(
                f"README.md lost its <!--count:{marker}--> anchor(s); "
                "counts are only rewritten at explicit anchors"
            )
        text = re.sub(pat, f"<!--count:{marker}-->{n}", text)
    return text


def main() -> int:
    n_q, n_o, n_t = live_counts()
    if n_t < 0:
        print("could not collect tests", file=sys.stderr)
        return 2
    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        old = f.read()
    new = rewrite(old, n_q, n_o, n_t)
    print(f"queries={n_q} oracles={n_o} tests={n_t}")
    if "--check" in sys.argv:
        if new != old:
            print("README.md counts are STALE", file=sys.stderr)
            return 1
        print("README.md counts are current")
        return 0
    if new != old:
        with open(path, "w") as f:
            f.write(new)
        print("README.md rewritten")
    else:
        print("README.md already current")
    return 0


if __name__ == "__main__":
    sys.exit(main())
