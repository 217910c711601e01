"""GOLDEN digests for every remaining rows-only declared query
(ADVICE r3: rows-only queries deserve value checks too).  Each query
is fully deterministic — hash-seeded inits, engine-pinned tie-breaks —
so the normalized result set is pinned by an exact md5 at sf0.001.
Any drift in bucketing, Lloyd iterations, PQ codebooks, SimHash bands,
or tie-breaks shows up as a digest change.

(The three KGE smokes and tns_cp_als_fit have their own exact-value
golden tests; this file covers the ANN/sketch remainder.)
"""

from __future__ import annotations

import hashlib

from tests.conftest import SF_SMOKE
from tests.oracle_harness import normalize

# (The four ANN queries moved out in r5: they are value-oracled now —
# integer pseudo-geometry — and the trained float paths are pinned in
# tests/test_trained_ann_goldens.py with the same digests.)
# (doc_simhash_candidates + emb_near_dup_bucketed moved out in r6:
# value-oracled via pseudo-token hashes / int8 codes + pseudo_planes;
# their engine-hash production paths keep the same digests in
# tests/test_trained_ann_goldens.py.)
GOLDEN = {
    "emb_pca_topvar": (8, "1f8246306111c2da24b25c0dbd03c02e"),
    # oracled too (the cov = I invariant); the digest additionally pins
    # the exact 36-row grid across container/library versions
    "emb_whiten_moments": (36, "5f12fb15e8edd713d56f7664a9d06683"),
    # zlib byte counts are library-specific (hence no SQL oracle) but
    # deterministic for a fixed level within this container
    "doc_compression_stats": (20, "b5831312034f72bfc7c833cb1ab55955"),
    # oracled since r6 (full symbolic fit+apply replay); the digest
    # stays as an extra pin on the Python encode path
    "doc_bpe_encode_stats": (6, "c0ba6b450fa67de8cffddf8959b56419"),
}


def test_rows_only_query_digests(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    for name, (want_rows, want_md5) in GOLDEN.items():
        df = qs[name](spark, SF_SMOKE)
        cols, rows = normalize(
            df.columns, [tuple(r) for r in df.collect()]
        )
        got_md5 = hashlib.md5(repr((cols, rows)).encode()).hexdigest()
        assert (len(rows), got_md5) == (want_rows, want_md5), (
            name, len(rows), got_md5,
        )
