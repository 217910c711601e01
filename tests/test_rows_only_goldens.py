"""GOLDEN digests for every remaining rows-only declared query
(ADVICE r3: rows-only queries deserve value checks too).  Each query
is fully deterministic — hash-seeded inits, engine-pinned tie-breaks —
so the normalized result set is pinned by an exact md5 at sf0.001.
Any drift in bucketing, Lloyd iterations, PQ codebooks, SimHash bands,
or tie-breaks shows up as a digest change.

(r7: digests re-pinned once — normalize() floats are repr-encoded now
(sign-of-zero-faithful); old-encoding digests matched every pin before
re-pinning, except emb_whiten_moments whose −0.0 → +0.0 snap is the
deliberate r7 fix.)

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
# (emb_pca_topvar + doc_compression_stats moved out in r10: the
# declared queries are value-oracled now — exact top-variance moments /
# shingle-dictionary proxy — and the eigensolve spectrum / zlib rollup
# they used to return keep the SAME digests in tests/test_pca.py::
# test_eigen_spectrum_golden and tests/test_corpus.py::
# test_zlib_compression_rollup_golden.)
GOLDEN = {
    # oracled too (the cov = I invariant); the digest additionally pins
    # the exact 36-row grid across container/library versions
    "emb_whiten_moments": (36, "3ab8ea596a56b7f4f6c2bd925c4c6e02"),
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
