"""Text-analysis operators (north-star M4): tokenization stats, quality
scoring, language-ID heuristic, fingerprinting.

All hot-path expressions are pure Spark SQL (codegen, no Python) so they
run scan-side at 100 TB: a document row never leaves the JVM.  Column
builders return ``F.Column`` so callers compose them into one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword lists for the n-gram/stopword language heuristic.
# Deliberately small + fixed: the point is the operator shape (scan-side
# scoring over token arrays), not lexical coverage.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
}

PUNCT_CLASS = "[^,.!?;:]"


def tokens_col(text: Column | str = "text") -> Column:
    """Whitespace tokens, empties removed (split-on-space keeps parity
    with the DuckDB oracle's non-regex string_split)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count_col(text: Column | str = "text") -> Column:
    return F.size(tokens_col(text)).cast("long")


def bpe_ish_token_count_col(text: Column | str = "text") -> Column:
    """Sub-word-ish token estimate: runs of letters, runs of digits, or
    single non-space symbols — a BPE-flavored regex count."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).cast(
        "long"
    )


def avg_token_len_col(text: Column | str = "text") -> Column:
    toks = tokens_col(text)
    return F.when(F.size(toks) > 0,
                  F.aggregate(F.transform(toks, F.length),
                              F.lit(0),
                              lambda a, x: a + x).cast("double")
                  / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio_col(text: Column | str = "text") -> Column:
    text = F.col(text) if isinstance(text, str) else text
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(0.0)


def stopword_ratio_col(
    text: Column | str = "text", lang: str = "en"
) -> Column:
    toks = tokens_col(text)
    hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS[lang]))
    )
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks)).otherwise(0.0)


def quality_score_col(text: Column | str = "text") -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    − punctuation excess (shape mirrors production quality filters)."""
    n_tok = token_count_col(text).cast("double")
    len_term = F.least(n_tok / 100.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio_col(text) * 5.0, F.lit(1.0))
    punct_pen = F.least(punct_ratio_col(text) * 10.0, F.lit(1.0))
    return F.round(
        0.5 * len_term + 0.5 * stop_term - 0.25 * punct_pen, 6
    )


def langid_struct_col(text: Column | str = "text") -> Column:
    """Argmax language over per-language stopword hit counts; ties break
    by language code order (deterministic)."""
    toks = tokens_col(text)
    scores = {
        lang: F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))
        for lang, words in STOPWORDS.items()
    }
    best = None
    for lang in sorted(scores):  # later langs win only on strictly greater
        if best is None:
            best = F.struct(
                scores[lang].alias("score"), F.lit(lang).alias("lang")
            )
        else:
            cand = F.struct(
                scores[lang].alias("score"), F.lit(lang).alias("lang")
            )
            best = F.when(cand["score"] > best["score"], cand).otherwise(best)
    return best


def rolling_hashes_col(
    codes: Column | str = "codes", k: int = 5,
    base: int = 257, mod: int = 1_000_003,
) -> Column:
    """Rabin-Karp rolling hashes of char k-grams over the `codes`
    char-code array (`dedup._with_char_codes`): O(1) array lookups per
    position, pure integer SQL (DuckDB-reproducible)."""
    name = codes if isinstance(codes, str) else "codes"
    terms = " + ".join(
        f"{name}[CAST(i AS INT) + {j - 1}] * {base ** (k - 1 - j) % mod}"
        for j in range(k)
    )
    return F.expr(
        f"transform(sequence(1, greatest(size({name}) - {k - 1}, 1)), "
        f"i -> ({terms}) % {mod})"
    )


def winnow_col(hashes: Column | str, window: int = 4) -> Column:
    """Winnowing (Schleimer et al.): distinct min-hash of every
    length-`window` run of rolling hashes.  Any shared substring of
    length ≥ k+window−1 between two documents shares a fingerprint —
    the plagiarism/near-dup detection primitive.  Materialize `hashes`
    (rolling_hashes_col) in its own projection first, or the rolling
    pass re-evaluates per window."""
    name = hashes if isinstance(hashes, str) else "h"
    return F.expr(
        f"array_distinct(transform("
        f"sequence(1, greatest(size({name}) - {window - 1}, 1)), "
        f"w -> array_min(slice({name}, CAST(w AS INT), {window}))))"
    )


def fingerprint64_col(text: Column | str = "text") -> Column:
    """Deterministic 32-bit document fingerprint from the md5 prefix —
    cross-engine reproducible (same md5 hex on any platform)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.conv(F.substring(F.md5(text), 1, 8), 16, 10).cast("long")


def compression_signal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """zlib compression-ratio quality signal (the Gopher/RefinedWeb
    filter class): templated or repetitive text compresses far below
    natural prose, so ``ratio = len(zlib(text)) / len(text)`` separates
    boilerplate from content.  One Arrow-batched ``mapInPandas`` pass —
    the document bytes never shuffle; only (id, n_chars, n_zlib, ratio)
    leaves the stage.  zlib output is deterministic for a fixed level,
    so results are golden-pinnable (engine-specific, like SimHash).
    ``carry_cols`` ride through the stage (e.g. the grouping key), so
    downstream rollups need no corpus-scale join back to the source
    table.
    """
    import zlib

    import pandas as pd

    def batch(it):
        for pdf in it:
            texts = pdf[text_col].astype(str)
            n_raw = texts.str.len().astype("int64")
            n_z = pd.Series(
                [len(zlib.compress(t.encode("utf-8"), level))
                 for t in texts],
                index=pdf.index,
                dtype="int64",
            )
            out_cols = {id_col: pdf[id_col]}
            for c in carry_cols:
                out_cols[c] = pdf[c]
            out_cols["n_chars"] = n_raw
            out_cols["n_zlib"] = n_z
            yield pd.DataFrame(out_cols)

    # carry columns keep their source types (a numeric group key would
    # fail or coerce at Arrow conversion if hardcoded as string)
    carry_schema = "".join(
        f"{c} {df.schema[c].dataType.simpleString()}, "
        for c in carry_cols
    )
    out = df.select(id_col, *carry_cols, text_col).mapInPandas(
        batch, f"{id_col} long, {carry_schema}n_chars long, n_zlib long"
    )
    ratio = F.when(
        F.col("n_chars") > 0, F.col("n_zlib") / F.col("n_chars")
    ).otherwise(F.lit(0.0))
    return out.withColumn("ratio", F.round(ratio, 6))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-projection document statistics table."""
    return df.select(
        "doc_id",
        token_count_col(text_col).alias("n_tokens"),
        bpe_ish_token_count_col(text_col).alias("n_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.round(avg_token_len_col(text_col), 6).alias("avg_token_len"),
        F.round(punct_ratio_col(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio_col(text_col), 6).alias("stopword_ratio"),
        quality_score_col(text_col).alias("quality"),
        langid_struct_col(text_col)["lang"].alias("lang_guess"),
        fingerprint64_col(text_col).alias("fingerprint"),
    )
