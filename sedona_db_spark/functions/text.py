"""Text-analysis functions for the documents/pages corpus.

Everything here is a *Column expression builder* over built-in
`pyspark.sql.functions` — no Python UDFs in these hot paths, so the whole
stage compiles to JVM codegen and survives a 100 TB scan. (Language-ID is
the one rule-based scorer; it is still pure Column algebra.)
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# tokenization / counting
# ---------------------------------------------------------------------------

# BPE-ish word pattern: letter runs, digit runs, or single punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_tokens(text: Column) -> Column:
    """Whitespace tokens (empty string -> empty array)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(whitespace_tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish tokens via regexp_extract_all (JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

EN_STOPWORDS = ["the", "a", "an", "of", "to", "and", "in", "is", "it", "that"]


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    total = F.length(text).cast("double")
    nonpunct = F.length(F.regexp_replace(text, r"[^\w\s]", "")).cast("double")
    return F.when(total > 0, (total - nonpunct) / total).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: List[str] = EN_STOPWORDS) -> Column:
    toks = F.transform(whitespace_tokens(text), lambda w: F.lower(w))
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = whitespace_tokens(text)
    n = F.size(toks)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, v: a + v)
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation
    noise, natural stopword density, sane word lengths. Deterministic
    closed-form — reproducible in plain SQL for the oracle."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4)
    sw = stopword_ratio(text)
    sw_score = F.least(sw * 5, F.lit(1.0))
    mwl = mean_word_length(text)
    wl_score = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_score + punct_pen + sw_score + wl_score) / 4.0, 6)


# ---------------------------------------------------------------------------
# language identification (stopword-hit heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "es"],
}


def lang_scores(text: Column) -> Dict[str, Column]:
    toks = F.transform(whitespace_tokens(text), lambda w: F.lower(w))
    return {
        lang: F.size(F.filter(toks, lambda w: w.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def langid(text: Column) -> Column:
    """Argmax language over marker-hit counts; 'und' when no marker hits.
    Ties break in fixed (en, de, fr, es) order."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# repetition / boilerplate filters (Gopher-rules style)
# ---------------------------------------------------------------------------
#
# The published web-corpus quality rules (Gopher §A1.1, C4) threshold on
# "fraction of words in duplicated n-grams" and "fraction taken by the most
# frequent n-gram". Everything below is pure Column algebra: the most-
# frequent count is computed as the longest equal-run of the SORTED token
# array via F.aggregate — O(n log n) per document, no explode, no shuffle,
# so a 100 TB scan stays one codegen'd map stage. (The naive
# distinct×filter counting is O(n^2) per doc and is only used in the DuckDB
# oracle where docs are small.)


def _max_equal_run(arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    array == count of the most frequent element. Empty array -> 0."""
    s = F.array_sort(arr)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )

    def step(a, v):
        run = F.when(v == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            v.alias("prev"), run.alias("run"),
            F.greatest(a["best"], run).alias("best"),
        )

    return F.aggregate(s, init, step, lambda a: a["best"])


def _word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams (array of size max(0, len-n+1))."""
    if n == 1:
        return toks
    size = F.size(toks)
    out = F.slice(toks, 1, F.greatest(size - (n - 1), F.lit(0)))
    for k in range(1, n):
        nxt = F.slice(toks, k + 1, F.greatest(size - (n - 1), F.lit(0)))
        out = F.zip_with(out, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return out


def _dup_frac(arr: Column) -> Column:
    n = F.size(arr)
    return F.when(
        n > 0,
        (n - F.size(F.array_distinct(arr))).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def _top_frac(arr: Column) -> Column:
    n = F.size(arr)
    return F.when(
        n > 0, _max_equal_run(arr).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def repetition_stats(text: Column) -> Dict[str, Column]:
    """Gopher-style repetition metrics, all JVM-side:

    - ``n_words``: whitespace token count
    - ``dup_word_frac`` / ``dup_bigram_frac`` / ``dup_trigram_frac``:
      fraction of n-grams that are repeats of an earlier occurrence
      (1 - distinct/total)
    - ``top_word_frac`` / ``top_bigram_frac``: fraction taken by the
      single most frequent n-gram
    """
    toks = whitespace_tokens(text)
    bi = _word_ngrams(toks, 2)
    tri = _word_ngrams(toks, 3)
    return {
        "n_words": F.size(toks),
        "dup_word_frac": _dup_frac(toks),
        "top_word_frac": _top_frac(toks),
        "dup_bigram_frac": _dup_frac(bi),
        "top_bigram_frac": _top_frac(bi),
        "dup_trigram_frac": _dup_frac(tri),
    }


def repetitive_flag(
    text: Column,
    max_dup_word_frac: float = 0.30,
    max_top_word_frac: float = 0.20,
    max_dup_bigram_frac: float = 0.20,
) -> Column:
    """True when any repetition metric crosses its (Gopher-like) threshold
    — the document is boilerplate/spam-shaped and should be dropped from a
    training corpus."""
    s = repetition_stats(text)
    return (
        (s["dup_word_frac"] > max_dup_word_frac)
        | (s["top_word_frac"] > max_top_word_frac)
        | (s["dup_bigram_frac"] > max_dup_bigram_frac)
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models: ...
# Gopher", §A1.1) — the standard document-level webtext keep/drop gate
# ---------------------------------------------------------------------------

# the paper's 8 indicator words: a kept English document must contain >= 2
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_stats(text: Column) -> Dict[str, Column]:
    """The raw Gopher §A1.1 quality measurements, each a pure Column
    expression (zero Python — survives a 100 TB scan inside codegen):

    * ``n_words`` — whitespace token count
    * ``mean_word_len`` — mean token length
    * ``symbol_word_ratio`` — ('#' count + '...' count) / words
    * ``bullet_line_frac`` — fraction of lines starting with a bullet
    * ``ellipsis_line_frac`` — fraction of lines ending with an ellipsis
    * ``alpha_word_frac`` — fraction of words containing a letter
    * ``stop_hits`` — how many of the 8 indicator words appear
    """
    toks = whitespace_tokens(text)
    low = F.transform(toks, lambda w: F.lower(w))
    n = F.size(toks)
    nd = n.cast("double")
    total_len = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, v: a + v)
    mwl = F.when(n > 0, total_len.cast("double") / nd).otherwise(F.lit(0.0))

    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / F.lit(3)
    sym_ratio = F.when(n > 0, (n_hash + n_ellipsis).cast("double") / nd).otherwise(
        F.lit(0.0)
    )

    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    n_lines = F.size(lines)
    bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•‣▪]")))
    ell_end = F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
    bullet_frac = F.when(n_lines > 0, bullet.cast("double") / n_lines.cast("double")).otherwise(F.lit(0.0))
    ell_frac = F.when(n_lines > 0, ell_end.cast("double") / n_lines.cast("double")).otherwise(F.lit(0.0))

    alpha = F.size(F.filter(toks, lambda w: w.rlike(r"[A-Za-z]")))
    alpha_frac = F.when(n > 0, alpha.cast("double") / nd).otherwise(F.lit(0.0))

    stop_hits = F.aggregate(
        F.array(*[
            F.when(F.array_contains(low, w), F.lit(1)).otherwise(F.lit(0))
            for w in GOPHER_STOPWORDS
        ]),
        F.lit(0),
        lambda a, v: a + v,
    )
    return {
        "n_words": n,
        "mean_word_len": mwl,
        "symbol_word_ratio": sym_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ell_frac,
        "alpha_word_frac": alpha_frac,
        "stop_hits": stop_hits,
    }


def gopher_keep(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """Gopher §A1.1 keep flag — True iff every rule passes (paper
    thresholds as defaults). Compose with ``repetitive_flag`` (§A1.1's
    repetition table) for the full Gopher gate."""
    s = gopher_stats(text)
    return (
        (s["n_words"] >= min_words)
        & (s["n_words"] <= max_words)
        & (s["mean_word_len"] >= min_mean_word_len)
        & (s["mean_word_len"] <= max_mean_word_len)
        & (s["symbol_word_ratio"] <= max_symbol_word_ratio)
        & (s["bullet_line_frac"] <= max_bullet_line_frac)
        & (s["ellipsis_line_frac"] <= max_ellipsis_line_frac)
        & (s["alpha_word_frac"] >= min_alpha_word_frac)
        & (s["stop_hits"] >= min_stop_hits)
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def doc_fingerprint(text: Column) -> Column:
    """Canonical-form digest: lowercase, strip non-alphanumerics, collapse
    whitespace, md5. Robust to case/punctuation edits; SQL-reproducible."""
    norm = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm)


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning...", §2.2) — the standard webtext page-cleaning pass
# ---------------------------------------------------------------------------


def c4_kept_lines(text: Column, min_words: int = 5) -> Column:
    """Array of lines surviving the C4 line filters: the trimmed line ends
    in a terminal punctuation mark, carries at least ``min_words``
    whitespace words, and does not mention javascript. Pure Column algebra
    (split/filter/rlike) — whole-stage codegen, no Python, no shuffle."""

    def _keep(ln):
        t = F.trim(ln)
        words = F.size(F.split(t, r"\s+"))
        return (
            t.rlike("[.!?\"']$")
            & (words >= F.lit(int(min_words)))
            & ~F.lower(t).contains("javascript")
        )

    return F.filter(F.split(text, "\n"), _keep)


def c4_clean(text: Column, min_words: int = 5) -> Column:
    """The kept lines re-joined with newlines (the cleaned page body)."""
    return F.array_join(c4_kept_lines(text, min_words), "\n")


def c4_sentence_count(cleaned: Column) -> Column:
    """Terminal-punctuation count over the cleaned body — the sentence
    proxy C4's >=3-sentence page gate uses."""
    return F.length(cleaned) - F.length(F.translate(cleaned, ".!?", ""))


def c4_page_keep(
    text: Column,
    min_words: int = 5,
    min_sentences: int = 3,
) -> Column:
    """Page-level C4 gate: >= min_sentences sentences across kept lines,
    no curly brace (code), no 'lorem ipsum' placeholder text."""
    cleaned = c4_clean(text, min_words)
    return (
        (c4_sentence_count(cleaned) >= F.lit(int(min_sentences)))
        & ~text.contains("{")
        & ~F.lower(text).contains("lorem ipsum")
    )


def _gram_hashes(text: Column, k: int) -> Column:
    """Ordered base-31 Horner hashes (mod 2^31-1) of every char k-gram —
    the same arithmetic as the minhash shingles (operators/dedup.py
    _char_shingles31), but POSITIONAL (winnowing needs order, not a
    set).  Pure Column algebra: whole-stage codegen, no Python."""
    def horner(i: Column) -> Column:
        h = F.ascii(text.substr(i, F.lit(1)))
        for j in range(1, k):
            h = h * F.lit(31) + F.ascii(text.substr(i + F.lit(j), F.lit(1)))
        return (h % F.lit(2147483647)).cast("long")

    return F.transform(
        F.sequence(F.lit(1), F.length(text) - F.lit(k - 1)), horner)


def winnow_fingerprints(text: Column, k: int = 5, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): the distinct minima of every
    ``window`` consecutive k-gram hashes.  Guarantees: any shared
    substring of length >= k + window - 1 contributes at least one
    common fingerprint, and fingerprint density is ~2/(window+1).
    Returns a sorted array<long>; docs shorter than k + window - 1
    yield an empty array."""
    hs = _gram_hashes(text, k)
    n_h = F.size(hs)
    wins = F.transform(
        F.sequence(F.lit(1), n_h - F.lit(window - 1)),
        lambda i: F.array_min(F.slice(hs, i, window)),
    )
    fps = F.array_sort(F.array_distinct(wins))
    empty = F.array().cast("array<long>")
    return F.when(
        text.isNotNull() & (F.length(text) >= k + window - 1), fps
    ).otherwise(empty)


def winnow_fingerprints_udf(k: int = 5, window: int = 4):
    """Arrow-batched numpy winnowing — same values as
    :func:`winnow_fingerprints`, built for the hot path.

    The pure-Column form above is the SQL-shaped reference, but Catalyst
    re-evaluates the WHOLE gram-hash array inside every
    ``slice(hs, i, w)`` lambda element (no common-subexpression
    elimination across higher-order-function lambdas), which turns an
    O(n) kernel into O(n^2) expression interpretation — minutes per
    thousand documents.  Here the hashes are computed once per doc and
    the window minima come from one ``sliding_window_view`` min."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    from ..operators.dedup import _P31

    @pandas_udf(ArrayType(LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None or len(t) < k + window - 1:
                out.append([])
                continue
            codes = np.frombuffer(t.encode("utf-32-le"),
                                  dtype=np.uint32).astype(np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(codes, k)
            h = np.zeros(len(win), dtype=np.uint64)
            for j in range(k):
                h = h * np.uint64(31) + win[:, j]
            h = h % np.uint64(_P31)
            mins = np.lib.stride_tricks.sliding_window_view(
                h, window).min(axis=1)
            out.append(np.unique(mins).astype(np.int64).tolist())
        return pd.Series(out, dtype=object)

    return winnow
