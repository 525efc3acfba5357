"""Text-analysis column expressions: tokens, quality, language-ID, shingles.

Part of the LLM-training-data extension surface (SURVEY.md §7.1.8): all
pure Column expressions (regex + array HOFs) so the hot path stays inside
whole-stage codegen — at 100 TB a row-at-a-time Python tokenizer would be
the bottleneck; these are JVM-vectorized and shuffle-free.

Regex patterns are restricted to the dialect intersection of Java regex
(Spark) and RE2 (DuckDB oracle) — explicit character classes, ``\\b``,
``\\s`` — so the oracle mirrors them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish token pattern: letter runs, digit runs, single punctuation.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Marker stopwords per language for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in|that|it|for|with)\b",
    "es": r"\b(el|la|los|las|de|que|y|en|un|una|es|por)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|zu|mit|von)\b",
    "fr": r"\b(le|la|les|des|et|est|une|dans|pour|que|qui)\b",
}

#: English stopwords for the quality heuristic.
STOPWORD_PATTERN = r"\b(the|a|an|and|or|of|to|in|is|it|on|for)\b"


def _text(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokens of lowercased, trimmed text (empty → empty array)."""
    t = F.trim(F.lower(_text(col)))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_expr(col: Column | str) -> Column:
    """Whitespace token count (int)."""
    return F.size(tokens_expr(col)).cast("int")


def bpe_token_count_expr(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (letter runs / digit runs / punct)."""
    return F.regexp_count(_text(col), F.lit(BPE_TOKEN_PATTERN)).cast("int")


def punct_ratio_expr(col: Column | str) -> Column:
    """Non-alphanumeric, non-space chars / total chars (0.0 for empty)."""
    t = _text(col)
    n = F.length(t)
    punct = F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]"))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / n.cast("double")
    )


def stopword_hits_expr(col: Column | str, pattern: str = STOPWORD_PATTERN) -> Column:
    """Number of stopword occurrences in lowercased text."""
    return F.regexp_count(F.lower(_text(col)), F.lit(pattern)).cast("int")


def stopword_ratio_expr(col: Column | str) -> Column:
    """Stopword occurrences / whitespace tokens (0.0 when no tokens)."""
    ntok = token_count_expr(col)
    hits = stopword_hits_expr(col)
    return F.when(ntok == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / ntok.cast("double")
    )


def quality_score_expr(col: Column | str) -> Column:
    """Heuristic document-quality score in [0, 1].

    ``0.4·min(1, tokens/100) + 0.3·(1 − punct_ratio) + 0.3·min(1, 5·stop_ratio)``
    — length, cleanliness, and natural-language-ness terms, the standard
    cheap pre-filter shape for web-scale corpus curation.
    """
    length_term = F.least(F.lit(1.0), token_count_expr(col).cast("double") / F.lit(100.0))
    clean_term = F.lit(1.0) - punct_ratio_expr(col)
    stop_term = F.least(F.lit(1.0), stopword_ratio_expr(col) * F.lit(5.0))
    return (
        F.lit(0.4) * length_term + F.lit(0.3) * clean_term + F.lit(0.3) * stop_term
    )


def lang_scores_expr(col: Column | str) -> dict[str, Column]:
    """Per-language marker-stopword hit counts."""
    lowered = F.lower(_text(col))
    return {
        lang: F.regexp_count(lowered, F.lit(pat)).cast("int")
        for lang, pat in LANG_MARKERS.items()
    }


def lang_id_expr(col: Column | str, default: str = "und") -> Column:
    """Argmax language by marker hits; first-listed language wins ties;
    ``default`` when no marker matches at all."""
    scores = lang_scores_expr(col)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    chain = None
    for lang in langs:
        cond = (scores[lang] == best) & (best > 0)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(F.lit(default))


def fingerprint_expr(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text — the exact-dedup key (hash-groupBy dedup family)."""
    normalized = F.regexp_replace(F.trim(F.lower(_text(col))), r"\s+", " ")
    return F.md5(normalized)


def shingles_from_tokens_expr(tokens_col: Column | str, n: int = 3) -> Column:
    """Distinct word ``n``-shingles from a **materialized** token-array
    column (array<string>).

    Built with ``transform(sequence(...), i -> concat_ws(' ',
    slice(tokens, i, n)))`` — per-row, codegen-friendly, no explode until
    the caller needs long format.

    Take the tokens from a named column, not an inline ``tokens_expr``:
    subexpressions captured inside a HOF lambda are re-evaluated per
    element, so an inlined regex split runs once per *shingle* instead of
    once per document (~10× on real documents). :func:`shingles_expr`
    exists for convenience at small scale.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    count = F.size(toks) - F.lit(n - 1)
    shingles = F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return F.array_distinct(shingles)


def shingles_expr(col: Column | str, n: int = 3) -> Column:
    """Distinct word ``n``-shingles of raw text (array<string>).

    Convenience form that inlines the tokenizer — fine for one-off or
    small inputs; hot paths should materialize ``tokens_expr`` in a prior
    projection and use :func:`shingles_from_tokens_expr` (see its note on
    per-element lambda re-evaluation).
    """
    return shingles_from_tokens_expr(tokens_expr(col), n)
