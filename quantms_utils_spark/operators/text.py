"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

Everything is built from built-in string/regex expressions — no Python on the
hot path — so a 100 TB corpus profile is a single codegen'd scan + one
aggregate if summarized.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from quantms_utils_spark.functions.core import let_once as _let

# Marker-word inventories for the n-gram/stopword language heuristic. Order is
# the deterministic tie-break priority.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|is|of|and)\b",
    "es": r"\b(el|la|de|que|los)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|de|et|les)\b",
}

STOPWORD_PATTERN = r"\b(the|a|of|and|is|to|in)\b"
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def marker_score(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), 0)).cast("long")


def lang_id(col: Column) -> Column:
    """Predicted language by marker-word count, ties broken by LANG_MARKERS
    order, 'und' when nothing matches."""
    scores = {lang: marker_score(col, pat) for lang, pat in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    expr = F.lit("und")
    # Build the when-chain in reverse priority so earlier langs win ties.
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def ws_token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: runs of letters, runs of digits, single other
    non-space chars."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_PATTERN), 0)).cast(
        "long"
    )


def quality_metrics(col: Column) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, alpha/punct/stopword
    ratios, and a boolean keep-flag of the usual pretraining heuristics."""
    n_chars = F.length(col).cast("long")
    n_tokens = ws_token_count(col)
    alpha_chars = F.length(F.regexp_replace(col, r"[^a-zA-Z]", "")).cast("long")
    punct_chars = F.length(F.regexp_replace(col, r"[^.,;:!?]", "")).cast("long")
    stop_tokens = F.size(
        F.regexp_extract_all(F.lower(col), F.lit(STOPWORD_PATTERN), 0)
    ).cast("long")
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    mean_token_len = F.round(alpha_chars.cast("double") / safe_tokens, 4)
    stop_ratio = F.round(stop_tokens.cast("double") / safe_tokens, 4)
    punct_ratio = F.round(
        punct_chars.cast("double") / F.greatest(n_chars, F.lit(1)), 4
    )
    keep = (
        (n_tokens >= 5)
        & (mean_token_len >= 2)
        & (mean_token_len <= 12)
        & (punct_ratio <= 0.2)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_token_len,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "keep": keep,
    }


def content_fingerprint(col: Column) -> Column:
    """md5 fingerprint of whitespace-normalized lowercase content — the exact
    dedup key."""
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized)


WINNOW_K = 5  # k-gram length (characters)
WINNOW_W = 4  # window: guarantee-threshold t = w + k - 1 = 8 chars


def winnow_fingerprints(col: Column, k: int = WINNOW_K, w: int = WINNOW_W) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): rolling hash over character k-grams, minimum per sliding
    window of ``w`` hashes, distinct minima = the document's fingerprint set.
    Any shared substring of length ≥ w + k - 1 between two documents is
    guaranteed to share a fingerprint — position-robust near-dup evidence,
    unlike a whole-content hash.

    Pure Catalyst: ``sequence`` positions → ``substring`` k-grams → md5-window
    32-bit hashes → ``slice``/``array_min`` window minima → ``array_distinct``.
    The normalized string and the hash array are each let-bound (see
    :func:`_let`) so they are computed once per row — without the binding the
    nested ``transform`` re-evaluates the full hash array per window position,
    O(n²) md5/regex per document. The hash is md5-derived (not xxhash) so any
    engine with md5/substr reproduces the values — a DuckDB oracle checks the
    whole pipeline. Returns ``array<long>`` (empty for texts shorter than
    k + w - 1 characters).
    """

    def _mins(s: Column) -> Column:
        n = F.length(s)
        grams_idx = F.sequence(F.lit(1), n - F.lit(k - 1))
        hashes = F.transform(
            grams_idx,
            lambda i: F.conv(
                F.substr(F.md5(F.substring(s, i, F.lit(k))), F.lit(1), F.lit(8)),
                16,
                10,
            ).cast("long"),
        )
        return F.when(
            n >= k + w - 1,
            _let(
                hashes,
                lambda h: F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(h) - F.lit(w - 1)),
                        lambda j: F.array_min(F.slice(h, j, w)),
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<long>"))

    return _let(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), _mins)
