"""Text-analysis operators for large-scale training-data pipelines.

Not in the reference (which processes structured KG records); these are the
document-side operators a 100 TB web-corpus KG-construction pipeline needs
before triple extraction: language-ID, quality scoring, token counting,
fingerprinting. All pure column expressions — JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID heuristic.
# Deliberately tiny + deterministic (broadcast as literals into codegen).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "a", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "une"],
    "es": ["el", "los", "las", "y", "que", "es", "una"],
}

TOKEN_REGEX = r"[A-Za-z0-9]+(?:'[a-z]+)?|[^\sA-Za-z0-9]"  # BPE-ish word/punct split


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string> (empty tokens dropped)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def regex_token_count(col: Column) -> Column:
    """BPE-ish token count: words + punctuation as separate tokens."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0)))


def marker_score(col: Column, markers: list[str]) -> Column:
    """Count of marker-word occurrences (token-exact, not substring)."""
    toks = tokens(F.lower(col))
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def detect_language(col: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Stopword-marker language ID.

    Chinese is detected by CJK codepoint presence; otherwise the language with
    the highest marker count wins (ties broken by language code order, so the
    result is deterministic). Documents matching nothing → 'und'.
    """
    m = markers or LANG_MARKERS
    cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", "")) > 0
    scores = [(lang, marker_score(col, words)) for lang, words in sorted(m.items())]
    best_score = F.greatest(*[s for _, s in scores]) if len(scores) > 1 else scores[0][1]
    expr = F.when(cjk, F.lit("zh"))
    for lang, s in scores:  # first (alphabetical) max wins — deterministic
        expr = expr.when((s == best_score) & (best_score > 0), F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features (length / punctuation / stopword ratios).

    Integer-valued features plus ratios scaled to int (×1000) so results are
    exactly reproducible across engines.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    n_punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    n_stop = marker_score(c, LANG_MARKERS["en"])
    # floor() (not cast) so truncation semantics are identical across engines
    mean_wl1000 = F.when(n_tokens > 0, F.floor((n_chars - n_tokens + 1) * 1000 / n_tokens)).otherwise(F.lit(0))
    return df.withColumns(
        {
            "n_tokens": n_tokens.cast("bigint"),
            "n_chars_computed": n_chars.cast("bigint"),
            "n_punct": n_punct.cast("bigint"),
            "stopword_ratio_1000": F.when(n_tokens > 0, F.floor(n_stop * 1000 / n_tokens)).otherwise(F.lit(0)).cast("bigint"),
            "mean_word_len_1000": mean_wl1000.cast("bigint"),
        }
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over the sorted distinct lowercase word set
    (OpenRefine-style key-collision fingerprint) — stable under word reorder
    and duplication, the canonical cheap near-dup key."""
    normalized = F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(col)))), " ")
    return F.md5(normalized)
