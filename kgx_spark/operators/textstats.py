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


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document — the standard quality
    gates a web-corpus pipeline applies before training-data selection
    (duplicate-line fraction, duplicate-line character fraction, top-2-gram
    character fraction).

    → (id, n_lines, dup_line_frac_1000, dup_line_char_frac_1000, top_2gram,
    top_2gram_frac_1000). Fractions are floor(×1000) bigints for
    cross-engine exactness; documents with no non-empty lines report 0
    lines, and documents with <2 tokens have NULL top-2-gram columns.

    Scale shape: two independent (id, line) / (id, gram) explode+groupBy
    passes — shuffle keys are high-cardinality content keys, partial
    aggregation collapses repeats map-side; the top-gram argmax is a
    per-doc window over already-aggregated counts. No UDFs, no all-pairs.
    """
    idc = F.col(id_col)
    c = F.col(text_col)

    lines = df.select(
        idc,
        F.explode(
            F.filter(F.split(c, r"\n"), lambda line: F.trim(line) != "")
        ).alias("line"),
    )
    per_line = lines.groupBy(id_col, "line").agg(F.count("*").alias("cnt"))
    cnt, ln = F.col("cnt"), F.length("line")
    line_agg = per_line.groupBy(id_col).agg(
        F.sum("cnt").cast("bigint").alias("n_lines"),
        F.floor(F.sum(cnt - 1) * 1000 / F.sum(cnt)).cast("bigint").alias("dup_line_frac_1000"),
        F.floor(F.sum((cnt - 1) * ln) * 1000 / F.sum(cnt * ln))
        .cast("bigint").alias("dup_line_char_frac_1000"),
    )

    toks = tokens(F.lower(c))
    grams_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(idc, F.explode(grams_arr).alias("gram"))
    gcnt = grams.groupBy(id_col, "gram").agg(F.count("*").alias("gcnt"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("gcnt").desc(), F.col("gram").asc())
    top = (
        gcnt.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(idc, F.col("gram").alias("top_2gram"), F.col("gcnt").alias("_topcnt"))
    )

    base = df.select(idc, F.length(c).alias("_chars"))
    out = (
        base.join(line_agg, on=id_col, how="left")
        .join(top, on=id_col, how="left")
        .select(
            idc,
            F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce("dup_line_frac_1000", F.lit(0)).cast("bigint").alias("dup_line_frac_1000"),
            F.coalesce("dup_line_char_frac_1000", F.lit(0)).cast("bigint").alias("dup_line_char_frac_1000"),
            F.col("top_2gram"),
            F.floor(F.col("_topcnt") * F.length("top_2gram") * 1000 / F.col("_chars"))
            .cast("bigint").alias("top_2gram_frac_1000"),
        )
    )
    return out


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 10,
) -> DataFrame:
    """Cross-corpus line-level dedup (the CCNet/RefinedWeb boilerplate
    pass): any non-empty line occurring in ≥ ``min_docs`` DISTINCT
    documents is removed from every document; surviving lines keep their
    original order.

    → (id, text, n_removed). Documents reduced to nothing come back with
    ''; empty lines are never treated as boilerplate (they'd trivially
    cross any threshold).

    Scale shape: one (line) shuffle to build the frequent-line set (partial
    countDistinct collapses map-side), one anti-join (AQE broadcasts the
    frequent set — it is threshold-bounded), one (id) shuffle to
    reassemble. The line set shuffles hashes of SHORT strings, never full
    documents.
    """
    idc = F.col(id_col)
    c = F.col(text_col)
    lines = df.select(idc, F.posexplode(F.split(c, r"\n")).alias("pos", "line"))
    frequent = (
        lines.where(F.trim("line") != "")
        .groupBy("line")
        .agg(F.count_distinct(idc).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("line")
    )
    kept = lines.join(frequent, on="line", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("_text"),
        F.count("*").alias("_kept"),
    )
    orig = df.select(idc, F.size(F.split(c, r"\n")).alias("_orig"))
    return orig.join(rebuilt, on=id_col, how="left").select(
        idc,
        F.coalesce("_text", F.lit("")).alias(text_col),
        (F.col("_orig") - F.coalesce("_kept", F.lit(0))).cast("bigint").alias("n_removed"),
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over the sorted distinct lowercase word set
    (OpenRefine-style key-collision fingerprint) — stable under word reorder
    and duplication, the canonical cheap near-dup key."""
    normalized = F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(col)))), " ")
    return F.md5(normalized)
