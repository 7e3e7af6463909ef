"""Deterministic corpus sampling for training-data pipelines.

Not in the reference (no corpus layer); these are the standard
corpus-management primitives: reproducible subsampling for ablations and
per-stratum (language / source / quality-bucket) rate control for data
mixing. `df.sample()` is seed-dependent per partition layout and therefore
NOT reproducible across cluster sizes — these operators key the decision on
a HASH of a stable column, so the same document is kept or dropped
regardless of partitioning, executor count, or engine (the md5-based
selector is replayed exactly by the DuckDB oracle).

Scale shape: pure narrow filters over the scan — no shuffle, no sort, no
RNG state; the sampling predicate pushes into the scan's filter stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, salt: str = "", buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of
    (salt || key) as an integer, mod buckets. md5 (not xxhash64) so any
    engine reproduces the assignment bit-for-bit."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate_permille: int,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose hash bucket < ``rate_permille`` (‰ of the corpus in
    expectation). Same key + same salt → same decision everywhere; change
    ``salt`` to draw an independent sample."""
    return df.where(hash_bucket(F.col(key_col), salt) < rate_permille)


def assign_pack_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 2048,
    stratum_col: str | None = None,
    order_col: str | None = None,
    token_count_col: str | None = None,
    default_buckets: int = 4096,
) -> DataFrame:
    """Deterministic sequence packing: assign each document to a
    fixed-token-budget training pack by CUMULATIVE OFFSET within its
    stratum — pack_id = floor(offset / budget) where offset is the running
    token count of all earlier documents (ordered by ``order_col``,
    default the id). A document belongs to the pack its span STARTS in and
    may overflow the boundary by its own length (the standard
    greedy-by-offset packing — the tokenizer chunks at sequence build
    time; strict no-straddle packing is inherently sequential state).

    ``token_count_col`` plugs in a precomputed token count (e.g.
    textstats.regex_token_count for BPE-ish budgets) instead of the default
    whitespace count — pack budgets then reflect the training tokenizer
    without re-tokenizing here.

    → original columns + (n_tokens, pack_id, offset_tokens); with the
    default stratum, also ``_pack_stratum`` (the hash bucket packs are
    scoped to — materialize_packs groups on it automatically).

    Scale shape: one shuffle+sort per stratum (the window). With
    ``stratum_col=None`` documents are packed within
    hash_bucket(id, ``default_buckets``) strata, so NO single-partition
    global sort can exist at any corpus size; pass an explicit
    fine-grained ``stratum_col`` (e.g. lang × source × hash-bucket) when
    packs must not mix strata. Either way the assignment is reproducible
    at any parallelism.
    """
    from pyspark.sql import Window

    order = order_col or id_col
    if token_count_col is not None:
        n_tokens = F.col(token_count_col)
    else:
        n_tokens = F.size(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""))
    out = df.withColumn("n_tokens", n_tokens.cast("bigint"))
    if stratum_col is None:
        # never a global window: bucket by id hash so the sort is
        # per-bucket (~|corpus|/default_buckets rows) at any scale
        out = out.withColumn(
            "_pack_stratum", hash_bucket(F.col(id_col), salt="pack", buckets=default_buckets)
        )
        w = Window.partitionBy("_pack_stratum").orderBy(order)
    else:
        w = Window.partitionBy(stratum_col).orderBy(order)
    cum = F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offset = (cum - F.col("n_tokens")).cast("bigint")
    return (
        out.withColumn("pack_id", F.floor(offset / budget_tokens).cast("bigint"))
        .withColumn("offset_tokens", (offset % budget_tokens).cast("bigint"))
    )


def materialize_packs(
    packed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str | None = None,
    order_col: str | None = None,
    separator: str = "\n\n",
) -> DataFrame:
    """Assemble assign_pack_ids output into one training-sequence row per
    pack: documents concatenated in pack order with ``separator`` between
    them, plus doc/token counts.

    → (``stratum?``, pack_id, text, n_docs, n_tokens).

    Scale shape: one groupBy on (stratum, pack_id) — the pack key is
    fine-grained by construction (≈ budget tokens of text per group), so
    the sort_array per group touches a handful of rows and no group can be
    hot. Deterministic: order inside a pack follows ``order_col`` (the
    same order assign_pack_ids packed by). With ``stratum_col=None`` the
    ``_pack_stratum`` bucket column assign_pack_ids added is used as the
    stratum key — pack_id alone is only unique within its stratum.
    """
    order = order_col or id_col
    stratum = stratum_col
    if stratum is None and "_pack_stratum" in packed.columns:
        stratum = "_pack_stratum"
    keys = ([stratum] if stratum else []) + ["pack_id"]
    return packed.groupBy(*keys).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(order).alias("o"), F.col(text_col).alias("t")))),
                lambda x: x["t"],
            ),
            separator,
        ).alias(text_col),
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling — the data-mixing primitive (e.g. keep 80%
    of 'en', 250‰ of 'de', drop everything unlisted). Rates are a literal
    map compiled into one codegen'd predicate; no join, no shuffle."""
    rate = F.lit(default_permille)
    for value, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(permille)).otherwise(rate)
    return df.where(hash_bucket(F.col(key_col), salt) < rate)
