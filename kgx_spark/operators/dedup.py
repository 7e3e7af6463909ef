"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators over a `documents(doc_id, text, ...)` table.
Everything is expressed as exploded-join + groupBy plans (shuffle on content
keys — hash/band/word — which are high-cardinality and therefore skew-free by
construction); no UDFs.

Scale notes (100 TB):
- exact dedup shuffles (hash → docs) once; the hash is md5 so partial
  aggregation collapses duplicates map-side;
- MinHash/LSH: per-doc signatures are one explode + groupBy(doc); band
  bucketing shuffles only (band_key, doc_id) pairs — tiny vs raw text;
  candidate verification joins only within buckets (the whole point of LSH);
- pairwise n-gram Jaccard is quadratic and only for candidate sets or small
  corpora — the LSH path is the scale path, Jaccard verifies candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgx_spark.operators.textstats import tokens


def cap_buckets(banded: DataFrame, keys: list[str], max_bucket_size: int) -> DataFrame:
    """Drop every bucket whose membership exceeds ``max_bucket_size``
    (left-semi against the small-bucket key set) — the shared degenerate-
    bucket hygiene for ALL banding paths (MinHash bands here, SimHash
    slices, and the embedding LSH tables in similarity.py, which imports
    this): a bucket shared by k members emits O(k²) pairs, and oversized
    buckets on skewed corpora are non-discriminative anyway."""
    small = (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") <= max_bucket_size)
        .select(*keys)
    )
    return banded.join(small, on=keys, how="left_semi")


def shingle_array(text_col: str, ngram: int = 1) -> Column:
    """The distinct n-gram shingle set as an IN-ARRAY column expression
    (default 1-gram words) — the shared kernel of word_set and the in-array
    MinHash below.

    n>1 builds word-level shingles JVM-side: a sliding concat over the token
    array via transform(sequence(...)) — no explode-then-window, no Python.
    """
    toks = tokens(F.lower(F.col(text_col)))
    if ngram <= 1:
        return F.array_distinct(toks)
    # guard: sequence(1, stop) DESCENDS when stop < 1 — short docs must
    # yield an empty shingle set, not [1, 0, ...]
    windowed = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (ngram - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, ngram)),
        )
    )
    return F.when(F.size(toks) >= ngram, windowed).otherwise(
        F.array().cast("array<string>")
    )


def word_set(df: DataFrame, id_col: str, text_col: str, ngram: int = 1) -> DataFrame:
    """(id, word) distinct — the exploded n-gram shingle set."""
    return df.select(F.col(id_col), F.explode(shingle_array(text_col, ngram)).alias("word"))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash → (content_hash, representative min id, n_docs).

    One groupBy(md5) — map-side combinable; representative choice (min id) is
    deterministic.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("representative"), F.count("*").alias("n_docs"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_hashes: int = 8,
    ngram: int = 1,
) -> DataFrame:
    """Per-doc MinHash signature: h_i = min over shingles of md5(i || '_' || w).

    md5-of-seeded-string is a cheap deterministic permutation surrogate whose
    lexicographic min is a valid min-hash; identical in any engine.
    → (id, h0..h{n-1})

    Formulation note (round-7 A/B, documented-rejected alternative): min
    over a var-length STRING is not hash-aggregatable, so this plans as
    Sort + SortAggregate. An in-array rewrite — array_min over a transform
    of the shingle set, zero exchanges — is result-identical but measured
    ~1.7× SLOWER at sf0.1/local[32]: CollapseProject substitutes the
    tokenize+distinct shingle expression into every one of the num_hashes
    signature expressions, so the narrow stage re-tokenized each document
    num_hashes times. The explode+groupBy form tokenizes once and its
    sort input is the already-distinct (id, word) stream.
    """
    ws = word_set(df, id_col, text_col, ngram)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}_"), F.col("word")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return ws.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = 10_000,
    ngram: int = 1,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: band signatures → bucket join →
    distinct (a < b) pairs. The shuffle unit is (band_key, id) — constant-size
    per doc regardless of document length.

    ``max_bucket_size`` drops buckets larger than the cap before the
    self-join (standard at-scale hygiene: a bucket shared by k docs emits
    k² pairs, and giant buckets on boilerplate-heavy corpora are
    non-discriminative anyway — exact-dedup upstream removes only
    byte-identical texts, so near-identical template pages share ALL band
    keys and would otherwise go quadratic). Defaults ON at 10_000, matching
    the embedding-LSH paths (similarity.py); pass ``None`` to opt out for
    exact banding on small corpora.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, ngram=ngram)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("_", *cols).alias("key"))
        )
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if max_bucket_size is not None:
        banded = cap_buckets(banded, ["band", "key"], max_bucket_size)
    a = banded.withColumnRenamed(id_col, "doc_a")
    b = banded.withColumnRenamed(id_col, "doc_b")
    return (
        a.join(b, on=["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    ngram: int = 1,
) -> DataFrame:
    """n-gram (word-set) Jaccard similarity pairs ≥ threshold.

    Without ``candidates`` this is the exact quadratic path (inverted-index
    self-join on shared words — still far better than a cross join because
    pairs sharing zero words never materialize). **The candidates-free mode
    is a CORRECTNESS ANCHOR only** (same convention as
    similarity.brute_force_topk): at corpus scale always pass ``candidates``
    (e.g. from lsh_candidate_pairs) so only candidate pairs are verified.
    Jaccard is returned ×1000 as bigint for cross-engine exactness.
    """
    ws = word_set(df, id_col, text_col, ngram)
    sizes = ws.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = ws.withColumnRenamed(id_col, "doc_a")
    b = ws.withColumnRenamed(id_col, "doc_b")
    if candidates is not None:
        # candidate-restricted path: NEVER materialize the word self-join —
        # fan each candidate pair out by doc_a's words, keep the ones doc_b
        # also has. Work is |candidates| × |words|, not |pairs-sharing-a-word|
        # (the round-1 bench finding: the semi-join AFTER the self-join still
        # paid the quadratic explode).
        inter = (
            candidates.join(a, on="doc_a")
            .join(b, on=["doc_b", "word"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        inter = (
            a.join(b, on="word")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sz", "sz_a"), on="doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sz", "sz_b"), on="doc_b")
        .withColumn(
            "jaccard_1000",
            F.floor(F.col("inter") * 1000 / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).cast("bigint"),
        )
        .where(F.col("jaccard_1000") >= int(threshold * 1000))
        .select("doc_a", "doc_b", "jaccard_1000")
    )
    return out


def cross_doc_ngram_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document cross-corpus n-gram overlap — the doc-level signal of
    the EXACT-SUBSTRING dedup family (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): the fraction of a document's
    distinct word n-grams that also occur in at least ``min_docs - 1``
    OTHER documents. High fractions flag near-verbatim cross-document
    copying that MinHash/SimHash banding can miss when the copied span is
    embedded in otherwise-distinct text.

    → (id, n_grams, n_shared, shared_frac_1000). Fractions floor(×1000);
    documents shorter than ``ngram`` words report 0 grams.

    Scale shape: one (gram) shuffle for the document-frequency count
    (map-side partial countDistinct), a semi-join of the per-doc shingle
    set against the shared-gram set, one (id) re-aggregation. The shuffle
    unit is a fixed-width shingle string, never document text; nothing is
    all-pairs.
    """
    grams = word_set(df, id_col, text_col, ngram=ngram)  # distinct per doc
    shared = (
        grams.groupBy("word")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("word")
    )
    totals = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    n_shared = (
        grams.join(shared, on="word", how="left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
    base = df.select(F.col(id_col))
    return (
        base.join(totals, on=id_col, how="left")
        .join(n_shared, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                F.floor(F.coalesce(F.col("n_shared"), F.lit(0)) * 1000 / F.col("n_grams")),
            ).otherwise(F.lit(0)).cast("bigint").alias("shared_frac_1000"),
        )
    )


def remove_shared_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    min_docs: int = 2,
    min_frac: float = 0.5,
    min_run_grams: int = 1,
) -> DataFrame:
    """Span-level exact-substring dedup — the REMOVAL operator of the Lee
    et al. pipeline ("Deduplicating Training Data Makes Language Models
    Better"): instead of dropping whole documents, drop the verbatim
    cross-document spans and keep the unique remainder.

    A document qualifies when its distinct-shingle overlap fraction
    (cross_doc_ngram_overlap's shared_frac_1000) reaches ``min_frac``.
    Within a qualifying document, every maximal RUN of consecutive shared
    shingle starts (shingles occurring in ≥ ``min_docs`` documents) of at
    least ``min_run_grams`` shingles is a span; all token positions the
    span's shingles cover are removed and the survivors are re-joined with
    single spaces (original whitespace is not preserved — standard for
    token-level pipelines). Non-qualifying documents pass through with
    their text untouched.

    → (id, text_clean, n_tokens_removed).

    Scale shape: shuffle keys are fixed-width shingle strings and
    (id, position) ints — never document text, never all-pairs. One gram
    document-frequency groupBy (map-side combinable), semi-joins on the
    shared-gram key, a per-document window for run grouping (document ids
    are maximally fine-grained), one (id) reassembly groupBy. Boilerplate
    corpora make a few gram keys hot; AQE skew handling splits those
    semi-join partitions, and the output of each is bounded by the input
    gram rows.
    """
    n = ngram
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), F.col(text_col), toks.alias("_toks"))

    # positional shingles, built narrow inside the token array; matching is
    # case-insensitive (lowered gram) like the rest of the shingle family,
    # while the rebuilt text keeps the original casing
    # (sequence(1, stop) DESCENDS when stop < 1 — guard short docs)
    windowed = F.transform(
        F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
        lambda i: F.lower(F.concat_ws(" ", F.slice(F.col("_toks"), i, n))),
    )
    gram_arr = F.when(F.size("_toks") >= n, windowed).otherwise(
        F.array().cast("array<string>")
    )
    grams = base.select(
        F.col(id_col), F.posexplode(gram_arr).alias("_p0", "gram")
    ).select(F.col(id_col), (F.col("_p0") + 1).alias("start"), "gram")

    shared = (
        grams.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("gram")
    )

    # gate on the DISTINCT-shingle overlap fraction (same statistic as
    # cross_doc_ngram_overlap, computed from the positional grams)
    dg = grams.select(id_col, "gram").distinct()
    stats = (
        dg.join(shared.withColumn("_hit", F.lit(1)), on="gram", how="left")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.count("_hit").alias("n_shared"))
    )
    gated = stats.where(
        (F.col("n_grams") > 0)
        & (F.floor(F.col("n_shared") * 1000 / F.col("n_grams")) >= int(min_frac * 1000))
    ).select(id_col)

    # shared shingle starts in qualifying docs → maximal consecutive runs
    from pyspark.sql import Window

    starts = (
        grams.join(shared, on="gram", how="left_semi")
        .join(gated, on=id_col, how="left_semi")
        .select(id_col, "start")
        .distinct()
    )
    w = Window.partitionBy(id_col).orderBy("start")
    runs = (
        starts.withColumn("_grp", F.col("start") - F.row_number().over(w))
        .groupBy(id_col, "_grp")
        .agg(F.min("start").alias("_s0"), F.max("start").alias("_s1"), F.count("*").alias("_c"))
        .where(F.col("_c") >= min_run_grams)
    )
    covered = runs.select(
        F.col(id_col), F.explode(F.sequence(F.col("_s0"), F.col("_s1") + (n - 1))).alias("pos")
    ).distinct()

    # surviving tokens, reassembled in order
    tok_pos = base.join(gated, on=id_col, how="left_semi").select(
        F.col(id_col), F.posexplode(F.col("_toks")).alias("_p0", "word")
    ).select(F.col(id_col), (F.col("_p0") + 1).alias("pos"), "word")
    survive = (
        tok_pos.join(covered, on=[id_col, "pos"], how="left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda x: x["word"],
                ),
                " ",
            ).alias("_clean"),
            F.count("*").alias("_kept"),
        )
    )

    is_gated = F.col("_g").isNotNull()
    return (
        base.join(gated.withColumn("_g", F.lit(1)), on=id_col, how="left")
        .join(survive, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.when(is_gated, F.coalesce(F.col("_clean"), F.lit(""))).otherwise(
                F.col(text_col)
            ).alias("text_clean"),
            F.when(is_gated, F.size("_toks") - F.coalesce(F.col("_kept"), F.lit(0)))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("n_tokens_removed"),
        )
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash fingerprint as a bit string.

    bit_i(word) = parity of the i-th hex char of md5(word); document bit i is
    the majority vote over its distinct words. Pure integer arithmetic —
    engine-portable and deterministic. → (id, simhash string of {bits} 0/1).
    """
    ws = word_set(df, id_col, text_col)
    h = F.md5(F.col("word"))
    votes = [
        F.sum(((F.ascii(F.substring(h, i + 1, 1)) % 2) * 2 - 1)).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = ws.groupBy(id_col).agg(*votes)
    bit_exprs = [F.when(F.col(f"v{i}") > 0, "1").otherwise("0") for i in range(bits)]
    return agg.select(F.col(id_col), F.concat(*bit_exprs).alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 2,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """SimHash near-duplicate pairs: (doc_a, doc_b, hamming) with
    hamming ≤ max_hamming.

    The pairing step (the reference point for SimHash dedup — signatures
    alone find nothing): signatures are cut into ``bands`` equal slices; by
    pigeonhole, two signatures within hamming distance < bands must agree
    EXACTLY on at least one slice, so candidates are same-slice pairs — a
    constant-size (band, slice) shuffle key per doc, never all-pairs.
    Verification counts differing bits across the full signature, JVM-side.
    Exact (no false negatives) whenever max_hamming < bands AND
    ``max_bucket_size=None`` — the default cap trades that guarantee for
    bounded work: pairs whose only shared slices sit in over-cap buckets
    are not emitted.

    ``max_bucket_size`` (default ON at 10_000, same convention as
    lsh_candidate_pairs): slices shared by more than the cap are dropped
    before the self-join — template-heavy web corpora put near-identical
    pages in the same slice buckets and would otherwise go quadratic.
    ``None`` opts out (restores the exact-pigeonhole guarantee). NB the
    slice keyspace is 2^(bits/bands): size ``bits`` so that keyspace ≫
    corpus/cap (e.g. 64-128 bits at web scale), otherwise ordinary buckets
    saturate the cap through key-space collision rather than duplicity.
    """
    width = bits // bands
    assert bands * width == bits, "bits must divide evenly into bands"
    sig = simhash(df, id_col, text_col, bits=bits)
    banded = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(*[F.substring("simhash", b * width + 1, width) for b in range(bands)])
        ).alias("band", "key"),
    )
    if max_bucket_size is not None:
        banded = cap_buckets(banded, ["band", "key"], max_bucket_size)
    a = banded.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("_sa"), "band", "key")
    b = banded.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("_sb"), "band", "key")
    hamming = F.aggregate(
        F.zip_with(F.split("_sa", ""), F.split("_sb", ""), lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, on=["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "_sa", "_sb")
        .distinct()
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def eval_ngram_hits(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    ngram: int = 13,
) -> DataFrame:
    """Benchmark decontamination signal: per-document count of distinct word
    n-grams that also occur in an evaluation/benchmark set (the GPT-3-style
    13-gram collision test — training docs that share long shingles with the
    eval set leak the benchmark into training).

    → (id, n_grams, n_hit_grams, contaminated). Matching is lowercase
    word-shingle equality, the same shingle kernel every dedup operator here
    uses (``word_set``); docs shorter than ``ngram`` words report 0 grams
    and are never contaminated.

    Scale shape: the eval set is benchmark-sized (10^3–10^6 grams) while the
    corpus is the 100 TB side, so the distinct eval-gram set is explicitly
    ``broadcast()`` — corpus shingles are probed map-side and NEVER shuffled
    on the gram key; the only shuffle is the (id) count re-aggregation,
    partial-aggregated map-side. The corpus side streams: one projection,
    one explode, no distinct-on-corpus-grams stage (per-doc dedup happens
    inside the shingle array before the explode).
    """
    grams = word_set(df, id_col, text_col, ngram=ngram)
    eval_grams = (
        word_set(
            eval_df.select(F.monotonically_increasing_id().alias("_eid"), F.col(eval_text_col)),
            "_eid",
            eval_text_col,
            ngram=ngram,
        )
        .select("word")
        .distinct()
    )
    hits = (
        grams.join(F.broadcast(eval_grams), on="word", how="left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    totals = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    return (
        df.select(F.col(id_col))
        .join(totals, on=id_col, how="left")
        .join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_hit_grams", F.lit(0)).cast("bigint").alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    ngram: int = 13,
) -> DataFrame:
    """Drop every document sharing at least one ``ngram``-word shingle with
    the eval set (see eval_ngram_hits). Returns the surviving rows of ``df``
    unchanged — an anti-join against the contaminated-id set."""
    contaminated = (
        eval_ngram_hits(df, eval_df, id_col, text_col, eval_text_col, ngram)
        .where(F.col("contaminated"))
        .select(id_col)
    )
    return df.join(contaminated, on=id_col, how="left_anti")
