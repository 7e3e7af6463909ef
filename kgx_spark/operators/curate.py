"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, as one operator.

quality gate → exact dedup (content hash) → MinHash-LSH near-dup candidates
→ Jaccard verification → connected components over the near-dup graph →
keep one representative (min doc id) per duplicate cluster.

Every stage is an existing oracle-gated operator (textstats.quality_features,
dedup.exact_duplicates/lsh_candidate_pairs/jaccard_pairs,
clique.connected_components — the SAME hash-min CC that canonicalizes the
knowledge graph, reused on the document near-dup graph). Scale shape:
nothing here is all-pairs — LSH candidates are bucket-joined, verification
is candidate-restricted, CC shuffles (id, label) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx_spark.operators.clique import connected_components
from kgx_spark.operators.dedup import exact_duplicates, jaccard_pairs, lsh_candidate_pairs
from kgx_spark.operators.textstats import quality_features


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    jaccard_threshold: float = 0.9,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """→ kept documents: (doc_id, n_tokens, cluster, cluster_size).

    - quality gate: at least ``min_tokens`` whitespace tokens;
    - exact dedup: one representative (min id) per identical text;
    - near-dup dedup: Jaccard ≥ threshold pairs (via LSH candidates) are
      clustered transitively; the min doc id of each cluster is kept.
      ``cluster`` is that representative id, ``cluster_size`` counts the
      quality-passing exact-representatives it absorbed (1 = unique doc).

    ``max_bucket_size`` defaults ON (10_000, inherited by the LSH stage —
    see lsh_candidate_pairs): degenerate template-heavy buckets are dropped
    before the candidate self-join. ``None`` opts out (exact banding).
    """
    q = quality_features(docs, text_col=text_col).select(
        F.col(id_col), F.col("n_tokens")
    ).where(F.col("n_tokens") >= min_tokens)
    passing = docs.join(q, on=id_col, how="left_semi")

    # exact dedup among quality-passing docs
    reps = exact_duplicates(passing, id_col, text_col).select(
        F.col("representative").alias(id_col)
    )
    uniq = passing.join(reps, on=id_col, how="left_semi")

    # near-dup clusters among exact-representatives
    cands = lsh_candidate_pairs(uniq, id_col, text_col, num_hashes=num_hashes,
                                bands=bands, max_bucket_size=max_bucket_size)
    near = jaccard_pairs(uniq, id_col, text_col, threshold=jaccard_threshold,
                         candidates=cands)
    pairs = near.select(
        F.col("doc_a").cast("string").alias("src"), F.col("doc_b").cast("string").alias("dst")
    )
    labels, _ = connected_components(pairs)

    lab = labels.select(F.col("id").alias("_lid"), F.col("component").alias("_comp"))
    clustered = (
        uniq.select(F.col(id_col))
        .join(lab, F.col(id_col).cast("string") == F.col("_lid"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_comp"), F.col(id_col).cast("string")).alias("_cluster"),
        )
    )
    # cluster label = the representative (numeric min member) — NOT the CC
    # component string, whose lexicographic min ("43" < "5") is an internal
    # detail of the string-keyed CC
    kept = (
        clustered.groupBy("_cluster")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("cluster_size"))
        .select(id_col, "cluster_size")
    )
    return kept.join(q, on=id_col).select(
        id_col, "n_tokens", F.col(id_col).cast("string").alias("cluster"), "cluster_size"
    )
