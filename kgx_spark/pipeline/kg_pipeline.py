"""The end-to-end KG-construction pipeline (north rule, BASELINE.json).

pages → extract_text → extract_triples + link_mentions → canonicalize
(hash-min CC over same_as) → merge/dedup (provenance union) → materialize
KGX-shaped nodes/edges into salted, skew-aware partitions.

Each stage is a Stage (stages.py) so a killed run resumes from the last
committed snapshot; `run_kg_pipeline` is the one-call entry used by
__spark_entry__.entry, bench.py, and spark-submit (see scripts/run_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx_spark.functions.keys import generate_edge_identifiers
from kgx_spark.operators.clique import clique_merge
from kgx_spark.operators.merge import merge_edges, merge_nodes
from kgx_spark.operators.validate import validate_edges, validate_nodes
from kgx_spark.pipeline.extract import extract_text
from kgx_spark.pipeline.link import (
    detect_mentions,
    first_token_prune,
    link_mentions,
    linked_mention_edges,
)
from kgx_spark.pipeline.stages import Stage, run_stages
from kgx_spark.pipeline.synth import synth_alias_dict, synth_pages
from kgx_spark.pipeline.triples import extract_triples

# canonical prefix priority for leader election (P wins over Q over R, the
# synthetic equivalence universe; real deployments pass biolink's
# prefix-priority map — clique_merge.py:716-751)
PREFIX_PRIORITY = ["P", "Q", "R", "S"]


def build_stages(
    sf_dir: str,
    pages_df: DataFrame | None = None,
    link_entities: bool = True,
    out_partitions: int = 32,
) -> list[Stage]:
    def s_extract(spark: SparkSession, ctx: dict) -> DataFrame:
        # pages is the pipeline INPUT (an existing Iceberg table in
        # production) — never snapshotted by us: re-writing terabytes of html
        # would double the job's IO. (Measured locally: persisting the
        # html-bearing pages table caused tens of seconds of writeback stalls
        # bleeding into later stages.) The first OUTPUT snapshot is the
        # extracted text, orders of magnitude smaller than the html.
        pages = pages_df if pages_df is not None else synth_pages(spark, sf_dir)
        # Few-large-files inputs (single-split parquet at test scale)
        # under-parallelize the CPU-bound extract/triples path — re-spread to
        # ~2× cores; the extract snapshot then preserves this layout.
        target = max(2 * spark.sparkContext.defaultParallelism, 8)
        pages = pages.repartition(target, "url")
        return extract_text(pages).select("url", "warc_ts", "extracted_text", "lang")

    def s_triples(spark: SparkSession, ctx: dict) -> DataFrame:
        return extract_triples(ctx["extract"])

    def s_linked(spark: SparkSession, ctx: dict) -> DataFrame:
        alias_dict = synth_alias_dict(spark, sf_dir)
        # page count from the (snapshotted/cached, html-free) extract table —
        # NOT derived inside link_mentions, which would execute the n-gram
        # explode twice (once for the count, once for the linking plan).
        n_pages = ctx["extract"].count()
        # first-token prune: result-identical (an n-gram whose first token
        # starts no alias can't survive the dictionary join) and cuts the
        # exploded mention volume by the corpus's non-entity token fraction
        # (measured 27.2→15.2 s min at sf0.1/local[32], identical rows).
        # first_token_prune() auto-selects the in-array InSet probe for
        # plan-embeddable token sets and a broadcast semi-join past
        # MAX_INSET_FIRST_TOKENS, so a huge alias dictionary can't bloat
        # the plan or the driver.
        mentions = detect_mentions(ctx["extract"], **first_token_prune(alias_dict))
        return link_mentions(mentions, alias_dict, n_pages=n_pages)

    def s_edges_raw(spark: SparkSession, ctx: dict) -> DataFrame:
        triples = ctx["triples"]
        if link_entities and "linked" in ctx:
            mention_edges = linked_mention_edges(ctx["linked"])
            triples = triples.unionByName(mention_edges)
        valid, _ = validate_edges(triples)
        return valid

    def s_canonical(spark: SparkSession, ctx: dict) -> DataFrame:
        edges = ctx["edges_raw"]
        # one scan + explode instead of a subject∪object double scan of the
        # snapshot (same rows; halves the endpoint-collection read)
        node_ids = (
            edges.select(F.explode(F.array("subject", "object")).alias("id"))
            .distinct()
            .withColumn("category", F.array(F.lit("biolink:NamedThing")))
        )
        # dedupe_edges=False: the next stage runs merge_edges anyway — one
        # (s,p,o) shuffle for the whole pipeline, not two.
        # audit_categories=False: the category column IS the constant literal
        # synthesized four lines up, so no clique conflict is possible — the
        # audit's vocabulary pre-screen would re-execute the edges-snapshot
        # lineage once per call for a known answer (round-6 VERDICT #1).
        _, canon_edges, _ = clique_merge(
            node_ids, edges, prefix_priority=PREFIX_PRIORITY, dedupe_edges=False,
            audit_categories=False,
        )
        return canon_edges

    def s_edges(spark: SparkSession, ctx: dict) -> DataFrame:
        merged = merge_edges([ctx["canonical"].drop("_original_subject", "_original_object")])
        merged = generate_edge_identifiers(merged)
        # NO post-merge re-shuffle: the merge groupBy already leaves the data
        # hash(s,p,o)-partitioned, which spreads a hub SUBJECT across
        # partitions by (predicate, object) variation — strictly more
        # skew-proof than re-concentrating it into salt_buckets files, and
        # one full-data exchange cheaper (measured: the second exchange was
        # the anti-scaling term in the materialize stage on the local box).
        # salted_repartition (stages.py) remains the tool for PRE-aggregation
        # materializations where one key genuinely owns many rows.
        # Within-partition sort by subject keeps parquet RLE/dictionary
        # compression and row-group skipping effective for subject lookups.
        return merged.sortWithinPartitions("subject")

    def s_nodes(spark: SparkSession, ctx: dict) -> DataFrame:
        edges = ctx["edges"]
        # one scan + explode instead of a subject∪object double scan (the
        # provided_by payload column is read once, not twice)
        ids = edges.select(
            F.explode(F.array("subject", "object")).alias("id"), F.col("provided_by")
        )
        nodes = ids.withColumn("category", F.array(F.lit("biolink:NamedThing")))
        merged = merge_nodes([nodes])
        valid, _ = validate_nodes(merged)
        # post-merge rows are unique per id — hash(id) layout is already
        # uniform; salting would only add an exchange (see s_edges note)
        return valid.sortWithinPartitions("id")

    stages = [
        Stage("extract", s_extract),
        Stage("triples", s_triples),
    ]
    if link_entities:
        stages.append(Stage("linked", s_linked))
    stages += [
        Stage("edges_raw", s_edges_raw),
        Stage("canonical", s_canonical),
        Stage("edges", s_edges),
        Stage("nodes", s_nodes),
    ]
    return stages


def run_kg_pipeline_fused(
    spark: SparkSession,
    sf_dir: str,
    outdir: str,
    pages_df: DataFrame | None = None,
    link_entities: bool = True,
) -> dict[str, DataFrame]:
    """One fused DAG: no intermediate snapshots, only the final nodes/edges
    write. Trades kill-resume durability for zero checkpoint IO — the mode a
    cluster uses for short jobs, and the measurement mode that isolates the
    ENGINE's scaling from the per-stage commit floor (see BASELINE.md).

    extract/edges_raw are cached: the canonicalization stage consumes
    edges_raw twice (CC pair collection + re-pointing), and without a
    snapshot that would recompute the extraction lineage.
    """
    stages = build_stages(sf_dir, pages_df=pages_df, link_entities=link_entities)
    ctx: dict[str, DataFrame] = {}
    for st in stages:
        df = st.fn(spark, ctx)
        if st.name in ("extract", "edges_raw"):
            df = df.cache()
        ctx[st.name] = df
    ctx["edges"].write.mode("overwrite").parquet(f"{outdir}/edges.parquet")
    ctx["nodes"].write.mode("overwrite").parquet(f"{outdir}/nodes.parquet")
    ctx["edges"] = spark.read.parquet(f"{outdir}/edges.parquet")
    ctx["nodes"] = spark.read.parquet(f"{outdir}/nodes.parquet")
    return ctx


def run_kg_pipeline(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    pages_df: DataFrame | None = None,
    link_entities: bool = True,
    force: bool = False,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns all stage outputs."""
    stages = build_stages(sf_dir, pages_df=pages_df, link_entities=link_entities)
    return run_stages(spark, workdir, stages, force=force)
