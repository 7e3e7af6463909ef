"""Physical-plan quality gates — lock in the optimizations the engine relies
on (SURVEY.md §4): broadcast semi-joins, map-side partial aggregation,
parquet filter pushdown + column pruning. A regression here silently turns
a 100 TB job from hours into days, so it's tested like correctness."""

import pyspark.sql.functions as F
import pytest

from kgx_spark import fixtures as FX
from kgx_spark.operators.filters import apply_edge_filters
from kgx_spark.operators.merge import merge_edges

SF = "/root/testdata/sf0.001"


def plan_of(df, mode="simple"):
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_category_semijoin_broadcasts(spark):
    nodes = FX.nodes_a(spark, SF).unionByName(FX.supplier_nodes(spark, SF), allowMissingColumns=True)
    out = apply_edge_filters(
        FX.edges(spark, SF),
        {"subject_category": {"biolink:Gene"}, "object_category": {"biolink:ChemicalEntity"}},
        nodes=nodes,
    )
    p = plan_of(out)
    assert p.count("LeftSemi") == 2
    assert "BroadcastHashJoin" in p  # the passing-node id set broadcasts


def test_merge_partial_aggregation(spark):
    p = plan_of(merge_edges([FX.edges(spark, SF)]))
    # ONE exchange on the grouping key, with map-side partial aggregation
    assert "partial_" in p
    assert p.count("Exchange hashpartitioning(subject") == 1


def test_parquet_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.where(F.col("l_partkey") == 42).select("l_partkey", "l_suppkey")
    p = plan_of(q, "formatted")
    assert "PushedFilters: [IsNotNull(l_partkey), EqualTo(l_partkey,42)]" in p
    # column pruning: scan reads exactly the two projected columns
    assert "ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>" in p


def test_entity_link_dictionary_broadcasts(spark):
    from kgx_spark.pipeline.extract import extract_text
    from kgx_spark.pipeline.link import detect_mentions, link_mentions
    from kgx_spark.pipeline.synth import synth_alias_dict, synth_pages

    pages = extract_text(synth_pages(spark, SF))
    linked = link_mentions(detect_mentions(pages, max_ngram=2), synth_alias_dict(spark, SF), idf_weighting=False)
    assert "BroadcastHashJoin" in plan_of(linked)


def test_whole_stage_codegen_covers_hot_path(spark):
    # the triple-extraction projection must live inside WholeStageCodegen
    from kgx_spark.pipeline.triples import extract_triples

    pages = spark.createDataFrame(
        [("u1", "A:1 is related to B:2.")], "url string, extracted_text string"
    )
    p = plan_of(extract_triples(pages), "formatted")
    assert "codegen id" in p  # Generate + Project fused into WholeStageCodegen
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p  # no Python in this path
