"""Web-text pipeline tests: extraction byte-identity, triple P/R on a known
embedded fact set, entity linking, canonicalization, kill-resume."""

import os

import pyspark.sql.functions as F
import pytest

from kgx_spark.pipeline.extract import extract_text, extract_text_bytes
from kgx_spark.pipeline.kg_pipeline import run_kg_pipeline
from kgx_spark.pipeline.link import detect_mentions, link_mentions
from kgx_spark.pipeline.stages import read_metrics
from kgx_spark.pipeline.synth import synth_alias_dict, synth_pages
from kgx_spark.pipeline.triples import extract_triples

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, SF).cache()


def test_synth_pages_schema(pages):
    assert set(pages.columns) == {"url", "warc_ts", "html", "text", "lang"}
    assert pages.count() > 0
    assert dict(pages.dtypes)["html"] == "binary"


def test_extraction_strips_boilerplate(spark, pages):
    row = extract_text(pages).select("url", "extracted_text", "text").first()
    ext = row["extracted_text"]
    assert "var x=1" not in ext  # script dropped
    assert "color:red" not in ext  # style dropped
    assert "Home | About" not in ext  # nav dropped
    assert "Example Corp" not in ext  # footer dropped
    assert row["text"] in ext or ext.startswith(row["text"][:40])


def test_extraction_byte_identical_per_url(spark, pages):
    """North-rule invariant: extraction is a pure function of html bytes —
    two independent runs (and the local pure function) agree byte-for-byte."""
    a = extract_text(pages).select("url", F.col("extracted_text").alias("t1"))
    b = extract_text(pages.repartition(7)).select("url", F.col("extracted_text").alias("t2"))
    joined = a.join(b, "url")
    assert joined.where(F.col("t1") != F.col("t2")).count() == 0
    # pure-function reference check on a sample
    sample = pages.select("url", "html").limit(5).collect()
    got = {r["url"]: t for r, t in zip(sample, [extract_text_bytes(r["html"]) for r in sample])}
    spark_rows = {r["url"]: r["t1"] for r in a.join(
        pages.select("url").limit(5), "url", "left_semi").collect()}
    for url, t in got.items():
        assert spark_rows[url] == t


def test_extract_triples_matches_embedded_facts(spark, pages):
    """P/R vs the known embedded fact set must be 1.0 — the synthetic pages
    embed exactly the lineitem-derived sentences (plus same_as pairs)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    expected = li.select(
        F.concat(F.lit("P:"), "l_partkey").alias("subject"),
        F.when(F.col("l_linenumber") % 2 == 0, "biolink:related_to")
        .otherwise("biolink:interacts_with").alias("predicate"),
        F.concat(F.lit("S:"), "l_suppkey").alias("object"),
    ).distinct()
    got = (
        extract_triples(extract_text(pages))
        .where(F.col("predicate") != "biolink:same_as")
        .select("subject", "predicate", "object")
        .distinct()
    )
    missed = expected.exceptAll(got.join(expected, ["subject", "predicate", "object"], "left_semi"))
    spurious = got.exceptAll(got.join(expected, ["subject", "predicate", "object"], "left_semi"))
    assert missed.count() == 0  # recall = 1.0
    assert spurious.count() == 0  # precision = 1.0


def test_entity_linking(spark, pages):
    alias_dict = synth_alias_dict(spark, SF)
    extracted = extract_text(pages)
    mentions = detect_mentions(extracted)
    linked = link_mentions(mentions, alias_dict)
    assert linked.count() > 0
    # every linked curie resolves through the dictionary
    bad = linked.join(alias_dict.select(F.col("curie")), "curie", "left_anti")
    assert bad.count() == 0
    # argmax determinism: one candidate per (url, mention site) — re-run equal
    linked2 = link_mentions(detect_mentions(extracted), alias_dict)
    assert linked.exceptAll(linked2).count() == 0


def test_entity_linking_first_token_prune(spark, pages):
    """The first-token prune is result-identical: an n-gram whose first
    token starts no alias can never survive the dictionary equality join,
    so pruned linking output == unpruned linking output; pruned mentions
    are a subset with positions PRESERVED (mid-array holes must not shift
    pos); the pruned plan stays shuffle-free."""
    from kgx_spark.pipeline.link import alias_first_tokens

    alias_dict = synth_alias_dict(spark, SF)
    ft = alias_first_tokens(alias_dict)
    assert ft and all(" " not in t for t in ft)
    extracted = extract_text(pages)

    pruned = detect_mentions(extracted, first_tokens=ft)
    full = detect_mentions(extracted)
    # subset with identical (url, pos, mention, ngram_len)
    assert pruned.exceptAll(full).count() == 0
    # every surviving mention starts with a dictionary first token
    stray = pruned.where(
        ~F.element_at(F.split(F.col("mention"), " "), 1).isin(ft)
    )
    assert stray.count() == 0

    # n_pages must be passed explicitly under pruning: the fallback derives
    # it from the mentions frame, and pruning can drop whole pages from it
    n_pages = extracted.count()
    linked_pruned = link_mentions(pruned, alias_dict, n_pages=n_pages)
    linked_full = link_mentions(detect_mentions(extracted), alias_dict, n_pages=n_pages)
    assert linked_pruned.exceptAll(linked_full).count() == 0
    assert linked_full.exceptAll(linked_pruned).count() == 0
    # (shuffle-free-ness of the pruned plan is pinned in test_plans.py —
    # the synth-pages fixture itself contains a groupBy, so asserting on
    # this plan would test the fixture, not the stage)


def test_first_token_prune_threshold_guard(spark, pages):
    """Past MAX_INSET_FIRST_TOKENS the prune must switch from an in-plan
    InSet literal to a broadcast semi-join (round-5 VERDICT #4), with
    identical results on all three paths (list / semi-join / unpruned)."""
    from kgx_spark.pipeline.link import (
        alias_first_token_df,
        alias_first_tokens,
        first_token_prune,
    )

    alias_dict = synth_alias_dict(spark, SF)
    # dispatcher: small set → list form; tiny max_inset → DataFrame form
    kw_small = first_token_prune(alias_dict)
    assert "first_tokens" in kw_small and isinstance(kw_small["first_tokens"], list)
    kw_big = first_token_prune(alias_dict, max_inset=1)
    assert list(kw_big) == ["first_token_df"]

    extracted = extract_text(pages)
    n_pages = extracted.count()
    via_list = detect_mentions(extracted, first_tokens=alias_first_tokens(alias_dict))
    via_join = detect_mentions(extracted, first_token_df=alias_first_token_df(alias_dict))
    assert via_list.exceptAll(via_join).count() == 0
    assert via_join.exceptAll(via_list).count() == 0

    linked_join = link_mentions(via_join, alias_dict, n_pages=n_pages)
    linked_full = link_mentions(detect_mentions(extracted), alias_dict, n_pages=n_pages)
    assert linked_join.exceptAll(linked_full).count() == 0
    assert linked_full.exceptAll(linked_join).count() == 0

    with pytest.raises(ValueError):
        detect_mentions(extracted, first_tokens=["a"], first_token_df=alias_first_token_df(alias_dict))


def test_entity_linking_dense_dictionary_guard(spark, pages):
    """Dense-dictionary mode (hits ≈ mentions) must produce identical links
    while materializing only the idf AGGREGATE, never mention-scale hits
    (round-3 ADVICE #7): the default path's checkpoint snapshots hits (the
    final plan scans an RDD, no Generate/explode left); dense mode keeps the
    narrow explode lineage live and checkpoints just the per-alias df table."""
    alias_dict = synth_alias_dict(spark, SF)
    mentions = detect_mentions(extract_text(pages))
    default = link_mentions(mentions, alias_dict)
    dense = link_mentions(
        detect_mentions(extract_text(pages)), alias_dict, dense_dictionary=True
    )
    # identical output either way
    assert default.exceptAll(dense).count() == 0
    assert dense.exceptAll(default).count() == 0
    # default mode: hits checkpointed → the mention explode is snapshotted
    # out of the plan; dense mode: explode still in the live plan, and the
    # only checkpoint (RDD scan) is the idf aggregate
    default_plan = default._jdf.queryExecution().optimizedPlan().toString()
    dense_plan = dense._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in default_plan  # hits snapshot replaced the explode
    assert "Generate" in dense_plan  # narrow explode recomputes instead


def test_full_pipeline_and_resume(spark, pages, tmp_path):
    wd = str(tmp_path / "run1")
    ctx = run_kg_pipeline(spark, SF, wd, link_entities=False)
    edges = ctx["edges"]
    n_edges = edges.count()
    assert n_edges > 0
    # canonicalization re-pointed every Q:/R: endpoint to its P: leader
    qs = edges.where(F.col("subject").rlike("^[QR]:") | F.col("object").rlike("^[QR]:"))
    assert qs.count() == 0
    # same_as edges consumed by canonicalization
    assert edges.where(F.col("predicate") == "biolink:same_as").count() == 0
    # provenance survived the merge
    assert edges.where(F.size("provided_by") < 1).count() == 0

    metrics = read_metrics(wd)
    stages_run = [m["stage"] for m in metrics]
    assert stages_run == ["extract", "triples", "edges_raw", "canonical", "edges", "nodes"]
    assert all(m["lineage"] for m in metrics if m["rows"] > 0)

    # kill-resume: delete the LAST stage's marker → only that stage re-runs,
    # and its stale metrics row is scrubbed (ONE row per stage, no
    # double-count — round-2 next-round #8)
    committed_before = {m["stage"]: m["committed_at"] for m in metrics}
    os.remove(os.path.join(wd, "nodes._COMMITTED"))
    ctx2 = run_kg_pipeline(spark, SF, wd, link_entities=False)
    metrics2 = read_metrics(wd)
    assert [m["stage"] for m in metrics2] == stages_run  # exactly one row each
    # the five committed stages were LOADED, not recomputed: their rows are
    # byte-identical; only `nodes` was re-executed
    for m in metrics2:
        if m["stage"] != "nodes":
            assert m["committed_at"] == committed_before[m["stage"]]
    assert ctx2["edges"].count() == n_edges


def test_kill_mid_write_recomputes_cleanly(spark, pages, tmp_path):
    """Round-2 next-round #8: a run killed MID-WRITE leaves the stage dir
    with partial files, possibly a metrics row, and NO marker. The re-run
    must recompute that stage from scratch (not trust the partial data) and
    must not duplicate its metrics row."""
    wd = str(tmp_path / "w")
    ctx = run_kg_pipeline(spark, SF, wd, link_entities=False)
    n_edges = ctx["edges"].count()
    stages_run = [m["stage"] for m in read_metrics(wd)]

    # simulate the kill: marker gone, stage dir present but corrupted with a
    # partial file (the metrics row from the killed run is still there)
    stage_dir = os.path.join(wd, "canonical.parquet")
    os.remove(os.path.join(wd, "canonical._COMMITTED"))
    for f in os.listdir(stage_dir):
        if f.startswith("part-"):
            os.remove(os.path.join(stage_dir, f))
            break
    with open(os.path.join(stage_dir, "part-99999-killed.parquet"), "wb") as fh:
        fh.write(b"\x00partial garbage, not a parquet footer")
    # downstream markers gone too — a real resume re-runs everything after
    # the killed stage (their inputs changed)
    for s in ("edges", "nodes"):
        os.remove(os.path.join(wd, f"{s}._COMMITTED"))

    ctx2 = run_kg_pipeline(spark, SF, wd, link_entities=False)
    metrics2 = read_metrics(wd)
    # exactly one metrics row per stage — the killed rows were scrubbed
    assert [m["stage"] for m in metrics2] == stages_run
    assert ctx2["edges"].count() == n_edges
    # the garbage partial file is gone (overwrite replaced the dir content)
    assert not os.path.exists(os.path.join(stage_dir, "part-99999-killed.parquet"))
