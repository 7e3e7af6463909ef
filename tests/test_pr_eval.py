"""North-rule P/R gate: the full pipeline's canonical triples vs ground truth."""

from kgx_spark.pipeline.eval import expected_triples_for_synth, triple_pr
from kgx_spark.pipeline.kg_pipeline import run_kg_pipeline

SF = "/root/testdata/sf0.001"


def test_pipeline_triples_pr_meets_gate(spark, tmp_path):
    ctx = run_kg_pipeline(spark, SF, str(tmp_path / "w"), link_entities=False)
    expected = expected_triples_for_synth(spark, SF)
    pr = triple_pr(ctx["edges"], expected)
    # north rule requires ≥0.95; the synthetic pipeline is exact
    assert pr["precision"] >= 0.95 and pr["recall"] >= 0.95, pr
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, pr


def test_triple_pr_math(spark):
    got = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c"), ("x", "p", "y")],
        "subject string, predicate string, object string",
    )
    expected = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c"), ("m", "p", "n")],
        "subject string, predicate string, object string",
    )
    pr = triple_pr(got, expected)
    assert pr["n_matched"] == 2
    assert round(pr["precision"], 4) == round(2 / 3, 4)
    assert round(pr["recall"], 4) == round(2 / 3, 4)


# ---- adversarial extraction corpus (round-2 next-round #7): malformed html,
# ---- entities around CURIEs, sentence-spanning patterns, overlapping
# ---- mentions. Each case carries its EXACT expected triple set; the gate is
# ---- set equality (P = R = 1.0), stronger than the 0.95 BASELINE threshold.

import pytest  # noqa: E402

R = "biolink:related_to"
I = "biolink:interacts_with"  # noqa: E741
C = "biolink:causes"

ADVERSARIAL_CASES = [
    ("clean",
     b"<html><body><p>HGNC:1 is related to MONDO:2.</p></body></html>",
     {("HGNC:1", R, "MONDO:2")}),
    ("unclosed_tags",
     b"<div><p>HGNC:1 is related to MONDO:2. <b>HGNC:3 causes MONDO:4",
     {("HGNC:1", R, "MONDO:2"), ("HGNC:3", C, "MONDO:4")}),
    ("unclosed_script_swallows_rest",
     b"<p>HGNC:1 is related to MONDO:2.</p><script>var s = 'HGNC:9 causes MONDO:9';",
     {("HGNC:1", R, "MONDO:2")}),
    ("closed_script_dropped",
     b"<script>HGNC:9 causes MONDO:9</script><p>HGNC:1 is related to MONDO:2.</p>",
     {("HGNC:1", R, "MONDO:2")}),
    ("boilerplate_dropped",
     b"<nav>HGNC:7 causes MONDO:7</nav><footer>HGNC:8 causes MONDO:8</footer>"
     b"<p>HGNC:1 is related to MONDO:2.</p>",
     {("HGNC:1", R, "MONDO:2")}),
    ("entities_around_curies",
     b"<p>HGNC:1&nbsp;is related to&nbsp;MONDO:2. &lt;HGNC:3 causes MONDO:4&gt;</p>",
     {("HGNC:1", R, "MONDO:2"), ("HGNC:3", C, "MONDO:4")}),
    ("pattern_spans_source_lines",
     b"<p>HGNC:5 is related\n\t  to MONDO:6.</p>",
     {("HGNC:5", R, "MONDO:6")}),
    ("no_cross_sentence_match",
     b"<p>This mentions HGNC:7. Is related to something about MONDO:8.</p>",
     set()),
    ("overlapping_mention_chain",
     b"<p>HGNC:1 interacts with HGNC:2 interacts with HGNC:3.</p>",
     {("HGNC:1", I, "HGNC:2"), ("HGNC:2", I, "HGNC:3")}),
    ("shared_subject_and_object",
     b"<p>X:1 causes Y:2 treats Z:3.</p>",
     {("X:1", C, "Y:2"), ("Y:2", "biolink:treats", "Z:3")}),
]


@pytest.mark.parametrize("name,html,expected", ADVERSARIAL_CASES, ids=[c[0] for c in ADVERSARIAL_CASES])
def test_adversarial_extraction_exact(spark, name, html, expected):
    from kgx_spark.pipeline.extract import extract_text
    from kgx_spark.pipeline.triples import extract_triples

    pages = spark.createDataFrame([(f"u/{name}", bytearray(html))], "url string, html binary")
    got = {
        (r["subject"], r["predicate"], r["object"])
        for r in extract_triples(extract_text(pages)).collect()
    }
    assert got == expected


def test_adversarial_corpus_aggregate_pr(spark):
    # the BASELINE gate form: P/R over the whole adversarial corpus ≥ 0.95
    from kgx_spark.pipeline.extract import extract_text
    from kgx_spark.pipeline.triples import extract_triples

    pages = spark.createDataFrame(
        [(f"u/{n}", bytearray(h)) for n, h, _ in ADVERSARIAL_CASES],
        "url string, html binary",
    )
    got = extract_triples(extract_text(pages)).select("subject", "predicate", "object")
    expected_rows = sorted({t for _, _, exp in ADVERSARIAL_CASES for t in exp})
    expected = spark.createDataFrame(expected_rows, "subject string, predicate string, object string")
    pr = triple_pr(got, expected)
    assert pr["precision"] >= 0.95 and pr["recall"] >= 0.95, pr
