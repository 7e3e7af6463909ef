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
