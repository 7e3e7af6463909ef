"""Triple-set precision/recall evaluation (north-rule gate: P/R ≥ 0.95 vs
the reference's emitted (subj, pred, obj) triples).

Pure DataFrame set algebra — two left-semi joins and three counts; both
inputs are reduced to distinct (subject, predicate, object) first, matching
how the reference's own dedup key works (kgx_utils.py:343-364: identity IS
the s-p-o string, ids are cosmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_KEY = ["subject", "predicate", "object"]


def triple_pr(got: DataFrame, expected: DataFrame) -> dict:
    """→ {precision, recall, f1, n_got, n_expected, n_matched}."""
    g = got.select(*_KEY).distinct().cache()
    e = expected.select(*_KEY).distinct().cache()
    n_got = g.count()
    n_expected = e.count()
    n_matched = g.join(e, on=_KEY, how="left_semi").count()
    precision = n_matched / n_got if n_got else 0.0
    recall = n_matched / n_expected if n_expected else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    g.unpersist()
    e.unpersist()
    return {
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "f1": round(f1, 6),
        "n_got": n_got,
        "n_expected": n_expected,
        "n_matched": n_matched,
    }


def expected_triples_for_synth(spark, sf_dir: str) -> DataFrame:
    """Ground-truth (s,p,o) set embedded in the synthetic corpus
    (kgx_spark/pipeline/synth.py fact sentences), AFTER canonicalization:
    every Q:/R: alias resolves to its P: leader, same_as edges consumed."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.concat(F.lit("P:"), "l_partkey").alias("subject"),
        F.when(F.col("l_linenumber") % 2 == 0, "biolink:related_to")
        .otherwise("biolink:interacts_with").alias("predicate"),
        F.concat(F.lit("S:"), "l_suppkey").alias("object"),
    ).distinct()
