"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY.md §5 notes the reference has none)."""

import hypothesis.strategies as st
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings

from kgx_spark.operators.clique import _driver_union_find
from kgx_spark.pipeline.extract import extract_text_bytes

html_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(body=html_text)
@settings(max_examples=150, deadline=None)
def test_extraction_pure_and_idempotent_shape(body):
    html = f"<html><head><title>t</title></head><body><nav>n</nav><p>{body}</p></body></html>".encode()
    out1 = extract_text_bytes(html)
    out2 = extract_text_bytes(html)
    assert out1 == out2  # pure function of bytes
    assert "\n" not in out1 and "\t" not in out1  # whitespace collapsed
    assert out1 == out1.strip()


@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)), max_size=120))
@settings(max_examples=200, deadline=None)
def test_union_find_properties(pairs):
    rows = [(f"V:{a}", f"V:{b}") for a, b in pairs if a != b]
    labels = dict(_driver_union_find(rows))
    # every endpoint labeled; label is a member of the same component;
    # connected endpoints share a label; label is the min of its component
    for a, b in rows:
        assert labels[a] == labels[b]
    comps: dict[str, list[str]] = {}
    for v, c in labels.items():
        comps.setdefault(c, []).append(v)
    for c, members in comps.items():
        assert c == min(members)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.sampled_from(["A:1", "A:2", "A:3"]), st.text("ab", min_size=1, max_size=3)),
        min_size=1,
        max_size=8,
    )
)
def test_merge_nodes_idempotent(spark, rows):
    from kgx_spark.operators.merge import merge_nodes

    df = spark.createDataFrame(rows, "id string, p1 string")
    once = merge_nodes([df])
    twice = merge_nodes([once])
    a = {tuple(r) for r in once.collect()}
    b = {tuple(r) for r in twice.collect()}
    assert a == b  # merge is idempotent on already-merged input


def test_distributed_cc_matches_union_find_random_graphs(spark):
    """Distributed hash-min LP (with int encoding + pointer doubling) and the
    driver union-find are the same function on seeded random pair sets."""
    import random

    from kgx_spark.operators.clique import _driver_union_find, connected_components

    rng = random.Random(42)
    for trial in range(3):
        n = 120
        pairs = [
            (f"V:{rng.randrange(n):03d}", f"V:{rng.randrange(n):03d}")
            for _ in range(150)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        expected = dict(_driver_union_find(pairs))
        df = spark.createDataFrame(pairs, "src string, dst string")
        for encode in (True, False):
            labels, _ = connected_components(df, driver_threshold=0, encode_ids=encode)
            got = {r["id"]: r["component"] for r in labels.collect()}
            assert got == expected, f"trial={trial} encode={encode}"
