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


def test_png_roundtrip_property():
    """encode_png ∘ decode_png == identity on random images of every
    supported channel count and shape (hypothesis-generated pixels)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from kgx_spark.functions.codecs import decode_png, encode_png

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 3, 4]),
        st.integers(0, 2**32 - 1),
    )
    def check(h, w, c, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        assert (decode_png(encode_png(px)) == px).all()

    check()


def test_rdfxml_conversion_deterministic_property():
    """Same RDF/XML bytes → byte-identical N-Triples across repeated runs,
    for generated documents mixing resources, literals, and nesting."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kgx_spark.sources.rdf_xml import rdfxml_to_nt

    name = st.text(alphabet="abcdefgh", min_size=1, max_size=6)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.tuples(name, name, st.booleans()), min_size=1, max_size=8))
    def check(rows):
        body = "".join(
            f'<rdf:Description rdf:about="http://x.org/{s}">'
            + (f'<ex:p rdf:resource="http://x.org/{o}"/>' if is_res
               else f"<ex:p>{o}</ex:p>")
            + "</rdf:Description>"
            for s, o, is_res in rows
        )
        doc = (
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:ex="http://x.org/ns/">' + body + "</rdf:RDF>"
        ).encode()
        out1, out2 = rdfxml_to_nt(doc), rdfxml_to_nt(doc)
        assert out1 == out2
        assert len([ln for ln in out1.splitlines() if ln]) == len(rows)

    check()
