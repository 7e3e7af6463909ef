"""Jelly RDF codec + source/sink tests.

Reference behavior: kgx/parsers/jelly_parser.py (streaming flat-triple
parse), kgx/sink/rdf_sink.py:89-108 (delimited TRIPLES/FLAT_TRIPLES
stream), tests/integration/test_jelly.py (write→read roundtrip as the
conformance surface — the reference also has no static .jelly fixtures).
The codec itself is exercised against hand-crafted wire bytes for the
spec's compression rules (zero-id auto-increment, previous-prefix reuse,
repeated-term elision) so OUR decoder accepts streams our encoder never
produces.
"""

from __future__ import annotations

import glob
import gzip
import os

import pytest

import kgx_spark.functions.jelly_codec as jc
from kgx_spark.functions.jelly_codec import JellyDecoder, decode, encode_delimited

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _sample_triples():
    return [
        (("iri", "http://ex.org/a"), ("iri", "http://ex.org/p"), ("iri", "http://ex.org/b")),
        (("iri", "http://ex.org/a"), ("iri", "http://ex.org/p"), ("literal", "hello", None, None)),
        (("iri", "http://ex.org/a"), ("iri", "http://ex.org/q"), ("literal", "bonjour", "fr", None)),
        (("iri", "http://ex.org/c"), ("iri", "http://ex.org/q"), ("literal", "42", None, XSD_INT)),
        (("bnode", "b0"), ("iri", "http://ex.org/p"), ("iri", "http://ex.org/a")),
        (("iri", "urn:x"), ("iri", "http://ex.org/p"), ("bnode", "b1")),
    ]


class TestCodec:
    def test_roundtrip_all_term_kinds(self):
        triples = _sample_triples()
        data = b"".join(encode_delimited(triples, frame_size=2))
        assert list(decode(data)) == triples

    def test_roundtrip_table_eviction(self):
        # more distinct names/prefixes than table slots → FIFO slot reuse
        triples = [
            (
                ("iri", f"http://ex{i // 7}.org/n{i}"),
                ("iri", "http://ex.org/p"),
                ("iri", f"http://ey.org/m{i % 5}"),
            )
            for i in range(300)
        ]
        data = b"".join(
            encode_delimited(triples, frame_size=64, max_name_table=16, max_prefix_table=4)
        )
        assert list(decode(data)) == triples

    def test_repeated_term_elision_shrinks_stream(self):
        same = [
            (("iri", "http://ex.org/s"), ("iri", "http://ex.org/p"), ("literal", str(i), None, None))
            for i in range(100)
        ]
        data = b"".join(encode_delimited(same))
        assert list(decode(data)) == same
        # repeated s/p encode as absent fields: ~bytes per extra triple is
        # just the literal row, far below re-encoding both IRIs
        per_triple = len(data) / len(same)
        assert per_triple < 20

    def test_empty_stream(self):
        data = b"".join(encode_delimited([]))
        assert data  # options-only frame still written
        assert list(decode(data)) == []
        assert list(decode(b"")) == []

    def test_undelimited_single_frame(self):
        triples = _sample_triples()[:3]
        from kgx_spark.functions.jelly_codec import JellyEncoder

        frame = JellyEncoder().encode_frame(triples)
        assert frame[0] == 0x0A  # rows-field tag → undelimited detection
        assert list(decode(frame)) == triples

    def test_compressed_stream_zero_ids_and_repeats(self):
        # hand-crafted stream exercising decoder-only spec rules
        rows = [
            jc._field_bytes(jc._ROW_PREFIX, jc._field_str(jc._ENTRY_VALUE, "http://z.org/")),
            jc._field_bytes(jc._ROW_NAME, jc._field_str(jc._ENTRY_VALUE, "s")),
            jc._field_bytes(jc._ROW_NAME, jc._field_str(jc._ENTRY_VALUE, "p")),
            jc._field_bytes(jc._ROW_NAME, jc._field_str(jc._ENTRY_VALUE, "o")),
        ]
        explicit = jc._field_varint(jc._IRI_PREFIX_ID, 1) + jc._field_varint(jc._IRI_NAME_ID, 1)
        zero = b""  # prefix_id=0 (reuse), name_id=0 (last+1)
        body = (
            jc._field_bytes(jc._T_S_IRI, explicit)
            + jc._field_bytes(jc._T_P_IRI, zero)
            + jc._field_bytes(jc._T_O_IRI, zero)
        )
        rows.append(jc._field_bytes(jc._ROW_TRIPLE, body))
        rows.append(jc._field_bytes(jc._ROW_TRIPLE, b""))  # full repeated-term triple
        frame = b"".join(jc._field_bytes(jc._FRAME_ROWS, r) for r in rows)
        expected = [
            (("iri", "http://z.org/s"), ("iri", "http://z.org/p"), ("iri", "http://z.org/o"))
        ] * 2
        assert list(decode(frame)) == expected

    def test_property_roundtrip_random_streams(self):
        """Any stream of well-formed terms survives encode→decode exactly,
        across unicode text, tiny lookup tables, and tiny frames."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        text = st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
        )
        iri = st.builds(lambda s: ("iri", s), text)
        bnode = st.builds(lambda s: ("bnode", s), text)
        literal = st.one_of(
            st.builds(lambda lex: ("literal", lex, None, None), text),
            st.builds(lambda lex, lang: ("literal", lex, lang, None), text, text.filter(bool)),
            st.builds(lambda lex, dt: ("literal", lex, None, dt), text, text.filter(bool)),
        )
        term = st.one_of(iri, bnode, literal)
        triple = st.tuples(st.one_of(iri, bnode), iri, term)

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(triple, max_size=30),
            st.integers(min_value=1, max_value=7),
            # one triple references at most 3 distinct names/prefixes;
            # below 4 slots the encoder (correctly) refuses rather than
            # silently corrupting — covered by test_table_too_small
            st.integers(min_value=4, max_value=6),
        )
        def check(triples, frame_size, table_size):
            data = b"".join(
                encode_delimited(
                    triples,
                    frame_size=frame_size,
                    max_name_table=table_size,
                    max_prefix_table=table_size,
                    max_datatype_table=table_size,
                )
            )
            assert list(decode(data)) == triples

        check()

    def test_table_too_small(self):
        # three distinct names in one triple cannot share a 1-slot table:
        # evicting an id the in-flight triple references would corrupt the
        # stream, so the encoder must refuse loudly
        triples = [(("iri", "a"), ("iri", "b"), ("iri", "c"))]
        with pytest.raises(ValueError, match="too small"):
            b"".join(encode_delimited(triples, max_name_table=1))

    def test_quad_stream_rejected(self):
        frame = jc._field_bytes(
            jc._FRAME_ROWS, jc._field_bytes(jc._ROW_QUAD, b"")
        )
        with pytest.raises(ValueError, match="triple streams only"):
            list(JellyDecoder().decode_frame(frame))

    def test_rdf_star_rejected(self):
        tbody = jc._field_bytes(jc._T_S_TTERM, b"")
        frame = jc._field_bytes(
            jc._FRAME_ROWS, jc._field_bytes(jc._ROW_TRIPLE, tbody)
        )
        with pytest.raises(ValueError, match="RDF-star"):
            list(JellyDecoder().decode_frame(frame))

    def test_unknown_triple_fields_skipped(self):
        """Forward compat: RdfTriple field numbers outside 1-12 (a newer spec
        rev) are ignored per protobuf convention, not an IndexError — both
        varint- and bytes-wired unknowns."""
        rows = [
            jc._field_bytes(jc._ROW_PREFIX, jc._field_str(jc._ENTRY_VALUE, "http://z.org/")),
            jc._field_bytes(jc._ROW_NAME, jc._field_str(jc._ENTRY_VALUE, "s")),
            jc._field_bytes(jc._ROW_NAME, jc._field_str(jc._ENTRY_VALUE, "p")),
            jc._field_bytes(jc._ROW_NAME, jc._field_str(jc._ENTRY_VALUE, "o")),
        ]
        explicit = jc._field_varint(jc._IRI_PREFIX_ID, 1) + jc._field_varint(jc._IRI_NAME_ID, 1)
        zero = b""
        body = (
            jc._field_varint(15, 7)  # unknown varint field
            + jc._field_bytes(jc._T_S_IRI, explicit)
            + jc._field_bytes(jc._T_P_IRI, zero)
            + jc._field_bytes(13, b"\x01\x02")  # unknown length-delimited field
            + jc._field_bytes(jc._T_O_IRI, zero)
        )
        rows.append(jc._field_bytes(jc._ROW_TRIPLE, body))
        frame = b"".join(jc._field_bytes(jc._FRAME_ROWS, r) for r in rows)
        assert list(decode(frame)) == [
            (("iri", "http://z.org/s"), ("iri", "http://z.org/p"), ("iri", "http://z.org/o"))
        ]

    def test_undefined_name_id_rejected(self):
        iri = jc._field_varint(jc._IRI_NAME_ID, 7)
        tbody = jc._field_bytes(jc._T_S_IRI, iri)
        frame = jc._field_bytes(
            jc._FRAME_ROWS, jc._field_bytes(jc._ROW_TRIPLE, tbody)
        )
        with pytest.raises(ValueError, match="undefined name id"):
            list(JellyDecoder().decode_frame(frame))


@pytest.fixture(scope="module")
def graph(spark):
    from pyspark.sql import Row

    nodes = spark.createDataFrame(
        [
            Row(id="HGNC:1", name="alpha", category=["biolink:Gene"]),
            Row(id="HGNC:2", name='qu"ote\\slash', category=["biolink:Gene", "biolink:NamedThing"]),
            Row(id="NCBIGene:7", name=None, category=["biolink:Gene"]),
        ]
    )
    edges = spark.createDataFrame(
        [
            Row(subject="HGNC:1", predicate="biolink:related_to", object="NCBIGene:7"),
            Row(subject="HGNC:2", predicate="biolink:interacts_with", object="HGNC:1"),
        ]
    )
    return nodes, edges


class TestSparkJelly:
    def test_write_read_roundtrip_matches_nt(self, spark, graph, tmp_path):
        """The jelly sink+source must carry exactly what the NT pair does:
        same nodes (props included), same edges."""
        from kgx_spark.sinks.jelly import write_jelly
        from kgx_spark.sinks.rdf_nt import write_ntriples
        from kgx_spark.sources.jelly import read_jelly
        from kgx_spark.sources.rdf_nt import read_ntriples

        nodes, edges = graph
        jpath = str(tmp_path / "g_jelly")
        npath = str(tmp_path / "g_nt")
        write_jelly(nodes, edges, jpath)
        write_ntriples(nodes, edges, npath)
        jn, je = read_jelly(spark, jpath)
        nn, ne = read_ntriples(spark, npath)
        for a, b, what in ((jn, nn, "nodes"), (je, ne, "edges")):
            cols = sorted(a.columns)
            assert sorted(b.columns) == cols, what
            a, b = a.select(*cols), b.select(*cols)
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
                f"jelly {what} != nt {what}"
            )
        files = glob.glob(os.path.join(jpath, "part-*.jelly"))
        assert files, "no part files written"

    def test_gzip_member_read(self, spark, graph, tmp_path):
        from kgx_spark.sinks.jelly import write_jelly
        from kgx_spark.sources.jelly import parse_jelly

        nodes, edges = graph
        jpath = str(tmp_path / "g_plain")
        write_jelly(nodes, edges, jpath)
        plain_rows = sorted(map(tuple, parse_jelly(spark, jpath).collect()), key=str)
        gzdir = str(tmp_path / "g_gz")
        os.makedirs(gzdir)
        for f in glob.glob(os.path.join(jpath, "part-*.jelly")):
            with open(f, "rb") as fh:
                blob = fh.read()
            with open(os.path.join(gzdir, os.path.basename(f) + ".gz"), "wb") as fh:
                fh.write(gzip.compress(blob))
        gz_rows = sorted(map(tuple, parse_jelly(spark, gzdir).collect()), key=str)
        assert gz_rows == plain_rows
        # sink-side gz: write_jelly(compression="gz") produces .jelly.gz
        # part files that read back identically
        gzsink = str(tmp_path / "g_gzsink")
        write_jelly(nodes, edges, gzsink, compression="gz")
        assert glob.glob(os.path.join(gzsink, "part-*.jelly.gz"))
        sink_rows = sorted(map(tuple, parse_jelly(spark, gzsink).collect()), key=str)
        assert sink_rows == plain_rows

    def test_reified_statements_follow_reference_shape(self, spark, graph, tmp_path):
        """reify_all_edges=True writes the reference's write_edge shape
        (rdf_sink.py:214-266): the direct triple PLUS a urn:uuid statement
        node typed biolink:Association with biolink role triples — 5 rows
        per plain edge, all IRI-subject (no bnodes)."""
        from pyspark.sql import functions as F

        from kgx_spark.sinks.jelly import write_jelly
        from kgx_spark.sources.jelly import parse_jelly

        nodes, edges = graph
        jpath = str(tmp_path / "g_reified")
        write_jelly(None, edges, jpath, reify_all_edges=True)
        rows = parse_jelly(spark, jpath)
        assert rows.count() == 5 * edges.count()
        assert (
            rows.where(F.col("object_iri") == "https://w3id.org/biolink/vocab/Association").count()
            == edges.count()
        )
        assert (
            rows.where(F.col("subject_iri").startswith("urn:uuid:")).count()
            == 4 * edges.count()
        )
