"""End-to-end I/O round-trips, mirroring tests/integration/test_transform.py:16-50
(_transform: transform in → save out → re-read → counts equal)."""

import os

import pyspark.sql.functions as F
import pytest

from kgx_spark.sinks import write_kgx_jsonl, write_kgx_parquet, write_kgx_tsv, write_ntriples
from kgx_spark.sources import read_kgx_jsonl, read_kgx_parquet, read_kgx_tsv, read_ntriples

NODES_TSV = """id\tname\tcategory\ttaxon
HGNC:11603\tTBX4\tbiolink:Gene\tNCBITaxon:9606
HGNC:11604\tTBX5\tbiolink:Gene|biolink:NamedThing\tNCBITaxon:9606
MONDO:0005002\tCOPD\tbiolink:Disease\t
"""

EDGES_TSV = """subject\tpredicate\tobject\trelation\tknowledge_level\tagent_type
HGNC:11603\tbiolink:related_to\tMONDO:0005002\tRO:0002434\tnot_provided\tnot_provided
HGNC:11604\tbiolink:interacts_with\tHGNC:11603\tRO:0002434\tnot_provided\tnot_provided
"""


@pytest.fixture()
def tsv_fileset(tmp_path):
    (tmp_path / "graph_nodes.tsv").write_text(NODES_TSV)
    (tmp_path / "graph_edges.tsv").write_text(EDGES_TSV)
    return str(tmp_path)


def test_tsv_read(spark, tsv_fileset):
    nodes, edges = read_kgx_tsv(spark, tsv_fileset)
    assert nodes.count() == 3
    assert edges.count() == 2
    tbx5 = nodes.where(F.col("id") == "HGNC:11604").first()
    assert tbx5["category"] == ["biolink:Gene", "biolink:NamedThing"]
    assert tbx5["taxon"] == "NCBITaxon:9606"


def test_tsv_roundtrip(spark, tsv_fileset, tmp_path):
    nodes, edges = read_kgx_tsv(spark, tsv_fileset)
    base = str(tmp_path / "out" / "graph")
    write_kgx_tsv(nodes, edges, base, single_file=True)
    nodes2, edges2 = read_kgx_tsv(spark, str(tmp_path / "out"))
    assert nodes2.count() == 3 and edges2.count() == 2
    t2 = nodes2.where(F.col("id") == "HGNC:11604").first()
    assert t2["category"] == ["biolink:Gene", "biolink:NamedThing"]


def test_jsonl_roundtrip(spark, tsv_fileset, tmp_path):
    nodes, edges = read_kgx_tsv(spark, tsv_fileset)
    base = str(tmp_path / "j" / "graph")
    write_kgx_jsonl(nodes, edges, base)
    nodes2, edges2 = read_kgx_jsonl(spark, str(tmp_path / "j"))
    assert nodes2.count() == 3 and edges2.count() == 2


def test_parquet_roundtrip(spark, tsv_fileset, tmp_path):
    nodes, edges = read_kgx_tsv(spark, tsv_fileset)
    base = str(tmp_path / "p" / "graph")
    write_kgx_parquet(nodes, edges, base)
    nodes2, edges2 = read_kgx_parquet(spark, str(tmp_path / "p"))
    assert nodes2.count() == 3 and edges2.count() == 2
    assert dict(nodes2.dtypes)["category"] == "array<string>"


def test_ntriples_roundtrip(spark, tmp_path):
    nt = "\n".join(
        [
            '<http://identifiers.org/hgnc/1> <http://www.w3.org/2000/01/rdf-schema#label> "Gene one" .',
            "<http://identifiers.org/hgnc/1> <https://w3id.org/biolink/vocab/related_to> <http://identifiers.org/ncbigene/2> .",
            "<http://identifiers.org/ncbigene/2> <http://www.w3.org/2002/07/owl#sameAs> <http://identifiers.org/hgnc/1> .",
        ]
    )
    p = tmp_path / "t.nt"
    p.write_text(nt + "\n")
    nodes, edges = read_ntriples(spark, str(p))
    nrows = {r["id"]: r for r in nodes.collect()}
    assert set(nrows) == {"HGNC:1", "NCBIGene:2"}
    assert nrows["HGNC:1"]["name"] == "Gene one"
    # owl:sameAs resolves through the model's slot mappings to a
    # biolink:same_as EDGE — the reference does the same for
    # owl:equivalentClass (test_rdf_source.py::test_read_nt4); it is NOT a
    # node property (predicate slots are absent from node_property_predicates)
    erows = {(r["subject"], r["object"]): r for r in edges.collect()}
    assert len(erows) == 2
    assert erows[("HGNC:1", "NCBIGene:2")]["predicate"] == "biolink:related_to"
    same = erows[("NCBIGene:2", "HGNC:1")]
    assert same["predicate"] == "biolink:same_as"
    assert same["relation"] == "owl:sameAs"
    # write back out
    out = str(tmp_path / "out_nt")
    write_ntriples(nodes, edges, out)
    lines = spark.read.text(out)
    assert lines.count() >= 4


def test_ntriples_dereification(spark, tmp_path):
    # reified statement stanza → one edge (rdf_source.py:330-355)
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    nt = "\n".join(
        [
            f"<urn:stmt1> <{rdf}type> <{rdf}Statement> .",
            f"<urn:stmt1> <{rdf}subject> <http://identifiers.org/hgnc/1> .",
            f"<urn:stmt1> <{rdf}predicate> <https://w3id.org/biolink/vocab/affects> .",
            f"<urn:stmt1> <{rdf}object> <http://identifiers.org/ncbigene/2> .",
        ]
    )
    p = tmp_path / "r.nt"
    p.write_text(nt + "\n")
    nodes, edges = read_ntriples(spark, str(p))
    assert edges.count() == 1
    e = edges.first()
    assert (e["subject"], e["predicate"], e["object"]) == ("HGNC:1", "biolink:affects", "NCBIGene:2")
