"""Golden-fixture parity: the reference's OWN test resource files parsed by
our sources, pinned to the reference's OWN test assertions.

Self-roundtrips (our sink → our source) are blind to format divergence from
the reference; these tests close that gap by reading the byte-identical
fixture files the reference's unit tests read
(/root/reference/tests/resources) and asserting what those tests assert:

- TSV keeps literal quotes (csv.QUOTE_NONE — test_tsv_source.py:8-40:
  description == '"Node of type Disease, CURIE:456"'), CSV unquotes
  (test_read_csv:43-77).
- tar / tar.gz archives, including edge-file-first member order
  (test_read_tsv_tar_*:79-148).
- JSON / JSONL (test_json_source.py:8-41, test_jsonl_source.py:8-43):
  7 nodes, 5 edges, pinned names incl. a literal '|' inside a JSON string
  (PUBCHEM name '16|A-Methyl Prednisolone' must NOT be pipe-split).
- Obograph goslim_generic.json (test_obograph_source.py:12-71): 176
  nodes / 205 edges, hasOBONamespace category inference, scoped synonyms,
  subsets, xref.

The suite skips when the reference checkout is absent (the repo stays
standalone); in this sandbox it always runs.
"""

import os

import pytest
from pyspark.sql import functions as F

RES = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixture checkout not present"
)


def _by_id(df, key="id"):
    return {r[key]: r.asDict() for r in df.collect()}


# ---------------------------------------------------------------- TSV / CSV


def test_tsv_nodes_keep_literal_quotes(spark):
    from kgx_spark.sources.tsv import read_nodes_tsv

    nodes = _by_id(read_nodes_tsv(spark, f"{RES}/test_nodes.tsv", fmt="tsv"))
    assert len(nodes) == 3
    n1 = nodes["CURIE:456"]
    assert n1["name"] == "Disease 456"
    assert "biolink:Disease" in n1["category"]
    assert "biolink:NamedThing" in n1["category"]
    # reference reads TSV with csv.QUOTE_NONE: quotes are DATA
    assert n1["description"] == '"Node of type Disease, CURIE:456"'


def test_tsv_edges(spark):
    from kgx_spark.sources.tsv import read_edges_tsv

    edges = read_edges_tsv(spark, f"{RES}/test_edges.tsv", fmt="tsv").collect()
    assert len(edges) == 1
    e1 = edges[0].asDict()
    assert e1["id"]
    assert e1["subject"] == "CURIE:123"
    assert e1["object"] == "CURIE:456"
    assert e1["predicate"] == "biolink:related_to"
    assert e1["relation"] == "biolink:related_to"
    assert "PMID:1" in e1["publications"] and "PMID:2" in e1["publications"]


def test_csv_nodes_unquote(spark):
    from kgx_spark.sources.tsv import read_nodes_tsv

    nodes = _by_id(read_nodes_tsv(spark, f"{RES}/test_nodes.csv", fmt="csv"))
    assert len(nodes) == 3
    n1 = nodes["CURIE:456"]
    assert n1["name"] == "Disease 456"
    assert "biolink:Disease" in n1["category"]
    # CSV quoting is syntax, not data (and the quoted comma survives)
    assert n1["description"] == "Node of type Disease, CURIE:456"


def test_csv_edges(spark):
    from kgx_spark.sources.tsv import read_edges_tsv

    e1 = read_edges_tsv(spark, f"{RES}/test_edges.csv", fmt="csv").collect()[0].asDict()
    assert e1["subject"] == "CURIE:123"
    assert e1["object"] == "CURIE:456"
    assert e1["predicate"] == "biolink:related_to"
    assert "PMID:1" in e1["publications"]


@pytest.mark.parametrize("archive", ["test.tar", "test.tar.gz", "test-inverse.tar.gz"])
def test_tsv_tar_archives(spark, archive):
    from kgx_spark.sources.tsv import read_kgx_tsv

    nodes, edges = read_kgx_tsv(spark, f"{RES}/{archive}", fmt="tsv")
    assert nodes.count() == 3
    assert edges.count() == 1


# ---------------------------------------------------------------- JSON(L)


def _check_valid_graph(nodes_df, edges_df):
    nodes = _by_id(nodes_df)
    assert len(nodes) == 7
    n = nodes["MONDO:0017148"]
    assert n["name"] == "heritable pulmonary arterial hypertension"
    assert n["category"][0] == "biolink:Disease"
    # a literal | inside a JSON string is NOT a list separator
    assert nodes["PUBCHEM.COMPOUND:10429502"]["name"] == "16|A-Methyl Prednisolone"

    edges = {(r["subject"], r["object"]): r.asDict() for r in edges_df.collect()}
    assert len(edges) == 5
    e = edges[("HGNC:11603", "MONDO:0017148")]
    assert e["predicate"] == "biolink:related_to"
    assert e["relation"] == "RO:0004013"


def test_json_valid_graph(spark):
    from kgx_spark.sources.json_source import read_kgx_json

    nodes, edges = read_kgx_json(spark, f"{RES}/valid.json")
    _check_valid_graph(nodes, edges)


def test_jsonl_valid_graph(spark):
    from kgx_spark.sources.jsonl import read_kgx_jsonl

    nodes, edges = read_kgx_jsonl(spark, f"{RES}/valid_nodes.jsonl")
    assert edges is None
    _, edges = read_kgx_jsonl(spark, f"{RES}/valid_edges.jsonl")
    _check_valid_graph(nodes, edges)


# ---------------------------------------------------------------- Obograph


@pytest.fixture(scope="module")
def goslim(spark):
    from kgx_spark.sources.obograph import read_obograph

    return read_obograph(spark, f"{RES}/goslim_generic.json")


def test_obograph_goslim_counts(goslim):
    nodes, edges = goslim
    assert nodes.count() == 176
    # the reference test's edge dict keys (s, o, edge_key): 206 raw rows,
    # 205 distinct (one duplicate triple) — test_obograph_source.py:31
    assert edges.select("subject", "predicate", "object").distinct().count() == 205


def test_obograph_goslim_node_pins(goslim):
    nodes, _ = goslim
    n = _by_id(nodes.where(F.col("id").isin("GO:0003677", "GO:0005575", "GO:0005975", "GO:0003924")))

    n1 = n["GO:0003677"]
    assert n1["name"] == "DNA binding"
    assert n1["description"].startswith("Any molecular function by which a gene product")
    # hasOBONamespace molecular_function → MolecularActivity (get_category)
    assert n1["category"] == ["biolink:MolecularActivity"]
    assert "structure-specific DNA binding" in n1["synonym"]
    assert "microtubule/chromatin interaction" in n1["synonym"]
    assert "plasmid binding" in n1["synonym"]
    # scoped synonyms keep FILE order (not in the reference's column_types,
    # so its sanitize never sorts them) — test_obograph_source.py:46-49
    assert n1["related_synonym"] == [
        "structure-specific DNA binding",
        "structure specific DNA binding",
        "microtubule/chromatin interaction",
    ]
    assert n1["narrow_synonym"] == ["plasmid binding"]

    n2 = n["GO:0005575"]
    assert n2["name"] == "cellular_component"
    assert n2["category"] == ["biolink:CellularComponent"]
    assert n2["xref"] == ["NIF_Subcellular:sao1337158144"]
    assert "goslim_chembl" in n2["subsets"]
    assert "goslim_generic" in n2["subsets"]
    assert n2["iri"] == "http://purl.obolibrary.org/obo/GO_0005575"

    assert n["GO:0005975"]["exact_synonym"] == ["carbohydrate metabolism"]
    assert n["GO:0003924"]["broad_synonym"][0].startswith("hydrolase activity")


def test_obograph_goslim_edge_semantics(goslim):
    _, edges = goslim
    rel = {(r["predicate"], r["relation"])
           for r in edges.select("predicate", "relation").distinct().collect()}
    # is_a → subclass_of with rdfs:subClassOf (read_edge:226-228); every IRI
    # pred → related_to with relation = the contracted CURIE (the reference's
    # toolkit lookups miss for IRIs — see the source's docstring; the 205
    # count above is the empirical pin)
    assert ("biolink:subclass_of", "rdfs:subClassOf") in rel
    assert ("biolink:related_to", "BFO:0000050") in rel
    assert ("biolink:related_to", "BFO:0000051") in rel
    assert ("biolink:related_to", "BFO:0000066") in rel
    assert ("biolink:related_to", "RO:0002211") in rel
    # non-IRI, non-special preds pass through as biolink:{pred}
    assert ("biolink:subPropertyOf", "subPropertyOf") in rel
    assert ("biolink:inverseOf", "inverseOf") in rel
