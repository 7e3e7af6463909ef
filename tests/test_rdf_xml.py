"""RDF/XML → N-Triples converter (sources/rdf_xml.py) against the W3C
syntax features real OWL dumps use. Pure-python tests, no Spark session."""

from __future__ import annotations

from kgx_spark.sources.rdf_xml import rdfxml_to_nt

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
HEAD = (
    '<?xml version="1.0"?>\n'
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
    '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"\n'
    '         xmlns:owl="http://www.w3.org/2002/07/owl#"\n'
    '         xmlns:ex="http://example.org/">\n'
)


def _nt(body: str) -> set[str]:
    return {ln for ln in rdfxml_to_nt((HEAD + body + "</rdf:RDF>").encode()).splitlines() if ln}


def test_typed_node_and_resource_property():
    out = _nt('<owl:Class rdf:about="http://example.org/A">'
              '<rdfs:subClassOf rdf:resource="http://example.org/B"/></owl:Class>')
    assert f"<http://example.org/A> <{RDF}type> <http://www.w3.org/2002/07/owl#Class> ." in out
    assert ("<http://example.org/A> <http://www.w3.org/2000/01/rdf-schema#subClassOf> "
            "<http://example.org/B> .") in out


def test_literals_datatype_and_lang():
    out = _nt('<rdf:Description rdf:about="http://example.org/A">'
              '<rdfs:label xml:lang="en">hello "world"</rdfs:label>'
              '<ex:count rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">5</ex:count>'
              "</rdf:Description>")
    assert ('<http://example.org/A> <http://www.w3.org/2000/01/rdf-schema#label> '
            '"hello \\"world\\""@en .') in out
    assert ('<http://example.org/A> <http://example.org/count> '
            '"5"^^<http://www.w3.org/2001/XMLSchema#integer> .') in out


def test_nested_node_becomes_blank():
    out = _nt('<owl:Class rdf:about="http://example.org/A"><rdfs:subClassOf>'
              '<owl:Restriction>'
              '<owl:onProperty rdf:resource="http://example.org/p"/>'
              '<owl:someValuesFrom rdf:resource="http://example.org/B"/>'
              "</owl:Restriction></rdfs:subClassOf></owl:Class>")
    bnode_lines = [ln for ln in out if "_:b" in ln]
    assert any("subClassOf> _:b" in ln for ln in bnode_lines)
    assert any("onProperty> <http://example.org/p>" in ln for ln in bnode_lines)
    assert any("someValuesFrom> <http://example.org/B>" in ln for ln in bnode_lines)


def test_parse_type_collection_builds_rdf_list():
    out = _nt('<owl:Class rdf:about="http://example.org/A">'
              '<owl:intersectionOf rdf:parseType="Collection">'
              '<rdf:Description rdf:about="http://example.org/X"/>'
              '<rdf:Description rdf:about="http://example.org/Y"/>'
              "</owl:intersectionOf></owl:Class>")
    firsts = [ln for ln in out if f"<{RDF}first>" in ln]
    rests = [ln for ln in out if f"<{RDF}rest>" in ln]
    assert len(firsts) == 2 and len(rests) == 2
    assert any("<http://example.org/X>" in ln for ln in firsts)
    assert any(f"<{RDF}nil>" in ln for ln in rests)


def test_parse_type_resource_and_node_id():
    out = _nt('<rdf:Description rdf:about="http://example.org/A">'
              '<ex:detail rdf:parseType="Resource">'
              '<ex:weight>3</ex:weight></ex:detail>'
              '<ex:ref rdf:nodeID="n1"/></rdf:Description>'
              '<rdf:Description rdf:nodeID="n1"><rdfs:label>shared</rdfs:label>'
              "</rdf:Description>")
    assert any("detail> _:b" in ln for ln in out)
    assert any('weight> "3"' in ln for ln in out)
    assert "<http://example.org/A> <http://example.org/ref> _:n1 ." in out
    assert '_:n1 <http://www.w3.org/2000/01/rdf-schema#label> "shared" .' in out


def test_property_attributes_shorthand():
    out = _nt('<rdf:Description rdf:about="http://example.org/A" '
              'ex:name="thing"/>')
    assert '<http://example.org/A> <http://example.org/name> "thing" .' in out


def test_xml_base_and_rdf_id():
    doc = ('<?xml version="1.0"?>\n'
           '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
           '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"\n'
           '         xml:base="http://example.org/onto">\n'
           '<rdf:Description rdf:ID="frag"><rdfs:label>x</rdfs:label></rdf:Description>\n'
           '<rdf:Description rdf:about="rel"><rdfs:label>y</rdfs:label></rdf:Description>\n'
           "</rdf:RDF>")
    out = {ln for ln in rdfxml_to_nt(doc.encode()).splitlines() if ln}
    assert any(ln.startswith("<http://example.org/onto#frag>") for ln in out)
    assert any(ln.startswith("<http://example.org/rel>") for ln in out)


def test_deterministic_bnode_labels():
    body = ('<owl:Class rdf:about="http://example.org/A"><rdfs:subClassOf>'
            "<owl:Restriction/></rdfs:subClassOf></owl:Class>")
    assert _nt(body) == _nt(body)
