"""Self-contained RDF/XML → N-Triples converter (stdlib xml.etree — no
rdflib in this container, so the W3C syntax is implemented directly from the
public spec: https://www.w3.org/TR/rdf-syntax-grammar/).

Covers the subset real OWL ontology dumps use (the reference loads these via
rdflib and walks the resulting graph — kgx/source/owl_source.py:36-60; here
the conversion happens driver-side and the triples feed the DISTRIBUTED
N-Triples/OWL pipeline in sources/rdf_nt.py + sources/owl_nt.py):

- rdf:Description and typed node elements (owl:Class → rdf:type triple)
- rdf:about / rdf:ID / rdf:nodeID / anonymous blank nodes
- property elements: rdf:resource, rdf:nodeID, nested node elements,
  text literals with rdf:datatype / xml:lang
- rdf:parseType="Resource" (implicit blank node) and
  rdf:parseType="Collection" (first/rest/nil lists — owl:intersectionOf)
- property ATTRIBUTES on node elements (literal shorthand)
- xml:base + relative URI resolution

Blank node labels are assigned in document order (_:b0, _:b1, …), so the
conversion is fully deterministic — same bytes in, same triples out.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
_RDF = "{" + RDF_NS + "}"
_XML = "{" + XML_NS + "}"

# rdf: attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {
    _RDF + "about", _RDF + "ID", _RDF + "nodeID", _RDF + "resource",
    _RDF + "datatype", _RDF + "parseType", _RDF + "RDF",
    _XML + "base", _XML + "lang",
}


def _uri(tag: str) -> str:
    """'{ns}local' → 'nslocal' (ElementTree tags concatenate directly)."""
    return tag[1:].replace("}", "", 1) if tag.startswith("{") else tag


def _escape_literal(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )


class _Converter:
    def __init__(self) -> None:
        self.triples: list[str] = []
        self._bnode = 0

    def new_bnode(self) -> str:
        self._bnode += 1
        return f"_:b{self._bnode - 1}"

    def emit(self, s: str, p: str, o: str) -> None:
        st = s if s.startswith("_:") else f"<{s}>"
        ot = o if (o.startswith("_:") or o.startswith('"')) else f"<{o}>"
        self.triples.append(f"{st} <{p}> {ot} .")

    # -- node elements ----------------------------------------------------

    def node_element(self, el: ET.Element, base: str) -> str:
        base = el.get(_XML + "base", base)
        about = el.get(_RDF + "about")
        rid = el.get(_RDF + "ID")
        node_id = el.get(_RDF + "nodeID")
        if about is not None:
            subj = urljoin(base, about) if base else about
        elif rid is not None:
            subj = urljoin(base, "#" + rid) if base else "#" + rid
        elif node_id is not None:
            subj = "_:" + node_id
        else:
            subj = self.new_bnode()
        tag_uri = _uri(el.tag)
        if tag_uri != RDF_NS + "Description":
            self.emit(subj, RDF_NS + "type", tag_uri)
        # property attributes (literal shorthand)
        for attr, val in el.attrib.items():
            if attr in _SYNTAX_ATTRS or attr.startswith(_RDF) or attr.startswith(_XML):
                continue
            self.emit(subj, _uri(attr), f'"{_escape_literal(val)}"')
        for child in el:
            self.property_element(subj, child, base)
        return subj

    # -- property elements ------------------------------------------------

    def property_element(self, subj: str, el: ET.Element, base: str) -> None:
        base = el.get(_XML + "base", base)
        pred = _uri(el.tag)
        parse_type = el.get(_RDF + "parseType")
        resource = el.get(_RDF + "resource")
        node_id = el.get(_RDF + "nodeID")
        datatype = el.get(_RDF + "datatype")
        lang = el.get(_XML + "lang")

        if parse_type == "Resource":
            b = self.new_bnode()
            self.emit(subj, pred, b)
            for child in el:
                self.property_element(b, child, base)
            return
        if parse_type == "Collection":
            items = [self.node_element(child, base) for child in el]
            head = RDF_NS + "nil" if not items else self.new_bnode()
            self.emit(subj, pred, head)
            cur = head
            for i, item in enumerate(items):
                self.emit(cur, RDF_NS + "first", item)
                nxt = RDF_NS + "nil" if i == len(items) - 1 else self.new_bnode()
                self.emit(cur, RDF_NS + "rest", nxt)
                cur = nxt
            return
        if parse_type == "Literal":
            inner = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in el
            )
            self.emit(subj, pred,
                      f'"{_escape_literal(inner)}"^^<{RDF_NS}XMLLiteral>')
            return
        if resource is not None:
            self.emit(subj, pred, urljoin(base, resource) if base else resource)
            return
        if node_id is not None:
            self.emit(subj, pred, "_:" + node_id)
            return
        children = list(el)
        if children:
            for child in children:
                obj = self.node_element(child, base)
                self.emit(subj, pred, obj)
            return
        # literal (possibly empty)
        text = el.text or ""
        lit = f'"{_escape_literal(text)}"'
        if datatype:
            lit += f"^^<{datatype}>"
        elif lang:
            lit += f"@{lang}"
        self.emit(subj, pred, lit)


def rdfxml_to_nt(source: str | bytes) -> str:
    """RDF/XML document (path or bytes) → N-Triples text, deterministically."""
    if isinstance(source, bytes):
        root = ET.parse(io.BytesIO(source)).getroot()
    else:
        root = ET.parse(source).getroot()
    conv = _Converter()
    base = root.get(_XML + "base", "")
    if _uri(root.tag) == RDF_NS + "RDF":
        for el in root:
            conv.node_element(el, base)
    else:  # document whose root IS a node element
        conv.node_element(root, base)
    return "\n".join(conv.triples) + ("\n" if conv.triples else "")
