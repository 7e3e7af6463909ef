"""Differential: the Spark CURIE functions vs verbatim ports of the
reference's PrefixManager kernels (kgx/prefix_manager.py:40-78,104-248) and
the prefixcommons.curie_util kernels they delegate to
(kgx/utils/kgx_utils.py:223-305). prefixcommons is not installable in this
sandbox, so contract_uri/expand_uri are reconstructed from the published
biolink/prefixcommons-py source and validated against every row the
reference's own suite pins (tests/unit/test_prefix_manager.py) before being
used as the differential yardstick.

The DuckDB oracle (curie_roundtrip) replays the repo's own expression, so
only an independent-kernel comparison adjudicates parity here — the class
that caught the infores, normalize_url, and case-converter bugs. This test
drove three parity fixes (exact-namespace shortform in contract; CURIE-shape
gating of curie_prefix/curie_reference; split-prefix keying of expand's
map-hit path). Deliberate remaining divergences, each pinned below WITH its
reference citation:

D1. overlapping namespaces: contract_uri collects matches in dict ITERATION
    order and the reference takes curie_list[0] (kgx_utils.py:253-266), so
    {'OBO': .../obo/, 'GO': .../obo/GO_} contracts GO_0008150 to
    'OBO:GO_0008150' or 'GO:0008150' depending on map insertion order. Ours
    is deterministic longest-namespace-first: 'GO:0008150' regardless —
    same answer as the reference when the most specific prefix comes first,
    stable when it doesn't.
D2. namespace repeated mid-string: contract_uri rewrites with str.replace —
    ALL occurrences (reconstructed kernel below), so a local id that itself
    embeds the namespace gets corrupted ('.../obo/GO_x/.../obo/GO_y' →
    'GO:x/GO:y'). Ours rewrites only the matched head.
D3. is_iri: the reference tests bare startswith('http') — 'httpfoo' and
    'https' count as IRIs (prefix_manager.py:176-196). Ours requires the
    '://' scheme separator.
D4. fallback contexts: the reference's fallback=True consults the
    monarch/obo JSON-LD contexts shipped with prefixcommons
    (kgx_utils.py:249-252) — data files this sandbox doesn't have. The
    ported kernels model them with OBO_CONTEXT, one entry per OBO Foundry
    idspace expanded from the PURL scheme (exactly what obo_context
    contains for the OBO family; the monarch extras are absent on both
    sides). The reference's own pinned HP:0000000 row validates the
    stand-in.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kgx_spark.functions.curie import (
    contract,
    curie_prefix,
    curie_reference,
    expand,
    is_curie,
    is_iri,
    normalize_prefix_map,
)

# --- reconstructed prefixcommons.curie_util kernels --------------------------
# (biolink/prefixcommons-py, public source; validated against the pinned
# reference-test rows in test_pinned_reference_rows before use)

import re


def pc_expand_uri(id: str, cmaps: list[dict]) -> str:
    if id.find(":") > -1:
        prefix, localid = id.split(":", 1)
        for cmap in cmaps:
            if prefix in cmap:
                return cmap[prefix] + localid
    return id


def pc_contract_uri(uri: str, cmaps: list[dict]) -> list[str]:
    curies = []
    for cmap in cmaps:
        for prefix, ns in cmap.items():
            if isinstance(ns, str) and ns and uri.startswith(ns):
                curies.append(uri.replace(ns, prefix + ":"))
    return curies


# --- verbatim ports of the reference orchestration ---------------------------
# kgx_utils.contract/expand (kgx_utils.py:223-305) under
# PrefixManager.contract/expand (prefix_manager.py:104-151), with the
# fallback default_curie_maps modeled by OBO_CONTEXT (D4).

from kgx_spark.functions.curie import OBO_IDSPACES

OBO_CONTEXT = {p: f"http://purl.obolibrary.org/obo/{p}_" for p in sorted(OBO_IDSPACES)}
DEFAULT_CURIE_MAPS = [OBO_CONTEXT]


def ref_contract(uri: str, prefix_map: dict, fallback: bool = True) -> str:
    reverse_prefix_map = {y: x for x, y in prefix_map.items()}
    if reverse_prefix_map and uri in reverse_prefix_map:  # prefix_manager.py:144
        return str(reverse_prefix_map[uri])
    curie = uri  # kgx_utils.py:248-267 below
    curie_list = pc_contract_uri(uri, [prefix_map])
    if len(curie_list) == 0:
        if fallback:
            curie_list = pc_contract_uri(uri, DEFAULT_CURIE_MAPS)
            if curie_list:
                curie = curie_list[0]
    else:
        curie = curie_list[0]
    return str(curie)


def ref_expand(curie: str, prefix_map: dict, fallback: bool = True) -> str:
    uri = pc_expand_uri(curie, [prefix_map])  # kgx_utils.py:294-305
    if uri == curie and fallback:
        uri = pc_expand_uri(curie, DEFAULT_CURIE_MAPS)
    return uri


def ref_is_curie(s: str) -> bool:  # prefix_manager.py:153-174
    return bool(re.match(r"^[^ <()>:]*:[^/ :]+$", s)) if isinstance(s, str) else False


def ref_is_iri(s: str) -> bool:  # prefix_manager.py:176-196
    return s.startswith("http") or s.startswith("https") if isinstance(s, str) else False


def ref_get_prefix(curie: str):  # prefix_manager.py:198-223
    return curie.split(":", 1)[0] if ref_is_curie(curie) else None


def ref_get_reference(curie: str):  # prefix_manager.py:225-248
    return curie.split(":", 1)[1] if ref_is_curie(curie) else None


def ref_set_prefix_map(context: dict) -> dict:  # prefix_manager.py:40-78
    pm = {}
    for k, v in context.items():
        pm[k] = v if isinstance(v, str) else v.get("@id")
    if "biolink" not in pm:
        pm["biolink"] = pm["@vocab"] if "@vocab" in pm else "https://w3id.org/biolink/vocab/"
    if "owlstar" not in pm:
        pm["owlstar"] = "http://w3id.org/owlstar/"
    if "@vocab" in pm:
        del pm["@vocab"]
    if "MONARCH" not in pm:
        pm["MONARCH"] = "https://monarchinitiative.org/"
        pm["MONARCH_NODE"] = "https://monarchinitiative.org/MONARCH_"
    if "" not in pm:
        pm[""] = "https://www.example.org/UNKNOWN/"
    return pm


# --- fixtures ----------------------------------------------------------------

# namespaces mutually prefix-free (keeps D1 out of the parity sweep — the
# overlap case is pinned separately) and absent from every local id (D2 out).
PM = {
    "biolink": "https://w3id.org/biolink/vocab/",
    "GO": "http://purl.obolibrary.org/obo/GO_",
    "HGNC": "http://identifiers.org/hgnc/",
    "": "https://www.example.org/UNKNOWN/",
    "CHEMBL.COMPOUND": "https://www.ebi.ac.uk/chembl/compound/",
}

INPUTS = [
    # every CURIE row the reference's own suite pins
    "GO:0008150", "CHEMBL.COMPOUND:12345", "HP:0000000", "GO_0008150",
    "12345", ":12345",
    # every contract/expand row it pins (for prefixes present in PM)
    "http://purl.obolibrary.org/obo/GO_0008150",
    "https://w3id.org/biolink/vocab/category",
    "https://w3id.org/biolink/vocab/NamedThing",
    "http://identifiers.org/hgnc/1103", "HGNC:1103",
    "biolink:category", "biolink:NamedThing",
    # exact-namespace shortform (prefix_manager.py:144 — bare prefix)
    "https://w3id.org/biolink/vocab/", "http://identifiers.org/hgnc/",
    "https://www.example.org/UNKNOWN/",
    # empty-prefix namespace members / odd shapes
    "https://www.example.org/UNKNOWN/abc", "GO:0008150/x", "biolink:",
    "http://unknown.example/x", "httpfoo", "https", "a:b:c", "GO: x",
    "biolink:related to", "GO:0008150 ",
    # fallback-context paths (OBO stand-in — D4)
    "HP:0000000", "http://purl.obolibrary.org/obo/HP_0000000",
    "HP:0000000/x", "http://purl.obolibrary.org/obo/FAKE_1",
    "APOLLO_SV:00000123", "http://purl.obolibrary.org/obo/APOLLO_SV_00000123",
    "NCBITaxon:9606", "MONDO:0005148",
]


def _spark_eval(spark, values, cols: dict):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select(*[c.alias(k) for k, c in cols.items()]).collect()
    return {k: [r[k] for r in out] for k in cols}


def test_pinned_reference_rows():
    """The reconstructed prefixcommons kernels reproduce every expand/contract
    row the reference's own test suite pins (tests/unit/test_prefix_manager.py
    rows whose prefixes live outside the unavailable fallback contexts)."""
    assert ref_expand("biolink:category", PM) == "https://w3id.org/biolink/vocab/category"
    assert ref_expand("biolink:NamedThing", PM) == "https://w3id.org/biolink/vocab/NamedThing"
    assert ref_expand("HGNC:1103", PM) == "http://identifiers.org/hgnc/1103"
    assert ref_expand("GO:0008150", PM) == "http://purl.obolibrary.org/obo/GO_0008150"
    assert ref_contract("https://w3id.org/biolink/vocab/category", PM) == "biolink:category"
    assert ref_contract("http://identifiers.org/hgnc/1103", PM) == "HGNC:1103"
    assert ref_contract("http://purl.obolibrary.org/obo/GO_0008150", PM) == "GO:0008150"
    # rows that exercise the fallback contexts in the reference suite —
    # these validate the OBO_CONTEXT stand-in (D4)
    assert ref_expand("HP:0000000", PM) == "http://purl.obolibrary.org/obo/HP_0000000"
    assert ref_contract("http://purl.obolibrary.org/obo/HP_0000000", PM) == "HP:0000000"


def test_differential_fixed_inputs(spark):
    got = _spark_eval(
        spark,
        INPUTS,
        {
            "contract": contract(F.col("v"), PM),
            "expand": expand(F.col("v"), PM),
            "pfx": curie_prefix(F.col("v")),
            "ref_": curie_reference(F.col("v")),
            "is_c": is_curie(F.col("v")),
        },
    )
    for i, v in enumerate(INPUTS):
        assert got["contract"][i] == ref_contract(v, PM), f"contract({v!r})"
        assert got["expand"][i] == ref_expand(v, PM), f"expand({v!r})"
        assert got["pfx"][i] == ref_get_prefix(v), f"get_prefix({v!r})"
        assert got["ref_"][i] == ref_get_reference(v), f"get_reference({v!r})"
        assert got["is_c"][i] == ref_is_curie(v), f"is_curie({v!r})"


def test_is_iri_divergence_d3(spark):
    """Parity on real IRIs; D3 pinned on the reference's bare-'http' match."""
    vals = ["https://example.org/123", "http://example.org/ABC",
            "http://purl.obolibrary.org/obo/GO_0008150", "GO:0008150"]
    got = _spark_eval(spark, vals, {"i": is_iri(F.col("v"))})
    assert got["i"] == [ref_is_iri(v) for v in vals]
    # D3: no scheme separator — reference says IRI, we say no
    assert ref_is_iri("httpfoo") and ref_is_iri("https")
    d3 = _spark_eval(spark, ["httpfoo", "https"], {"i": is_iri(F.col("v"))})
    assert d3["i"] == [False, False]


def test_overlap_divergence_d1(spark):
    """Overlapping namespaces: the reference's answer depends on dict
    insertion order (kgx_utils.py:253-266 takes curie_list[0]); ours is
    longest-namespace-first either way."""
    generic_first = {"OBO": "http://purl.obolibrary.org/obo/",
                     "GO": "http://purl.obolibrary.org/obo/GO_"}
    specific_first = dict(reversed(list(generic_first.items())))
    uri = "http://purl.obolibrary.org/obo/GO_0008150"
    assert ref_contract(uri, generic_first) == "OBO:GO_0008150"
    assert ref_contract(uri, specific_first) == "GO:0008150"
    for pm in (generic_first, specific_first):
        got = _spark_eval(spark, [uri], {"c": contract(F.col("v"), pm)})
        assert got["c"] == ["GO:0008150"]


def test_midstring_divergence_d2(spark):
    """Namespace repeated inside the local id: str.replace corrupts the tail
    in the reference kernel; ours rewrites only the head."""
    pm = {"GO": "http://purl.obolibrary.org/obo/GO_"}
    uri = "http://purl.obolibrary.org/obo/GO_x/http://purl.obolibrary.org/obo/GO_y"
    assert ref_contract(uri, pm) == "GO:x/GO:y"
    got = _spark_eval(spark, [uri], {"c": contract(F.col("v"), pm)})
    assert got["c"] == ["GO:x/http://purl.obolibrary.org/obo/GO_y"]


def test_normalize_prefix_map_port():
    """normalize_prefix_map == the ported set_prefix_map on JSON-LD shapes:
    @id dicts, @vocab promotion, fixed defaults, empty-prefix default."""
    contexts = [
        {"GO": {"@id": "http://purl.obolibrary.org/obo/GO_"}, "x": "http://x/"},
        {"@vocab": "https://vocab.example/", "HGNC": "http://identifiers.org/hgnc/"},
        {"biolink": "https://w3id.org/biolink/vocab/", "": "http://mine/"},
        {},
    ]
    for ctx in contexts:
        assert normalize_prefix_map(dict(ctx)) == ref_set_prefix_map(dict(ctx))


_local = st.text(
    st.characters(codec="ascii", exclude_characters=" <()>:/\x00\n\r\t"),
    min_size=1, max_size=12)
_curie_like = st.builds(
    lambda p, l: f"{p}:{l}",
    st.sampled_from(sorted(PM) + ["UNKNOWNPFX", "http", "https",
                                  "HP", "APOLLO_SV", "NCBITaxon"]), _local)
_uri_like = st.builds(lambda ns, l: ns + l, st.sampled_from(sorted(PM.values())), _local)
# \n/\r excluded: Python-re vs Java-regex line-terminator conventions around
# '$' are engine trivia, not kernel semantics (both references pin none).
_junk = st.text(st.characters(codec="ascii", exclude_characters="\x00\n\r"), max_size=20)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(_curie_like, _uri_like, _junk), min_size=1, max_size=25))
def test_differential_hypothesis(spark, values):
    # D2 exclusion: drop inputs where a namespace recurs past the head
    values = [v for v in values
              if not any(v.count(ns) > (1 if v.startswith(ns) else 0)
                         for ns in PM.values())]
    if not values:
        return
    got = _spark_eval(
        spark, values,
        {
            "contract": contract(F.col("v"), PM),
            "expand": expand(F.col("v"), PM),
            "pfx": curie_prefix(F.col("v")),
            "ref_": curie_reference(F.col("v")),
            "is_c": is_curie(F.col("v")),
        },
    )
    for i, v in enumerate(values):
        assert got["contract"][i] == ref_contract(v, PM), f"contract({v!r})"
        assert got["expand"][i] == ref_expand(v, PM), f"expand({v!r})"
        assert got["pfx"][i] == ref_get_prefix(v), f"get_prefix({v!r})"
        assert got["ref_"][i] == ref_get_reference(v), f"get_reference({v!r})"
        assert got["is_c"][i] == ref_is_curie(v), f"is_curie({v!r})"
