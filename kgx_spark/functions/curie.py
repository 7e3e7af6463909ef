"""CURIE/IRI column expressions.

Reference: kgx/prefix_manager.py
- contract (URI → CURIE, longest-match reverse prefix map): 126-151
- expand (CURIE → URI): 104-124
- is_curie regex: 153-174; is_iri: 176-196
- get_prefix / get_reference: 198-248

The reference LRU-caches per-string Python calls; here the prefix map is a
plain dict baked into a generated expression (for small maps) — at cluster
scale the map is broadcast once per job and the expression is codegen'd
JVM-side, so there is no per-row Python and no executor-side library call.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Subset of the Biolink JSON-LD context the reference loads at
# kgx/prefix_manager.py:50-76; enough for tests — callers pass their own map.
DEFAULT_PREFIX_MAP: dict[str, str] = {
    "biolink": "https://w3id.org/biolink/vocab/",
    "HGNC": "http://identifiers.org/hgnc/",
    "NCBIGene": "http://identifiers.org/ncbigene/",
    "ENSEMBL": "http://identifiers.org/ensembl/",
    "MONDO": "http://purl.obolibrary.org/obo/MONDO_",
    "GO": "http://purl.obolibrary.org/obo/GO_",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "PMID": "http://www.ncbi.nlm.nih.gov/pubmed/",
}

CURIE_REGEX = r"^[^ <()>:]*:[^/ :]+$"  # kgx/prefix_manager.py:166

# OBO Foundry idspaces (public registry, obofoundry.org) — the prefixes the
# generic PURL rule `http://purl.obolibrary.org/obo/{PFX}_{ref}` is valid
# for. BOTH fallbacks gate on it, mirroring the reference's fallback
# obo_context (one entry per registered ontology): expand() won't fabricate
# OBO URIs for unknown prefixes (UNIPROT, doi, infores, ...), and
# contract() leaves unregistered 'obo/FAKE_1' PURLs as URIs.
OBO_IDSPACES = frozenset(
    """AEO AGRO AISM AMPHX APO APOLLO_SV ARO BCO BFO BSPO BTO CARO CDAO CDNO
    CHEBI CHIRO CHMO CIDO CIO CL CLAO CLO CLYH CMO COB COLAO CRO CTENO CTO
    CVDO DDANAT DDPHENO DIDEO DISDRIV DOID DPO DRON DUO ECAO ECO ECOCORE
    ECTO EMAPA ENVO EPIO EUPATH ExO FAO FBbt FBcv FBdv FIDEO FLOPO FMA FOBI
    FOODON FOVT FYPO GECKO GENEPIO GENO GEO GNO GO GSSO HANCESTRO HAO HOM HP
    HSAPDV HTN IAO ICEO ICO IDO INO KISAO LABO LEPAO MA MAMO MAXO MCO MF
    MFMO MFOEM MFOMD MI MIAPA MICRO MMO MMUSDV MOD MONDO MOP MP MPATH MPIO
    MRO MS NBO NCBITaxon NCIT NCRO NGBO NOMEN OAE OARCS OBA OBCS OBI OBIB
    OGG OGMS OGSF OHD OHMI OHPI OMIT OMO OMP OMRSE ONE ONS ONTOAVIDA
    ONTONEO OOSTT OPL OPMI ORNASEQ OVAE PATO PCO PDRO PDUMDV PECO PLANA
    PLANP PO PORO PPO PR PROCO PSDO PSO PW RBO REX RO RS RXNO SBO SCDO
    SEPIO SIBO SO SPD STATO SWO SYMP TAXRANK TO TRANS TTO TXPO UBERON UO
    UPHENO VBO VO VT VTO WBbt WBls WBPhenotype XAO XCO XLMOD XPO ZECO ZFA
    ZFS ZP""".split()
)


def normalize_prefix_map(context: dict) -> dict[str, str]:
    """JSON-LD context → plain prefix map (prefix_manager.py:40-78 port).

    Mirrors ``PrefixManager.set_prefix_map``: dict entries collapse to their
    ``@id``; ``biolink`` defaults from ``@vocab`` (else the w3id vocab URI)
    and ``@vocab`` itself is dropped; ``owlstar``/``MONARCH``/
    ``MONARCH_NODE`` get the reference's fixed defaults; the empty prefix
    maps to the reference's DEFAULT_NAMESPACE unless the context set one.
    """
    pm: dict[str, str] = {}
    for k, v in context.items():
        pm[k] = v if isinstance(v, str) else v.get("@id")
    if "biolink" not in pm:
        pm["biolink"] = pm.get("@vocab", "https://w3id.org/biolink/vocab/")
    if "owlstar" not in pm:
        pm["owlstar"] = "http://w3id.org/owlstar/"
    pm.pop("@vocab", None)
    if "MONARCH" not in pm:
        pm["MONARCH"] = "https://monarchinitiative.org/"
        pm["MONARCH_NODE"] = "https://monarchinitiative.org/MONARCH_"
    if "" not in pm:
        pm[""] = "https://www.example.org/UNKNOWN/"
    return pm


def is_curie(col: Column) -> Column:
    """Column<bool>: value matches the CURIE shape (prefix_manager.py:153-174)."""
    return col.rlike(CURIE_REGEX)


def is_iri(col: Column) -> Column:
    """Column<bool>: value starts with http/https (prefix_manager.py:176-196)."""
    return col.startswith("http://") | col.startswith("https://")


def curie_prefix(col: Column) -> Column:
    """Prefix before the first ':', null unless CURIE-shaped
    (prefix_manager.py:198-223 — the reference returns None for any value
    that fails ``is_curie``, so ``http://...`` yields null, not ``http``)."""
    return F.when(is_curie(col), F.split_part(col, F.lit(":"), F.lit(1)))


def curie_reference(col: Column) -> Column:
    """Reference after the first ':', null unless CURIE-shaped
    (prefix_manager.py:225-248)."""
    return F.when(
        is_curie(col),
        F.substring(col, F.length(F.split_part(col, F.lit(":"), F.lit(1))) + 2, 2**30),
    )


def _split_prefix(col: Column) -> Column:
    """Prefix before the first ':' for ANY ':'-bearing string — the
    prefixcommons ``expand_uri`` keying (split(':', 1), no CURIE-shape
    gate), used only inside ``expand``'s map-hit path."""
    return F.when(col.contains(":"), F.split_part(col, F.lit(":"), F.lit(1)))


def _split_local(col: Column) -> Column:
    """Everything after the first ':' (expand_uri's localid)."""
    return F.when(
        col.contains(":"),
        F.substring(col, F.length(F.split_part(col, F.lit(":"), F.lit(1))) + 2, 2**30),
    )


def contract(col: Column, prefix_map: dict[str, str] | None = None) -> Column:
    """URI → CURIE by longest-URI-first prefix match (prefix_manager.py:126-151).

    Generated when/otherwise chain over prefixes sorted by descending URI
    length (longest match wins, as in the reference's reverse map lookup).
    Falls through to the original value when no prefix matches.
    """
    pm = prefix_map or DEFAULT_PREFIX_MAP
    # exact-namespace hit wins and yields the BARE prefix shortform ("always
    # prioritize non-CURIE shortform", prefix_manager.py:140-147: a URI found
    # in reverse_prefix_map returns its prefix with no colon). The reverse
    # map is built dict-comprehension style, so duplicate namespaces
    # collapse last-wins exactly as the reference's {y: x for x, y in ...}.
    reverse = {uri: prefix for prefix, uri in pm.items()}
    shortform = F.element_at(
        F.create_map(*[F.lit(x) for kv in reverse.items() for x in kv]), col
    )
    expr = F.when(shortform.isNotNull(), shortform)
    for prefix, uri in sorted(pm.items(), key=lambda kv: -len(kv[1])):
        hit = col.startswith(uri)
        val = F.concat(F.lit(prefix + ":"), F.substring(col, len(uri) + 1, 2**30))
        expr = F.when(hit, val) if expr is None else expr.when(hit, val)
    # OBO-PURL fallback: http://purl.obolibrary.org/obo/PFX_ref → PFX:ref,
    # gated on PFX being a registered OBO Foundry idspace — mirroring the
    # reference's fallback obo_context (one entry per REGISTERED ontology;
    # an unregistered 'obo/FAKE_1' PURL stays a URI there too,
    # kgx_utils.py:249-266). APOLLO_SV, the one underscore-bearing idspace,
    # gets an explicit alternation so the split lands after the full
    # idspace. Explicit map entries still win (checked first).
    obo_rx = r"^http://purl\.obolibrary\.org/obo/((?:APOLLO_SV)|[A-Za-z][A-Za-z0-9]*)_([^/\s]+)$"
    obo_pfx = F.regexp_extract(col, obo_rx, 1)
    fallback = F.when(
        F.array_contains(F.array(*[F.lit(p) for p in sorted(OBO_IDSPACES)]), obo_pfx),
        F.concat(obo_pfx, F.lit(":"), F.regexp_extract(col, obo_rx, 2)),
    ).otherwise(col)
    return fallback if expr is None else expr.otherwise(fallback)


def expand(col: Column, prefix_map: dict[str, str] | None = None) -> Column:
    """CURIE → URI (prefix_manager.py:104-124).

    Symmetric to ``contract``: map entries win; CURIEs whose prefix is a
    registered OBO Foundry idspace (``OBO_IDSPACES``) expand via the
    generic OBO-PURL rule ``PFX:ref → http://purl.obolibrary.org/obo/
    PFX_ref`` — the inverse of contract's fallback, so contract∘expand is
    lossless across the OBO family (round-3 ADVICE; the reference gets the
    same symmetry from the full Biolink JSON-LD context carrying one entry
    per OBO ontology). Unknown prefixes OUTSIDE the registry (UNIPROT,
    doi, infores, ...) pass through untouched — fabricating OBO URIs for
    them would be wrong, and the reference passes them through too.
    """
    pm = prefix_map or DEFAULT_PREFIX_MAP
    # map-hit path keys on split(':', 1)[0] with NO CURIE-shape gate —
    # prefixcommons expand_uri expands any ':'-bearing string whose prefix
    # is mapped (kgx_utils.py:294-305 delegates straight to it), so
    # 'GO:0008150/x' expands even though is_curie rejects it.
    pfx = _split_prefix(col)
    mapping = F.create_map(*[F.lit(x) for kv in pm.items() for x in kv])
    uri = F.when(pfx.isNotNull(), F.element_at(mapping, pfx))
    # OBO registry fallback — our stand-in for the reference's fallback
    # obo_context — keys on the same ungated split prefix: expand_uri
    # applies identical split semantics to the fallback contexts
    # (kgx_utils.py:294-305), so 'HP:0000118/x' expands there and here.
    obo = F.when(
        F.array_contains(F.array(*[F.lit(p) for p in sorted(OBO_IDSPACES)]), pfx),
        F.concat(
            F.lit("http://purl.obolibrary.org/obo/"), pfx, F.lit("_"), _split_local(col)
        ),
    )
    expanded = F.when(uri.isNotNull(), F.concat(uri, _split_local(col))).otherwise(obo)
    return F.when(expanded.isNotNull(), expanded).otherwise(col)
