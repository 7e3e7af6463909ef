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
# for. expand()'s fallback fires ONLY for these, so unknown NON-OBO
# prefixes (UNIPROT, doi, infores, ...) pass through instead of being
# fabricated into bogus OBO URIs; contract()'s fallback needs no list (it
# fires only on genuine purl.obolibrary.org URIs by construction).
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


def is_curie(col: Column) -> Column:
    """Column<bool>: value matches the CURIE shape (prefix_manager.py:153-174)."""
    return col.rlike(CURIE_REGEX)


def is_iri(col: Column) -> Column:
    """Column<bool>: value starts with http/https (prefix_manager.py:176-196)."""
    return col.startswith("http://") | col.startswith("https://")


def curie_prefix(col: Column) -> Column:
    """Prefix before the first ':' (prefix_manager.py:198-223)."""
    return F.when(col.contains(":"), F.split_part(col, F.lit(":"), F.lit(1)))


def curie_reference(col: Column) -> Column:
    """Reference after the first ':' (prefix_manager.py:225-248)."""
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
    expr = None
    for prefix, uri in sorted(pm.items(), key=lambda kv: -len(kv[1])):
        hit = col.startswith(uri)
        val = F.concat(F.lit(prefix + ":"), F.substring(col, len(uri) + 1, 2**30))
        expr = F.when(hit, val) if expr is None else expr.when(hit, val)
    # generic OBO-PURL fallback: http://purl.obolibrary.org/obo/PFX_ref →
    # PFX:ref. The reference's JSON-LD context carries one entry per OBO
    # ontology, all expanded from this same PURL scheme
    # (kgx/prefix_manager.py:50-76 loads the full Biolink context); the
    # generic rule reproduces that for the whole OBO family without baking
    # in hundreds of prefixes. Explicit map entries still win (checked first).
    obo_rx = r"^http://purl\.obolibrary\.org/obo/([A-Za-z][A-Za-z0-9]*)_([^/\s]+)$"
    obo_pfx = F.regexp_extract(col, obo_rx, 1)
    fallback = F.when(
        obo_pfx != "",
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
    pfx = curie_prefix(col)
    mapping = F.create_map(*[F.lit(x) for kv in pm.items() for x in kv])
    uri = F.element_at(mapping, pfx)
    obo = F.when(
        F.array_contains(F.array(*[F.lit(p) for p in sorted(OBO_IDSPACES)]), pfx),
        F.concat(
            F.lit("http://purl.obolibrary.org/obo/"), pfx, F.lit("_"), curie_reference(col)
        ),
    )
    expanded = F.when(uri.isNotNull(), F.concat(uri, curie_reference(col))).otherwise(obo)
    return F.when(is_curie(col) & expanded.isNotNull(), expanded).otherwise(col)
