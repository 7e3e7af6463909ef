"""Biolink-Model knowledge as broadcastable data (no executor library calls).

Reference: kgx/utils/kgx_utils.py:313-546 calls bmt.Toolkit per record for
category/predicate validity and ancestors; clique_merge.py:388-499 sorts
categories by ancestor count; validator.py:629-744 checks known-class /
known-predicate / non-mixin. SURVEY.md §7.0 mandates the Spark build
precompute these as small tables and broadcast them.

The class/mixin/predicate hierarchies live as plain data in
``biolink_model.py`` (a snapshot of the public Biolink Model). This module
derives the ancestor closures from the parent links at import time — the
same information bmt.Toolkit resolves dynamically, shipped as a ~150-class
broadcastable dict instead of a runtime library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kgx_spark.functions.biolink_model import (
    CLASSES,
    CONTEXT_PREFIXES,
    MIXINS,
    PREDICATES,
    PREFIX_PRIORITY,
    SLOT_TYPES,
)

_B = "biolink:"


def _snake(name: str) -> str:
    out = [name[0].lower()]
    for ch in name[1:]:
        if ch.isupper():
            out.append("_")
            out.append(ch.lower())
        else:
            out.append(ch)
    return "".join(out)


def _mixin_chain(mixin: str) -> list[str]:
    """A mixin plus its is_a ancestors, nearest-first."""
    chain, cur = [], mixin
    while cur is not None and cur not in chain:
        chain.append(cur)
        cur = MIXINS.get(cur)
    return chain


def _class_ancestors(name: str) -> list[str]:
    """Ancestors (excluding self), nearest-first: the is_a chain interleaved
    with each class's mixins — the traversal bmt.Toolkit.get_ancestors
    performs with mixin=True (kgx_utils.py:326-340 get_biolink_ancestors)."""
    order: list[str] = []
    seen: set[str] = {name}

    def push(n: str) -> None:
        if n not in seen:
            seen.add(n)
            order.append(n)

    cur: str | None = name
    while cur is not None:
        parent, mixins = CLASSES[cur]
        # the is_a parent is the primary nearest ancestor; the class's own
        # mixins follow it, then the walk continues up the is_a chain
        if parent is not None:
            push(parent)
        for m in mixins:
            for mm in _mixin_chain(m):
                push(mm)
        cur = parent
    return order


def _predicate_ancestors(name: str) -> list[str]:
    chain, cur, seen = [], PREDICATES.get(name), {name}
    while cur is not None and cur not in seen:
        chain.append(cur)
        seen.add(cur)
        cur = PREDICATES.get(cur)
    return chain


# class CURIE → ancestors (nearest-first, excluding self), mixins included
CATEGORY_ANCESTORS: dict[str, list[str]] = {
    _B + c: [_B + a for a in _class_ancestors(c)] for c in CLASSES
}

# predicate CURIE → ancestors (nearest-first, excluding self)
PREDICATE_ANCESTORS: dict[str, list[str]] = {
    _B + _snake(p): [_B + _snake(a) for a in _predicate_ancestors(p)] for p in PREDICATES
}

KNOWN_CLASSES: frozenset[str] = frozenset(CATEGORY_ANCESTORS)
KNOWN_MIXINS: frozenset[str] = frozenset(_B + m for m in MIXINS)
KNOWN_PREDICATES: frozenset[str] = frozenset(PREDICATE_ANCESTORS)


def ancestors_table(spark: SparkSession) -> DataFrame:
    """(category, ancestor, distance) rows — broadcast side for closures."""
    rows = []
    for cat, ancs in CATEGORY_ANCESTORS.items():
        for d, a in enumerate(ancs, start=1):
            rows.append((cat, a, d))
    return spark.createDataFrame(rows or [("", "", 0)], "category string, ancestor string, distance int")


def specificity_table(spark: SparkSession) -> DataFrame:
    """(category, depth) — depth = ancestor count (mixins included); higher =
    more specific. Used for clique category election (clique_merge.py:474-499
    sorts the category union by ancestor count)."""
    rows = [(cat, len(ancs)) for cat, ancs in CATEGORY_ANCESTORS.items()]
    return spark.createDataFrame(rows, "category string, depth int")


def predicate_table(spark: SparkSession) -> DataFrame:
    """(predicate, ancestor, distance) rows for predicate closures."""
    rows = []
    for pred, ancs in PREDICATE_ANCESTORS.items():
        for d, a in enumerate(ancs, start=1):
            rows.append((pred, a, d))
    return spark.createDataFrame(rows, "predicate string, ancestor string, distance int")


def slot_table(spark: SparkSession) -> DataFrame:
    """(slot, typeof, multivalued) — the validator type battery's broadcast
    side (reference gets this from bmt element metadata, validator.py:402-458)."""
    rows = [(slot, t, mv) for slot, (t, mv) in SLOT_TYPES.items()]
    return spark.createDataFrame(rows, "slot string, typeof string, multivalued boolean")


def prefix_priority(category: str) -> list[str]:
    """Per-class id-prefix ranking (kgx_utils.py:419-438), falling back up the
    is_a chain so e.g. biolink:Snv inherits SequenceVariant's prefixes."""
    if category in PREFIX_PRIORITY:
        return PREFIX_PRIORITY[category]
    for anc in CATEGORY_ANCESTORS.get(category, []):
        if anc in PREFIX_PRIORITY:
            return PREFIX_PRIORITY[anc]
    return []


def context_prefixes() -> frozenset[str]:
    """Prefixes registered in the Biolink JSON-LD context (the validator's
    prefix-vs-context check, validator.py:560-585)."""
    return CONTEXT_PREFIXES


def get_biolink_model_schema(biolink_release: str | None = None) -> str | None:
    """``kgx.config.get_biolink_model_schema`` (config.py:131-145): format
    the raw-GitHub URL for a pinned model release. Accepts bare or
    v-prefixed major.minor.patch SemVer (the reference's two fullmatch
    patterns, config.py:127-128); anything else raises TypeError; ``None``
    returns ``None``. URL construction only — nothing is fetched."""
    import re

    if not biolink_release:
        return None
    if not re.fullmatch(r"v?\d+\.\d+\.\d+", biolink_release):
        raise TypeError(
            "The 'biolink_release' argument '"
            + biolink_release
            + "' is not a properly formatted 'major.minor.patch' semantic version?"
        )
    return (
        "https://raw.githubusercontent.com/biolink/biolink-model/"
        f"{biolink_release}/biolink-model.yaml"
    )
