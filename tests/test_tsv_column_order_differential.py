"""Differential: kgx_spark.schema.ordered_columns vs VERBATIM Python ports of
the reference's TSV column-ordering comparators
(kgx/sink/tsv_sink.py:162-238 _order_node_columns/_order_edge_columns).

The tsv_tar_roundtrip oracle replays our own column order, so only an
independent kernel port can adjudicate parity (the differential class that
caught the infores, normalize_url, and case-converter bugs). Pure Python —
no Spark session needed.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from kgx_spark.schema import EDGE_CORE_ORDER, NODE_CORE_ORDER, ordered_columns

# --- verbatim ports (tsv_sink.py:162-238; OrderedSet → insertion-ordered
# dict keys, the only behavior the kernel uses: add/update preserve first-
# insertion order, membership, remove) ----------------------------------------


class _OrderedSet:
    def __init__(self, items=()):
        self._d = dict.fromkeys(items)

    def add(self, item):
        self._d.setdefault(item)

    def update(self, items):
        for i in items:
            self._d.setdefault(i)

    def __iter__(self):
        return iter(self._d)


def ref_order_node_columns(cols: set) -> list:
    node_columns = cols.copy()
    core_columns = _OrderedSet(
        ["id", "category", "name", "description", "xref", "provided_by",
         "synonym", "exact_synonym", "broad_synonym", "narrow_synonym",
         "related_synonym"]
    )
    out = _OrderedSet()
    for c in core_columns:
        if c in node_columns:
            out.add(c)
            node_columns.remove(c)
    internal_columns = set()
    remaining_columns = node_columns.copy()
    for c in node_columns:
        if c.startswith("_"):
            internal_columns.add(c)
            remaining_columns.remove(c)
    out.update(sorted(remaining_columns))
    out.update(sorted(internal_columns))
    return list(out)


def ref_order_edge_columns(cols: set) -> list:
    edge_columns = cols.copy()
    core_columns = _OrderedSet(
        ["id", "subject", "predicate", "object", "category", "relation",
         "provided_by"]
    )
    out = _OrderedSet()
    for c in core_columns:
        if c in edge_columns:
            out.add(c)
            edge_columns.remove(c)
    internal_columns = set()
    remaining_columns = edge_columns.copy()
    for c in edge_columns:
        if c.startswith("_"):
            internal_columns.add(c)
            remaining_columns.remove(c)
    out.update(sorted(remaining_columns))
    out.update(sorted(internal_columns))
    return list(out)


# --- differentials -----------------------------------------------------------

_REALISTIC = (
    NODE_CORE_ORDER
    + EDGE_CORE_ORDER
    + ["iri", "same_as", "publications", "knowledge_level", "agent_type",
       "negated", "_invalid", "_version", "zzz_custom", "aaa_custom",
       "UPPER_case", "knowledge_source"]
)

_colname = st.one_of(
    st.sampled_from(_REALISTIC),
    st.text(
        alphabet=st.sampled_from("abz_ABZ019"), min_size=1, max_size=12
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.sets(_colname, max_size=25))
def test_node_order_matches_kernel(cols):
    assert ordered_columns(list(cols), NODE_CORE_ORDER) == ref_order_node_columns(cols)


@settings(max_examples=300, deadline=None)
@given(st.sets(_colname, max_size=25))
def test_edge_order_matches_kernel(cols):
    assert ordered_columns(list(cols), EDGE_CORE_ORDER) == ref_order_edge_columns(cols)


def test_kernel_port_matches_reference_pins():
    """The ports reproduce the reference's own pinned ordering expectations
    (tests/unit/test_sink.py::test_tsv_sink column assertions: core columns
    lead in declared order, extras sorted after, '_'-internal last)."""
    got = ref_order_node_columns({"name", "id", "category", "taxon", "_x"})
    assert got == ["id", "category", "name", "taxon", "_x"]
    got = ref_order_edge_columns({"object", "subject", "predicate", "weight", "id"})
    assert got == ["id", "subject", "predicate", "object", "weight"]


def test_input_order_irrelevant():
    cols = ["zeta", "id", "_int", "name", "alpha"]
    assert ordered_columns(cols, NODE_CORE_ORDER) == ordered_columns(
        list(reversed(cols)), NODE_CORE_ORDER
    )
