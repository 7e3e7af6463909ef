"""Differential: the Spark sanitize operators vs VERBATIM Python ports of the
reference's sanitize kernels (kgx/utils/kgx_utils.py:796-1064 —
sanitize_import/_sanitize_import_property, build_export_row/
_sanitize_export_property, remove_null/is_null).

The DuckDB oracles replay the repo's own expressions, so only an
independent-kernel comparison can adjudicate parity here (the differential
class that caught the infores, normalize_url, and case-converter bugs).

The reference kernel is per-VALUE and dynamically typed; a DataFrame column
has ONE type, so parity is claimed per column class, with every deliberate
divergence pinned explicitly below WITH its reference citation:

D1. list elements equal to ' ': the reference keeps them (its `if x` split
    filter drops only '' — kgx_utils.py:861), we null-scrub them like every
    other cell (is_null treats ' ' as null — kgx_utils.py:1063).
D2. '\r': the reference scrubs only '\n'/'\t' (kgx_utils.py:856-858); we
    scrub '\r' too (bare-CR line endings in crawl data).
D3. empty input on a declared list column: the reference drops the key
    (remove_null → None — kgx_utils.py:816), we yield [] (a DataFrame cell
    can't be absent; both serialize to the same empty TSV cell).
D4. negated: the reference casts with Python bool() (kgx_utils.py:877-881),
    so ANY non-empty string — including "False" and "no" — becomes True; we
    parse ("false"/"f"/"0"/"no"/"n" → False). Reproducing bool() would
    destroy every stringly-typed negation flag.
D5. core scalar columns (name, description, id, …): NOT in the reference's
    column_types, so its else-branch SPLITS any value containing the
    delimiter (kgx_utils.py:893-896) — a node name 'Foo|Bar' becomes a
    list. We declare them SINGLE_VALUED and never sniff them: a column
    cannot be mixed str/list, and splitting names is data loss.
D6. sniffed undeclared columns adopt the declared-list sanitization
    (dedupe+sort — kgx_utils.py:864-871); the reference's undeclared split
    keeps duplicates and order (kgx_utils.py:896). One column, one rule.
D7. export drops falsy values in the reference (`if new_value:` —
    kgx_utils.py:930), so negated=False vanishes; we export "False".
"""

import pyspark.sql.functions as F
import pytest

from kgx_spark.operators.sanitize import sanitize_export, sanitize_import

# --- verbatim ports (kgx_utils.py:796-909, 912-1005, 1008-1064) -------------

REF_COLUMN_TYPES = {
    "publications": list, "qualifiers": list, "category": list,
    "synonym": list, "same_as": list, "negated": bool, "xrefs": list,
    "knowledge_source": str, "primary_knowledge_source": str,
    "original_knowledge_source": str,
    "aggregator_knowledge_source": list, "supporting_data_source": list,
    "provided_by": list,
}


def ref_is_null(item):
    return item is None or (isinstance(item, str) and item in ("", " "))


def ref_remove_null(value):
    new_value = None
    if isinstance(value, (list, set, tuple)):
        new_value = []
        for v in value:
            x = ref_remove_null(v)
            if x:
                new_value.append(x)
    elif isinstance(value, str):
        if not ref_is_null(value):
            new_value = value
    else:
        if not ref_is_null(value):
            new_value = value
    return new_value


def ref_sanitize_import_property(key, value, list_delimiter, multivalued_slots=frozenset()):
    # kgx_utils.py:826-909, branch-faithful
    if key in REF_COLUMN_TYPES:
        if REF_COLUMN_TYPES[key] == list:
            if isinstance(value, (list, set, tuple)):
                value = [
                    v.replace("\n", " ").replace("\t", " ") if isinstance(v, str) else v
                    for v in value
                ]
                new_value = list(value)
            elif isinstance(value, str):
                value = value.replace("\n", " ").replace("\t", " ")
                new_value = [x for x in value.split(list_delimiter) if x] if list_delimiter else [value]
            else:
                new_value = [str(value).replace("\n", " ").replace("\t", " ")]
            new_value = sorted(set(new_value))
        elif REF_COLUMN_TYPES[key] == bool:
            try:
                new_value = bool(value)
            except Exception:
                new_value = False
        elif isinstance(value, (str, float)):
            new_value = value
        else:
            new_value = str(value).replace("\n", " ").replace("\t", " ")
    else:
        if isinstance(value, (list, set, tuple)):
            value = [
                v.replace("\n", " ").replace("\t", " ") if isinstance(v, str) else v
                for v in value
            ]
            new_value = list(value)
        elif isinstance(value, str):
            if list_delimiter and list_delimiter in value:
                value = value.replace("\n", " ").replace("\t", " ")
                new_value = [x for x in value.split(list_delimiter) if x]
            elif key in multivalued_slots:
                new_value = [value]
            else:
                new_value = value.replace("\n", " ").replace("\t", " ")
        elif isinstance(value, bool):
            new_value = bool(value)
        elif isinstance(value, (str, float)):
            new_value = value
        else:
            new_value = str(value).replace("\n", " ").replace("\t", " ")
    return new_value


def ref_sanitize_import(data, list_delimiter="|"):
    tidy = {}
    for key, value in data.items():
        new_value = ref_remove_null(value)
        if new_value is not None:
            tidy[key] = ref_sanitize_import_property(key, new_value, list_delimiter)
    return tidy


def ref_sanitize_export_property(key, value, list_delimiter="|"):
    # kgx_utils.py:941-1005, branch-faithful (column_types mutation dropped —
    # it only memoizes the dynamic decision)
    def scrub(s):
        return s.replace("\n", " ").replace('\\"', "").replace("\t", " ")

    if key in REF_COLUMN_TYPES:
        if REF_COLUMN_TYPES[key] == list:
            if isinstance(value, (list, set, tuple)):
                value = [scrub(v) if isinstance(v, str) else v for v in value]
                return list_delimiter.join(str(x) for x in value) if list_delimiter else value
            return scrub(str(value))
        if REF_COLUMN_TYPES[key] == bool:
            return bool(value)
        return scrub(str(value))
    if type(value) == list:  # noqa: E721 — the reference uses type()==
        value = [scrub(v) if isinstance(v, str) else v for v in value]
        return list_delimiter.join(str(x) for x in value) if list_delimiter else value
    if type(value) == bool:  # noqa: E721
        return bool(value)
    return scrub(str(value))


def ref_build_export_row(data, list_delimiter="|"):
    tidy = {}
    for key, value in data.items():
        new_value = ref_remove_null(value)
        if new_value:  # TRUTHY — drops False/''/[] (kgx_utils.py:930)
            tidy[key] = ref_sanitize_export_property(key, new_value, list_delimiter)
    return tidy


# --- harness -----------------------------------------------------------------


def spark_import_column(spark, colname, values, sniff=False):
    df = spark.createDataFrame([(v,) for v in values], f"{colname} string")
    return [r[colname] for r in sanitize_import(df, sniff=sniff).collect()]


# --- differentials ------------------------------------------------------------

LIST_CORPUS = [
    "b|a|b", "a", "x\ty", "a||b", "one two", "z|a\nb|z", "|a|", "a|a|a",
    "CURIE:1|CURIE:2", "trailing|", "|", "a b|c d", "x" * 50 + "|y",
]


def test_declared_list_column_matches_kernel(spark):
    """Declared multivalued columns (synonym): exact kernel parity on every
    input outside the D1-D3 classes."""
    got = spark_import_column(spark, "synonym", LIST_CORPUS)
    for raw, ours in zip(LIST_CORPUS, got):
        want = ref_sanitize_import({"synonym": raw})
        assert ours == want.get("synonym"), raw


def test_declared_list_divergences_pinned(spark):
    """D1 (' ' elements), D2 ('\\r'), D3 (empty → [] not absent) — the exact
    divergence shapes, so any drift on either side surfaces here."""
    got = spark_import_column(spark, "synonym", ["a| |b", "x\ry", "", " "])
    # D1: reference keeps the ' ' element
    assert ref_sanitize_import({"synonym": "a| |b"})["synonym"] == [" ", "a", "b"]
    assert got[0] == ["a", "b"]
    # D2: reference passes '\r' through
    assert ref_sanitize_import({"synonym": "x\ry"})["synonym"] == ["x\ry"]
    assert got[1] == ["x y"]
    # D3: reference drops the key entirely
    assert "synonym" not in ref_sanitize_import({"synonym": ""})
    assert got[2] == [] and got[3] == []


def test_negated_bool_divergence_pinned(spark):
    """D4: the reference's bool() makes every non-empty string True —
    including 'False' and 'no' (kgx_utils.py:877-881). We parse."""
    assert ref_sanitize_import({"negated": "False"})["negated"] is True
    assert ref_sanitize_import({"negated": "no"})["negated"] is True
    got = spark_import_column(spark, "negated", ["False", "no", "true", "1"])
    assert got == [False, False, True, True]
    # on actual booleans the two agree
    df = spark.createDataFrame([(True,), (False,)], "negated boolean")
    ours = [r["negated"] for r in sanitize_import(df).collect()]
    assert ours == [True, False]
    assert ref_sanitize_import({"negated": True})["negated"] is True
    # remove_null drops nothing here: False is not null (kgx_utils.py:1063)
    assert ref_remove_null(False) is False


def test_core_scalar_sniff_divergence_pinned(spark):
    """D5: the reference SPLITS a delimiter-bearing name/description (not in
    its column_types → else-branch, kgx_utils.py:893-896); we keep core
    scalars scalar even under sniff=True."""
    assert ref_sanitize_import({"name": "Foo|Bar"})["name"] == ["Foo", "Bar"]
    got = spark_import_column(spark, "name", ["Foo|Bar"], sniff=True)
    assert got == ["Foo|Bar"]


def test_undeclared_sniffed_column_vs_kernel(spark):
    """Undeclared delimiter-bearing columns: both sides split; D6 pins the
    dedupe+sort delta (reference keeps duplicates and order)."""
    vals = ["b|a", "x|x|y", "m|n"]
    got = spark_import_column(spark, "custom_tag", vals, sniff=True)
    for raw, ours in zip(vals, got):
        ref = ref_sanitize_import({"custom_tag": raw})["custom_tag"]
        assert ours == sorted(set(ref)), raw
    assert ref_sanitize_import({"custom_tag": "x|x|y"})["custom_tag"] == ["x", "x", "y"]
    # delimiterless value in a sniffed column: reference keeps it scalar
    # (per-value decision), our column model wraps it — the mixed-type wart
    # a DataFrame cannot (and should not) reproduce
    assert ref_sanitize_import({"custom_tag": "solo"})["custom_tag"] == "solo"
    got2 = spark_import_column(spark, "custom_tag", ["a|b", "solo"], sniff=True)
    assert got2 == [["a", "b"], ["solo"]]


def test_plain_string_column_matches_kernel(spark):
    """Undeclared plain strings (no delimiter anywhere): exact parity —
    \\n/\\t scrub, ''/' ' → null/absent."""
    vals = ["plain", "two words", "tab\there", "line\nbreak", "", " "]
    got = spark_import_column(spark, "custom_note", vals, sniff=True)
    for raw, ours in zip(vals, got):
        want = ref_sanitize_import({"custom_note": raw}).get("custom_note")
        assert ours == want, raw


def test_export_matches_kernel(spark):
    """Export scrub parity: \\n/\\t → space, literal backslash-quote removed,
    lists joined element-scrubbed, True → 'True' (kgx_utils.py:963-1005)."""
    df = spark.createDataFrame(
        [("A:1", ["x\ny", 'ha\\"s'], 'tab\there\\"q', True)],
        "id string, synonym array<string>, description string, negated boolean",
    )
    row = sanitize_export(df).first()
    ref = ref_build_export_row(
        {"id": "A:1", "synonym": ["x\ny", 'ha\\"s'], "description": 'tab\there\\"q', "negated": True}
    )
    assert row["synonym"] == ref["synonym"] == "x y|has"
    # NB the reference scrubs '\\"' before '\t', so no space appears where
    # the quote sequence sat — ours matches that composition order
    assert row["description"] == ref["description"] == "tab hereq"
    assert row["id"] == ref["id"]
    assert row["negated"] == str(ref["negated"]) == "True"


def test_export_falsy_drop_divergence_pinned(spark):
    """D7: the reference's `if new_value:` drops negated=False on export; we
    keep 'False' (dropping a negation flag silently is data loss)."""
    assert "negated" not in ref_build_export_row({"negated": False})
    df = spark.createDataFrame([(False,)], "negated boolean")
    assert sanitize_export(df).first()["negated"] == "False"


def test_kernel_port_matches_reference_pins():
    """The ports reproduce the reference's own pinned expectations
    (tests/unit/test_kgx_utils.py sanitize/build_export_row tests) before we
    trust them as oracles."""
    d = ref_sanitize_import({"id": "A:1", "category": "biolink:Gene", "name": "A"})
    assert d == {"id": "A:1", "category": ["biolink:Gene"], "name": "A"}
    e = ref_build_export_row({"id": "A:1", "category": ["biolink:Gene"], "name": "A"})
    assert e == {"id": "A:1", "category": "biolink:Gene", "name": "A"}
