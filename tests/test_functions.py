"""Scalar-function parity tests (reference: kgx/prefix_manager.py, kgx/utils)."""

import pyspark.sql.functions as F
import pytest

from kgx_spark.functions import (
    camel_case,
    contract,
    curie_prefix,
    curie_reference,
    deterministic_edge_id,
    edge_key,
    expand,
    format_biolink_category,
    format_biolink_slot,
    infores_curie,
    is_curie,
    is_iri,
    sentence_case,
    snake_case,
)


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).first()["v"]


@pytest.mark.parametrize(
    "value,expected",
    [
        ("HGNC:10848", True),
        ("biolink:Gene", True),
        ("http://example.org/x", False),
        ("no colon here", False),
    ],
)
def test_is_curie(spark, value, expected):
    # regex per kgx/prefix_manager.py:166
    assert one(spark, is_curie(F.lit(value))) is expected


def test_is_iri(spark):
    assert one(spark, is_iri(F.lit("https://w3id.org/biolink/vocab/Gene"))) is True
    assert one(spark, is_iri(F.lit("HGNC:123"))) is False


def test_contract_expand_roundtrip(spark):
    iri = "https://w3id.org/biolink/vocab/Gene"
    assert one(spark, contract(F.lit(iri))) == "biolink:Gene"
    assert one(spark, expand(F.lit("biolink:Gene"))) == iri
    # unknown URI passes through contract; prefixes outside the OBO Foundry
    # registry pass through expand UNCHANGED — no fabricated OBO URIs
    assert one(spark, contract(F.lit("http://unknown.example/x"))) == "http://unknown.example/x"
    assert one(spark, expand(F.lit("my-pfx:bar"))) == "my-pfx:bar"
    assert one(spark, expand(F.lit("FOO:bar"))) == "FOO:bar"
    assert one(spark, expand(F.lit("UNIPROT:P12345"))) == "UNIPROT:P12345"
    assert one(spark, expand(F.lit("infores:chembl"))) == "infores:chembl"


def test_contract_expand_obo_symmetry(spark):
    """contract∘expand and expand∘contract are identity across the OBO
    family even for prefixes absent from the explicit map (GO is in the
    default map; the others ride the OBO_IDSPACES registry — including the
    mixed-case NCBITaxon idspace)."""
    for curie in ("GO:0001", "CHEBI:15377", "UBERON:0002107", "NCBITaxon:9606"):
        uri = one(spark, expand(F.lit(curie)))
        assert uri == f"http://purl.obolibrary.org/obo/{curie.replace(':', '_')}"
        assert one(spark, contract(F.lit(uri))) == curie


def test_contract_longest_match(spark):
    # MONDO URI shares the obolibrary host; longest prefix must win
    assert one(spark, contract(F.lit("http://purl.obolibrary.org/obo/MONDO_0005148"))) == "MONDO:0005148"


def test_prefix_reference(spark):
    assert one(spark, curie_prefix(F.lit("HGNC:10848"))) == "HGNC"
    assert one(spark, curie_reference(F.lit("HGNC:10848"))) == "10848"


def test_case_conversions(spark):
    # kgx/utils/kgx_utils.py:116-187 semantics (the reference's own pinned
    # tests: tests/unit/test_kgx_utils.py:95-124)
    assert one(spark, sentence_case(F.lit("NamedThing"))) == "named thing"
    assert one(spark, sentence_case(F.lit("related_to"))) == "related to"
    assert one(spark, snake_case(F.lit("related to"))) == "related_to"
    assert one(spark, format_biolink_category(F.lit("named thing"))) == "biolink:NamedThing"
    assert one(spark, format_biolink_category(F.lit("biolink:Gene"))) == "biolink:Gene"
    assert one(spark, format_biolink_slot(F.lit("related to"))) == "biolink:related_to"
    # acronym behavior — the stringcase/inflection kernels space EVERY
    # non-initial capital and preserve interior caps through camelize
    # (pre-round-6 divergence, COVERAGE.md §2.4, now fixed):
    assert one(spark, sentence_case(F.lit("RNAProduct"))) == "r n a product"
    assert one(spark, camel_case(F.lit("FooBar"))) == "FooBar"
    assert one(spark, camel_case(F.lit("foo BAR"))) == "FooBAR"
    assert one(spark, snake_case(F.lit("RNAProduct"))) == "r_n_a_product"
    # separators before non-lowercase survive sentencecase untouched
    assert one(spark, sentence_case(F.lit("foo_2bar"))) == "foo_2bar"
    # non-biolink CURIEs are (re)formatted, not passed through
    # (reference re.match("biolink:.+", s) — kgx_utils.py:207)
    assert one(spark, format_biolink_category(F.lit("GO:123"))) == "biolink:GO:123"


# --- verbatim ports of the reference's case kernels -------------------------
# stringcase 1.2.0 (camelcase/sentencecase/snakecase) and inflection.camelize
# — the exact functions kgx_utils.py:116-187 delegates to. Neither library
# installs in this sandbox; these are line-faithful reconstructions of the
# published sources, validated against the reference's own pinned tests in
# test_case_conversions above.

def _sc_camelcase(s: str) -> str:
    import re

    s = re.sub(r"^[\-_\.]", "", str(s))
    if not s:
        return s
    return s[0].lower() + re.sub(
        r"[\-_\.\s]([a-z])", lambda m: m.group(1).upper(), s[1:]
    )


def _sc_sentencecase(s: str) -> str:
    import re

    joined = _sc_camelcase(s)
    spaced = re.sub(r"[A-Z]", lambda m: " " + m.group(0).lower(), str(joined))
    stripped = spaced.strip()
    return (stripped[0].upper() + stripped[1:]) if stripped else stripped


def _sc_snakecase(s: str) -> str:
    import re

    s = re.sub(r"[\-\.\s]", "_", str(s))
    if not s:
        return s
    return s[0].lower() + re.sub(
        r"[A-Z]", lambda m: "_" + m.group(0).lower(), s[1:]
    )


def _inf_camelize(s: str) -> str:
    import re

    return re.sub(r"(?:^|_)(.)", lambda m: m.group(1).upper(), s)


def ref_camelcase_to_sentencecase(s: str) -> str:
    return _sc_sentencecase(s).lower()


def ref_sentencecase_to_snakecase(s: str) -> str:
    return _sc_snakecase(s).lower()


def ref_sentencecase_to_camelcase(s: str) -> str:
    return _inf_camelize(_sc_snakecase(s))


def test_case_kernel_ports_match_reference_pins():
    """The ported kernels reproduce the reference's own pinned expectations
    (tests/unit/test_kgx_utils.py:95-124) before we trust them as oracles."""
    assert ref_camelcase_to_sentencecase("NamedThing") == "named thing"
    assert ref_camelcase_to_sentencecase("named_thing") == "named thing"
    assert ref_sentencecase_to_snakecase("named thing") == "named_thing"
    assert ref_sentencecase_to_camelcase("named thing") == "NamedThing"
    # the acronym behavior that motivated the differential
    assert ref_camelcase_to_sentencecase("RNAProduct") == "r n a product"
    assert ref_sentencecase_to_camelcase("FooBar") == "FooBar"


def test_case_differential(spark):
    """Differential: the Spark case expressions vs the VERBATIM kernel ports
    above, over a fuzz corpus of acronym/digit/separator compositions. The
    DuckDB oracle replays the repo's own expressions and is blind to kernel
    drift — this is the independent adjudicator (same class as
    test_infores_differential / test_normalize_url_differential, which each
    caught a real bug).

    Scope: ASCII whitespace only (Python's \\s/strip are Unicode-aware,
    Java's \\s is ASCII; Biolink category/slot names — the reference's only
    inputs — are ASCII). camel_case is exact EXCEPT when the snakecased
    intermediate contains a separator run or leading/trailing '_', where
    inflection.camelize's pair-consumption is pathological — documented
    residual, pinned explicitly below and excluded from the fuzz domain.
    """
    import random
    import re

    from kgx_spark.functions.text import camel_case, sentence_case, snake_case

    pieces = [
        "named", "thing", "RNA", "DNAProduct", "Gene2Phenotype", "v2.1",
        "FooBar", "BAR", "x", "Q", "42", "7up", "a-b", "mixed_Case",
        "", " ", "_", "-", ".", "biolink:", "GO:123", "é'quoted",
    ]
    rng = random.Random(6)
    corpus = ["".join(rng.sample(pieces, rng.randint(1, 5))) for _ in range(300)]
    corpus += [
        "", "x", "X", "_foo", "__foo", "-_foo", " foo", " Foo", "a  b",
        "a _b", "a-B", "RNAProduct", "foo_2bar", "FOO_BAR", "named thing",
    ]

    df = spark.createDataFrame([(s,) for s in corpus], ["src"]).select(
        "src",
        sentence_case(F.col("src")).alias("sent"),
        snake_case(F.col("src")).alias("snake"),
        camel_case(F.col("src")).alias("camel"),
    )
    got = {r["src"]: r for r in df.collect()}

    bad = []
    for s in corpus:
        if got[s]["sent"] != ref_camelcase_to_sentencecase(s):
            bad.append(("sentence", s, got[s]["sent"], ref_camelcase_to_sentencecase(s)))
        if got[s]["snake"] != ref_sentencecase_to_snakecase(s):
            bad.append(("snake", s, got[s]["snake"], ref_sentencecase_to_snakecase(s)))
        inter = _sc_snakecase(s)
        if not re.search(r"^_|_$|__", inter):  # outside the documented residual
            if got[s]["camel"] != ref_sentencecase_to_camelcase(s):
                bad.append(("camel", s, got[s]["camel"], ref_sentencecase_to_camelcase(s)))
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"

    # the documented camel residual, pinned on both sides so a future change
    # to either surfaces here
    assert ref_sentencecase_to_camelcase("named  thing") == "Named_thing"
    assert one(spark, camel_case(F.lit("named  thing"))) == "NamedThing"
    assert ref_sentencecase_to_camelcase(" foo") == "_foo"
    assert one(spark, camel_case(F.lit(" foo"))) == "Foo"


def test_infores(spark):
    # pipeline per kgx/utils/infores.py:146-162
    assert one(spark, infores_curie(F.lit("Semantic Medline Database"))) == "infores:semantic-medline-database"
    assert one(spark, infores_curie(F.lit("infores:chembl"))) == "infores:chembl"
    assert one(spark, infores_curie(F.lit("  FooBar.Baz  "))) == "infores:foobar-baz"
    # reference removes pre-existing hyphens ([\W] strip) and turns mixed
    # dot/space runs into one underscore each — exact substitution order
    assert one(spark, infores_curie(F.lit("foo-bar"))) == "infores:foobar"
    assert one(spark, infores_curie(F.lit("data. source"))) == "infores:data--source"
    # Python's \W is Unicode-aware: accented letters are WORD chars and
    # survive the strip, exactly as the reference's re.sub does
    assert one(spark, infores_curie(F.lit("Café Données"))) == "infores:café-données"
    # Python's strip()/\s are Unicode-aware: tab/NBSP whitespace behaves
    # exactly like the reference ('Name\t' → 'infores:name', not 'name-';
    # NBSP is a separator, not a deleted non-word char)
    assert one(spark, infores_curie(F.lit("Name\t"))) == "infores:name"
    assert one(spark, infores_curie(F.lit("a\u00a0b"))) == "infores:a-b"
    assert one(spark, infores_curie(F.lit("\u2028x\u2029"))) == "infores:x"


def test_infores_rewrite_tuple(spark):
    """The optional (regex, substitution[, prefix]) rewrite
    (kgx/utils/infores.py:86-107): sub on the raw value, prefix prepended as
    a word, infores: values untouched, falsy regex → prefix only."""
    src = F.lit("Supplier#000000017 Database")
    assert one(spark, infores_curie(src, rewrite=("Supplier#0*", "vendor "))) == \
        "infores:vendor-17-database"
    assert one(spark, infores_curie(src, rewrite=("Supplier#0*", "vendor ", "trusted"))) == \
        "infores:trusted-vendor-17-database"
    # 1-tuple: substitution defaults to deletion
    assert one(spark, infores_curie(F.lit("xTTTy"), rewrite=("T+",))) == "infores:xy"
    # falsy regex: no sub, prefix still applies
    assert one(spark, infores_curie(F.lit("db"), rewrite=("", "", "my"))) == "infores:my-db"
    # already-infores values pass through before any rewrite
    assert one(spark, infores_curie(F.lit("infores:chembl"), rewrite=("chem", "x"))) == \
        "infores:chembl"


def test_infores_differential(spark):
    """Differential: the Spark expression vs a VERBATIM Python port of the
    reference kernel (kgx/utils/infores.py:135-168 _process_infores — the
    Python re module IS the reference semantics, including Unicode \\s and
    \\w), over a fuzz corpus of Unicode whitespace/letters/numerals and
    rewrite-tuple variants. The DuckDB oracle replays the same regexes, so
    only an independent-engine comparison like this can catch Java-vs-
    Python semantic drift (the round-4 ADVICE Unicode finding's class)."""
    import random
    import re

    from kgx_spark.functions.infores import infores_curie

    def py_reference(source, rewrite=None):
        if source.startswith("infores:"):
            return source
        filt = re.compile(rewrite[0]) if rewrite and rewrite[0] else None
        substr = rewrite[1] if rewrite and len(rewrite) > 1 else ""
        prefix = rewrite[2] if rewrite and len(rewrite) > 2 else ""
        infores = filt.sub(substr, source) if filt else source
        infores = prefix + " " + infores
        infores = infores.strip()
        infores = infores.lower()
        infores = re.sub(r"\s+", "_", infores)
        infores = re.sub(r"\.+", "_", infores)
        infores = re.sub(r"[\W]", "", infores)
        infores = re.sub(r"_", "-", infores)
        return "infores:" + infores

    pieces = [
        "Drug", "Central", "some", "DB", "v2.1", "a.b..c", "x_y", "-",
        "café", "漢字", "Ⅻ", "٣", "№5", "e=mc²", "(beta)", "infores:kept",
        "\t", " ", " ", " ", "　", " ", "  ", "#", "@x",
    ]
    rng = random.Random(5)
    corpus = ["".join(rng.sample(pieces, rng.randint(1, 5))) for _ in range(250)]
    corpus += ["", " ", "infores:already-done", "Name\t", "a b"]
    rewrites = [
        None,
        ("[Dd]rug", "med"),
        ("Central",),
        ("DB", "database ", "trusted"),
        ("", "", "pfx"),
    ]
    for rw in rewrites:
        df = spark.createDataFrame([(s,) for s in corpus], ["src"])
        got = {
            r["src"]: r["out"]
            for r in df.select("src", infores_curie(F.col("src"), rewrite=rw).alias("out")).collect()
        }
        bad = [(s, got[s], py_reference(s, rw)) for s in corpus if got[s] != py_reference(s, rw)]
        assert not bad, f"rewrite={rw}: {len(bad)} divergences, first 3: {bad[:3]}"


def test_normalize_url(spark):
    from kgx_spark.functions.urls import normalize_url

    cases = {
        # scheme/host lowercased, default port stripped, fragment dropped
        "HTTP://Example.COM:80/Path/1#frag": "http://example.com/Path/1",
        "https://A.b:443/": "https://a.b/",
        # non-default port kept; path case kept
        "http://a.b:8080/X": "http://a.b:8080/X",
        # empty path → '/'
        "http://a.b": "http://a.b/",
        # params sorted, tracking params dropped, empty query dropped
        "http://a.b/p?z=1&a=2&utm_source=x&fbclid=y": "http://a.b/p?a=2&z=1",
        "http://a.b/p?utm_campaign=only": "http://a.b/p",
        # tracking-param match is case-insensitive on the NAME
        "http://a.b/p?UTM_Source=x&FBCLID=y&a=2": "http://a.b/p?a=2",
        # a '?' first appearing inside the fragment is NOT a query
        # (hash-route SPA URLs)
        "http://x.y/p#/route?y=1": "http://x.y/p",
        "http://x.y/p?a=1#/route?y=1": "http://x.y/p?a=1",
        # empty authority: path must survive, distinct URLs stay distinct
        "file:///etc/hosts": "file:///etc/hosts",
        "http:///foo/bar": "http:///foo/bar",
        # non-URL values pass through untouched
        "HGNC:123": "HGNC:123",
        "not a url": "not a url",
    }
    for raw, want in cases.items():
        assert one(spark, normalize_url(F.lit(raw))) == want, raw


def test_normalize_url_differential(spark):
    """Differential fuzz: the Spark expression vs an independent pure-Python
    model of the documented rules (urls.py module docstring), over a seeded
    grammar of crawl-shaped URLs. Both ADVICE-found bugs in this operator
    (fragment-'?' misread as query, case-sensitive tracking match) were
    grammar edge cases exactly like these — this pins the whole rule set."""
    import random
    import re

    from kgx_spark.functions.urls import normalize_url

    def py_model(u0: str) -> str:
        u = u0.strip(" ")  # F.trim strips ASCII spaces
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", u)
        if not m:
            return u0  # no scheme → original value passes through
        scheme = m.group(1).lower()
        rest = u[m.end():]
        hostport = re.match(r"^([^/?#]*)", rest).group(1).lower()
        if scheme == "http":
            host = re.sub(r":80$", "", hostport)
        elif scheme == "https":
            host = re.sub(r":443$", "", hostport)
        else:
            host = hostport
        path = re.match(r"^[^/?#]*([^?#]*)", rest).group(1) or "/"
        qm = re.match(r"^[^?#]*\?([^#]*)", rest)
        query = qm.group(1) if qm else ""
        params = sorted(
            p
            for p in query.split("&")
            if p and not re.match(r"(?i)^(utm_[^=]*|fbclid|gclid)(=.*)?$", p)
        )
        qpart = "?" + "&".join(params) if params else ""
        return f"{scheme}://{host}{path}{qpart}"

    rng = random.Random(20260817)
    schemes = ["http", "HTTP", "HtTp", "https", "HTTPS", "ftp", "FILE", "a+b-c.d", ""]
    hosts = ["Example.COM", "a.b", "XN--caf.de", "127.0.0.1", ""]
    ports = ["", ":80", ":443", ":8080", ":080"]
    paths = ["", "/", "/Path/One", "/a//b/", "/%7Euser", "/café"]
    qparams = [
        "a=1", "z=2", "A=3", "utm_source=x", "UTM_Source=x", "utm_=y",
        "UTM_CAMPAIGN", "fbclid=f", "FBCLID=f", "gclid", "gclidX=1",
        "xutm_a=1", "", "=v", "a=b=c", "a=%20", "k=v&broken",
    ]
    frags = ["", "#", "#frag", "#/route?y=1&utm_source=z", "#a#b?c"]
    urls = []
    for _ in range(400):
        q = "&".join(rng.sample(qparams, rng.randint(0, 4)))
        urls.append(
            rng.choice(schemes)
            + ("://" if rng.random() < 0.95 else ":")
            + rng.choice(hosts)
            + rng.choice(ports)
            + rng.choice(paths)
            + (("?" + q) if rng.random() < 0.7 else "")
            + rng.choice(frags)
        )
    urls += ["", " ", "  http://A.b/x  ", "no-scheme/path?a=1#f"]

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        r["url"]: r["canon"]
        for r in df.select("url", normalize_url(F.col("url")).alias("canon")).collect()
    }
    bad = [
        (u, got[u], py_model(u)) for u in urls if got[u] != py_model(u)
    ]
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"


def test_edge_key_and_id(spark):
    # '{s}-{p}-{o}' per kgx/utils/kgx_utils.py:343-364
    key = one(spark, edge_key(F.lit("A:1"), F.lit("biolink:related_to"), F.lit("B:2")))
    assert key == "A:1-biolink:related_to-B:2"
    eid = one(spark, deterministic_edge_id(F.lit("A:1"), F.lit("biolink:related_to"), F.lit("B:2")))
    assert len(eid) == 64  # sha2-256 hex
    # differential vs the reference kernel "{}-{}-{}".format(s,p,o) —
    # equal on every non-null input; the ONE divergence is pinned here:
    # Python format renders a null as the string 'None' while concat_ws
    # SKIPS nulls entirely ('p-o', no placeholder). Nulls never reach this
    # kernel in either system (validate rejects null s/p/o first), and
    # 'None-p-o' keys would be the worse behavior to reproduce.
    cases = [("A:1", "biolink:related_to", "B:2"), ("", "p", "o"),
             ("s-with-dash", "p", "o--"), ("ü:1", "p", "ö:2")]
    for s, p, o in cases:
        assert one(spark, edge_key(F.lit(s), F.lit(p), F.lit(o))) == "{}-{}-{}".format(s, p, o)
    null_key = one(spark, edge_key(F.lit(None), F.lit("p"), F.lit("o")))
    assert null_key == "p-o" and "{}-{}-{}".format(None, "p", "o") == "None-p-o"
