"""Dedup + similarity + text-stat operators over the driver's documents/embeddings."""

import pyspark.sql.functions as F
import pytest

from kgx_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)
from kgx_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from kgx_spark.operators.textstats import (
    detect_language,
    fingerprint,
    quality_features,
    regex_token_count,
    token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_duplicates(spark, docs):
    dup = docs.unionByName(docs.limit(3))  # force 3 exact dups
    out = exact_duplicates(dup)
    assert out.where(F.col("n_docs") > 1).count() >= 3
    # representative is the min doc_id — deterministic
    assert out.count() == docs.select("text").distinct().count()


def test_minhash_and_lsh(spark, docs):
    near = docs.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny suffix")).alias("text"),
    )
    both = docs.select("doc_id", "text").unionByName(near)
    sigs = minhash_signatures(both, num_hashes=8)
    assert sigs.columns == ["doc_id"] + [f"h{i}" for i in range(8)]
    cands = lsh_candidate_pairs(both, num_hashes=8, bands=4)
    # every planted near-dup pair must be a candidate (suffix barely moves minhash)
    planted = {(r["doc_id"], r["doc_id"] + 100000) for r in docs.limit(5).collect()}
    got = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    assert planted <= got
    # bucket-size cap only ever removes pairs, never invents them
    capped = lsh_candidate_pairs(both, num_hashes=8, bands=4, max_bucket_size=3)
    got_capped = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got_capped <= got
    assert len(got_capped) < len(got)


def test_jaccard_pairs(spark, docs):
    near = docs.limit(3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.col("text")
    )
    both = docs.select("doc_id", "text").unionByName(near)
    out = jaccard_pairs(both, threshold=0.99)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_1000"] for r in out.collect()}
    for r in docs.limit(3).collect():
        assert got[(r["doc_id"], r["doc_id"] + 100000)] == 1000


def test_simhash_shape_and_stability(spark, docs):
    out = simhash(docs, bits=16)
    rows = out.collect()
    assert all(len(r["simhash"]) == 16 and set(r["simhash"]) <= {"0", "1"} for r in rows)
    # identical text ⇒ identical simhash
    out2 = {r["doc_id"]: r["simhash"] for r in simhash(docs.repartition(5), bits=16).collect()}
    for r in rows:
        assert out2[r["doc_id"]] == r["simhash"]


def test_brute_force_topk(spark, embeddings):
    q = embeddings.limit(10)
    out = brute_force_topk(q, embeddings, k=5)
    rows = out.collect()
    assert len(rows) == 50
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, nbrs in by_q.items():
        ranks = sorted(r["rank"] for r in nbrs)
        assert ranks == [1, 2, 3, 4, 5]
        scores = [r["cos_1e6"] for r in sorted(nbrs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor_id"] != qid for r in nbrs)


def test_lsh_topk_recall(spark, embeddings):
    q = embeddings.limit(10)
    exact = brute_force_topk(q, embeddings, k=1).where(F.col("rank") == 1)
    approx = lsh_topk(q, embeddings, dim=64, k=1, planes=3, tables=12)
    # 12 OR'd tables of 3 planes: miss prob ≤ (1-p^3)^12 — high recall even
    # for moderate-cosine true neighbors
    hits = exact.join(approx, ["query_id", "neighbor_id"], "inner").count()
    assert hits >= 8


def test_ivf_topk_runs(spark, embeddings):
    q = embeddings.limit(5)
    out = ivf_topk(q, embeddings, k=3, n_cells=4)
    assert out.count() > 0
    assert out.groupBy("query_id").count().agg(F.max("count")).first()[0] <= 3


def test_language_id(spark):
    # the driver's documents.lang labels are uncorrelated with the (shared,
    # English-ish) word-soup vocabulary, so accuracy is asserted on crafted
    # text with real per-language function words instead
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and looked out of the window", "en"),
            ("der hund und die katze sind nicht in das haus gegangen", "de"),
            ("le chat et la souris sont dans les jardins et la maison", "fr"),
            ("el perro y los gatos están en las casas y el jardín", "es"),
            ("这是一个中文句子", "zh"),
            ("xyzzy qwerty plugh", "und"),
        ],
        "text string, expected string",
    )
    out = df.select("expected", detect_language(F.col("text")).alias("pred")).collect()
    for r in out:
        assert r["pred"] == r["expected"], r


def test_quality_and_tokens(spark, docs):
    out = quality_features(docs).first()
    assert out["n_tokens"] > 0
    assert out["n_chars_computed"] == len(out["text"])
    tc = docs.select(token_count(F.col("text")).alias("t"), regex_token_count(F.col("text")).alias("rt")).first()
    assert tc["rt"] >= tc["t"] > 0


def test_repetition_signals_hand_computed(spark):
    """Gopher repetition gates on a hand-checkable doc: 4 lines, one dup
    pair; 'a b' is the dominant 2-gram."""
    from kgx_spark.operators.textstats import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "a b c\nxx yy\na b c\nzz"),  # 4 lines, 'a b c' twice
            (2, "only one line"),
            (3, "   "),  # no non-empty lines, no 2-grams... wait 0 tokens
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    r1 = out[1]
    assert r1["n_lines"] == 4
    # 1 duplicate line of 4 → floor(1000/4) = 250
    assert r1["dup_line_frac_1000"] == 250
    # dup chars: 'a b c' (5) duplicated once; total line chars 5+5+5+2 = 17
    assert r1["dup_line_char_frac_1000"] == 5 * 1000 // 17
    # 2-grams: 'a b'×2, 'b c'×2, 'c xx', 'xx yy', 'yy a', 'c zz' → tie on
    # count, lexicographic 'a b' wins
    assert r1["top_2gram"] == "a b"
    assert r1["top_2gram_frac_1000"] == 2 * 3 * 1000 // len("a b c\nxx yy\na b c\nzz")
    assert out[2]["n_lines"] == 1 and out[2]["dup_line_frac_1000"] == 0
    assert out[3]["n_lines"] == 0 and out[3]["top_2gram"] is None


def test_remove_boilerplate_lines(spark):
    """CCNet-style cross-corpus line dedup: lines in ≥min_docs distinct
    docs vanish everywhere, order preserved, empty lines never counted."""
    from kgx_spark.operators.textstats import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "NAV\ncontent one\nFOOTER"),
            (2, "NAV\ncontent two\n\nFOOTER"),
            (3, "NAV\nNAV\nunique\nFOOTER"),
            (4, "NAV\nFOOTER"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(docs, min_docs=3).collect()}
    assert out[1]["text"] == "content one" and out[1]["n_removed"] == 2
    # empty line survives (never boilerplate) and keeps its position
    assert out[2]["text"] == "content two\n" and out[2]["n_removed"] == 2
    # BOTH occurrences of a frequent line are removed from the same doc
    assert out[3]["text"] == "unique" and out[3]["n_removed"] == 3
    # a doc that was all boilerplate comes back empty, not missing
    assert out[4]["text"] == "" and out[4]["n_removed"] == 2


def test_cross_doc_ngram_overlap(spark):
    """Exact-substring family signal: verbatim copies score 1000; a doc
    sharing half its shingles scores ~500; fully-unique docs score 0;
    too-short docs report zero grams."""
    from kgx_spark.operators.dedup import cross_doc_ngram_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),       # 3 distinct 4-grams, all shared with doc 2
            (2, "a b c d e f"),       # verbatim copy
            (3, "a b c d zz ww qq"),  # shares 'a b c d' only: 1 of 4 grams
            (4, "p q r s t u"),       # unique
            (5, "x y"),               # shorter than the shingle width
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in cross_doc_ngram_overlap(docs, ngram=4).collect()}
    assert out[1]["shared_frac_1000"] == 1000 and out[2]["shared_frac_1000"] == 1000
    assert out[3]["n_grams"] == 4 and out[3]["n_shared"] == 1
    assert out[3]["shared_frac_1000"] == 250
    assert out[4]["shared_frac_1000"] == 0
    assert out[5]["n_grams"] == 0 and out[5]["shared_frac_1000"] == 0


def test_remove_shared_spans(spark):
    """Span-level exact-substring removal: the verbatim shared span (and
    only it) is cut from qualifying docs; below-threshold and short docs
    pass through; verbatim full copies clean to empty; casing of the kept
    text is preserved while matching is case-insensitive."""
    from kgx_spark.operators.dedup import remove_shared_spans

    shared_run = "s1 s2 s3 s4 s5 s6"  # 3 consecutive shared 4-gram starts
    docs = spark.createDataFrame(
        [
            (1, f"Alpha beta {shared_run} gamma delta"),
            (2, f"other words {shared_run.upper()} more other tail words"),
            (3, "p q r s t u v w x y z unique only here"),  # nothing shared
            (4, "x y"),  # shorter than the shingle width
            (5, "c1 c2 c3 c4 c5"),
            (6, "c1 c2 c3 c4 c5"),  # verbatim copy of 5 → both clean to ''
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_shared_spans(docs, ngram=4, min_docs=2, min_frac=0.2,
                               min_run_grams=1).collect()}
    # doc 1: 10 tokens, grams at 1..7; shared grams are starts 3..5 wait —
    # the shared run covers positions 3..8 → tokens s1..s6 removed
    assert out[1]["text_clean"] == "Alpha beta gamma delta"
    assert out[1]["n_tokens_removed"] == 6
    # doc 2: same span uppercase — matching is case-insensitive, and the
    # SURVIVING text keeps its original casing
    assert out[2]["text_clean"] == "other words more other tail words"
    assert out[2]["n_tokens_removed"] == 6
    assert out[3]["text_clean"] == docs.where(F.col("doc_id") == 3).first()["text"]
    assert out[3]["n_tokens_removed"] == 0
    assert out[4]["text_clean"] == "x y" and out[4]["n_tokens_removed"] == 0
    assert out[5]["text_clean"] == "" and out[5]["n_tokens_removed"] == 5
    assert out[6]["text_clean"] == ""

    # min_frac gate: doc 1 shares 3 of 7 grams (428‰) — a 0.5 gate skips it
    gated = {r["doc_id"]: r for r in
             remove_shared_spans(docs, ngram=4, min_docs=2, min_frac=0.5,
                                 min_run_grams=1).collect()}
    assert gated[1]["n_tokens_removed"] == 0
    assert gated[5]["text_clean"] == ""  # full copies still qualify

    # min_run_grams: isolated single shared starts are kept
    iso = spark.createDataFrame(
        [(1, "k1 k2 k3 k4 a b c"), (2, "k1 k2 k3 k4 x y z")],
        "doc_id bigint, text string",
    )
    kept = {r["doc_id"]: r for r in
            remove_shared_spans(iso, ngram=4, min_docs=2, min_frac=0.1,
                                min_run_grams=2).collect()}
    assert kept[1]["n_tokens_removed"] == 0  # run of 1 < min_run_grams
    cut = {r["doc_id"]: r for r in
           remove_shared_spans(iso, ngram=4, min_docs=2, min_frac=0.1,
                               min_run_grams=1).collect()}
    assert cut[1]["text_clean"] == "a b c" and cut[1]["n_tokens_removed"] == 4


def test_hash_sampling_deterministic_and_partition_invariant(spark, docs):
    """Hash sampling must (a) be reproducible across partition layouts —
    the whole point vs df.sample() — (b) approximate the requested rate,
    (c) draw independent samples under different salts, and (d) apply
    per-stratum rates."""
    from kgx_spark.operators.sampling import hash_sample, stratified_hash_sample

    base = docs.select("doc_id", "lang")
    kept1 = {r["doc_id"] for r in hash_sample(base, "doc_id", 300, salt="s1").collect()}
    kept1b = {r["doc_id"] for r in hash_sample(base.repartition(13), "doc_id", 300, salt="s1").collect()}
    assert kept1 == kept1b  # partition-layout invariant
    n = base.count()
    assert 0.2 * n < len(kept1) < 0.4 * n  # ~300‰
    kept2 = {r["doc_id"] for r in hash_sample(base, "doc_id", 300, salt="s2").collect()}
    assert kept1 != kept2  # independent draw under a new salt
    strat = stratified_hash_sample(
        base, "doc_id", "lang", {"en": 1000}, default_permille=0, salt="s1"
    )
    got = {r["lang"] for r in strat.collect()}
    assert got == {"en"}  # full en, everything unlisted dropped
    assert strat.count() == base.where(F.col("lang") == "en").count()


def test_assign_pack_ids(spark):
    """Greedy-by-offset packing: per-stratum cumulative token offsets decide
    the pack; assignment is reproducible across partition layouts."""
    from kgx_spark.operators.sampling import assign_pack_ids

    docs = spark.createDataFrame(
        [
            (1, "en", "a b c"),        # 3 tokens, offset 0  → pack 0
            (2, "en", "d e f g"),      # offset 3            → pack 0
            (3, "en", "h i"),          # offset 7 ≥ budget 6 → pack 1
            (4, "de", "x y z w"),      # own stratum, offset 0 → pack 0
        ],
        "doc_id bigint, lang string, text string",
    )
    out = {r["doc_id"]: r for r in
           assign_pack_ids(docs, budget_tokens=6, stratum_col="lang").collect()}
    assert (out[1]["pack_id"], out[1]["offset_tokens"]) == (0, 0)
    assert (out[2]["pack_id"], out[2]["offset_tokens"]) == (0, 3)
    assert (out[3]["pack_id"], out[3]["offset_tokens"]) == (1, 1)
    assert (out[4]["pack_id"], out[4]["offset_tokens"]) == (0, 0)
    # partition-layout invariance (the reproducibility claim)
    out2 = {r["doc_id"]: (r["pack_id"], r["offset_tokens"]) for r in
            assign_pack_ids(docs.repartition(7), budget_tokens=6, stratum_col="lang").collect()}
    assert out2 == {k: (v["pack_id"], v["offset_tokens"]) for k, v in out.items()}

    # materialization: docs concatenate in pack order with counts carried
    from kgx_spark.operators.sampling import materialize_packs

    packs = {(r["lang"], r["pack_id"]): r for r in materialize_packs(
        assign_pack_ids(docs, budget_tokens=6, stratum_col="lang"), stratum_col="lang"
    ).collect()}
    assert packs[("en", 0)]["text"] == "a b c\n\nd e f g"
    assert packs[("en", 0)]["n_docs"] == 2 and packs[("en", 0)]["n_tokens"] == 7
    assert packs[("en", 1)]["text"] == "h i"
    assert packs[("de", 0)]["n_docs"] == 1


def test_assign_pack_ids_default_stratum_and_token_col(spark):
    """The DEFAULT stratum is a hash bucket of the id (never one global
    window); materialize_packs picks the bucket up automatically; a
    precomputed token_count_col replaces the whitespace count."""
    from kgx_spark.operators.sampling import assign_pack_ids, materialize_packs

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 5 + 1)) for i in range(1, 41)],
        "doc_id bigint, text string",
    )
    out = assign_pack_ids(docs, budget_tokens=8)
    assert "_pack_stratum" in out.columns
    rows = {r["doc_id"]: (r["_pack_stratum"], r["pack_id"], r["offset_tokens"])
            for r in out.collect()}
    # layout invariance holds for the default stratum too
    rows2 = {r["doc_id"]: (r["_pack_stratum"], r["pack_id"], r["offset_tokens"])
             for r in assign_pack_ids(docs.repartition(7), budget_tokens=8).collect()}
    assert rows == rows2
    # every doc's offset respects its own bucket's cumsum (replay in python)
    import hashlib

    def bucket(doc_id):
        return int(hashlib.md5(f"pack{doc_id}".encode()).hexdigest()[:8], 16) % 4096

    by_bucket: dict[int, list[int]] = {}
    for i in range(1, 41):
        assert rows[i][0] == bucket(i)
        by_bucket.setdefault(bucket(i), []).append(i)
    for b, ids in by_bucket.items():
        off = 0
        for i in sorted(ids):
            assert rows[i][1] == off // 8 and rows[i][2] == off % 8
            off += i % 5 + 1
    # materialize groups on the bucket without being told
    packs = materialize_packs(out)
    assert "_pack_stratum" in packs.columns
    assert packs.count() == len({(v[0], v[1]) for v in rows.values()})

    # token_count_col: budgets follow the precomputed count, not whitespace
    counted = docs.withColumn("bpe", (F.col("doc_id") % 3 + 1) * 4)
    got = {r["doc_id"]: r["n_tokens"] for r in
           assign_pack_ids(counted, budget_tokens=8, stratum_col=None,
                           token_count_col="bpe").collect()}
    assert got[1] == 8 and got[2] == 12 and got[3] == 4


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma  alpha beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """The scale-killer shape: template-heavy corpora where near-identical
    pages share ALL band keys (exact dedup upstream only removes
    byte-identical texts). The bucket cap must (a) default ON and (b) bound
    the candidate-pair count on a degenerate corpus instead of going k²."""
    import inspect

    from kgx_spark.operators.curate import curate_corpus

    # defaults are ON (10k, matching the embedding-LSH paths) — None is an
    # explicit opt-out, not the default
    assert inspect.signature(lsh_candidate_pairs).parameters["max_bucket_size"].default == 10_000
    assert inspect.signature(curate_corpus).parameters["max_bucket_size"].default == 10_000

    n = 600
    template = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("breaking news site navigation home about contact copyright "
                  "footer all rights reserved article number "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    uncapped = lsh_candidate_pairs(template, num_hashes=8, bands=4, max_bucket_size=None)
    capped = lsh_candidate_pairs(template, num_hashes=8, bands=4, max_bucket_size=100)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    # uncapped: nearly every doc shares a band key with every other (the one
    # varying token occasionally wins a minhash slot) → essentially the full
    # k(k-1)/2 blowup
    assert n_uncapped >= 0.95 * (n * (n - 1) // 2)
    # capped: the degenerate buckets (> 100 members) are dropped entirely —
    # bounded far below quadratic
    assert n_capped <= 4 * 100 * 99 // 2
    assert n_capped < n_uncapped

    # simhash banding has the same degenerate-bucket exposure and the same
    # default-on cap
    from kgx_spark.operators.dedup import simhash_near_dups

    assert inspect.signature(simhash_near_dups).parameters["max_bucket_size"].default == 10_000
    sh_uncapped = simhash_near_dups(
        template, bits=16, bands=4, max_hamming=3, max_bucket_size=None
    ).count()
    sh_capped = simhash_near_dups(
        template, bits=16, bands=4, max_hamming=3, max_bucket_size=100
    ).count()
    # hamming verification trims some candidate pairs (the varying token
    # flips a few signature bits), but the surviving count is still
    # quadratic-order. The cap drops every over-100 slice bucket; with a
    # 16-key slice space (4-bit slices) the sub-cap remainder buckets still
    # pair up internally, so the bound here is per-bucket, not global —
    # hence the factor-of-2 assertion (bits must scale with corpus size for
    # a tight bound, per the simhash_near_dups docstring)
    assert sh_uncapped >= 0.5 * (n * (n - 1) // 2)
    assert sh_capped < sh_uncapped / 2


def test_jaccard_candidate_restricted_matches_exact(spark, docs):
    """The candidate-restricted path must agree with the exact path on every
    pair the candidate set contains (the LSH → verify composition)."""
    cands = lsh_candidate_pairs(docs, num_hashes=8, bands=4)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard_1000"]
        for r in jaccard_pairs(docs, threshold=0.8).collect()
    }
    restricted = {
        (r["doc_a"], r["doc_b"]): r["jaccard_1000"]
        for r in jaccard_pairs(docs, threshold=0.8, candidates=cands).collect()
    }
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    # restricted ⊆ exact, values equal, and covers exactly exact ∩ candidates
    assert restricted == {k: v for k, v in exact.items() if k in cand_set}
    assert len(restricted) > 0


def test_curate_corpus_drops_planted_duplicates(spark, docs):
    from kgx_spark.operators.curate import curate_corpus

    exact = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    near = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 200000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzzz"))
    )
    out = curate_corpus(docs.unionByName(exact).unionByName(near), jaccard_threshold=0.9).cache()
    kept = {r["doc_id"] for r in out.collect()}
    # planted exact copies never survive (identical text, higher id)
    assert not any(k >= 100000 for k in kept)
    # representative is the min member and the quality gate applied
    assert all(r["cluster"] == str(r["doc_id"]) for r in out.collect())
    assert out.where(F.col("n_tokens") < 5).count() == 0


def test_ngram_shingles(spark):
    from kgx_spark.operators.dedup import jaccard_pairs, word_set

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "d c b a"), (4, "ab")],
        "doc_id bigint, text string",
    )
    tri = {r["doc_id"]: set() for r in docs.collect()}
    for r in word_set(docs, "doc_id", "text", ngram=3).collect():
        tri[r["doc_id"]].add(r["word"])
    assert tri[1] == {"a b c", "b c d"}
    assert tri[3] == {"d c b", "c b a"}  # order-sensitive, unlike 1-grams
    assert tri[4] == set()  # shorter than the shingle width → empty

    # identical docs are jaccard-1000 twins at any shingle width; reversed
    # word order only matches under 1-grams
    j3 = {(r["doc_a"], r["doc_b"]): r["jaccard_1000"]
          for r in jaccard_pairs(docs, threshold=0.5, ngram=3).collect()}
    assert j3 == {(1, 2): 1000}
    j1 = {(r["doc_a"], r["doc_b"]): r["jaccard_1000"]
          for r in jaccard_pairs(docs, threshold=0.5, ngram=1).collect()}
    assert j1[(1, 3)] == 1000 and j1[(1, 2)] == 1000


def test_lsh_topk_multiprobe_improves_recall(spark, embeddings):
    """Multi-probe LSH (flip ≤1 sign bit per query bucket) must recover at
    least every hit the base configuration finds, and with few tables it
    strictly widens the candidate set — without touching the corpus-side
    shuffle volume."""
    q = embeddings.limit(10)
    exact = brute_force_topk(q, embeddings, k=1).where(F.col("rank") == 1)

    def hits(approx):
        return exact.join(approx, ["query_id", "neighbor_id"], "inner").count()

    h = [
        hits(lsh_topk(q, embeddings, dim=64, k=1, planes=6, tables=2, multiprobe=m))
        for m in (0, 1, 2, 3)
    ]
    # probing only ever widens the candidate set → monotone recall
    # (measured on the seeded corpus: 2 → 5 → 8 → 10 of 10)
    assert h == sorted(h)
    assert h[2] >= 7 and h[3] >= 9
