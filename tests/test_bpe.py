"""Distributed BPE training/segmentation vs a pure-Python reference.

The reference implementation below is the textbook Sennrich BPE loop
(symbol tuples, greedy left-to-right merge application) — structurally
unrelated to the engine's delimiter-string representation, so the
differential test catches representation bugs (overlap handling,
boundary sharing, tie-breaks), not just re-runs the same code."""

from __future__ import annotations

import pytest

from deltalake_poc_spark.pipeline.bpe import (_count_symbols, bpe_learn,
                                              bpe_learn_local,
                                              bpe_learn_rules, bpe_segment,
                                              bpe_segment_prod, word_freqs)


def ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE: symbol tuples, dict pair counts, greedy merge."""
    segs = {w: tuple(w) for w in word_counts}
    rules = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((a, b, c))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = tuple(out)
    return rules, segs


# Corpora chosen to exercise the delimiter-replace representation:
# overlapping merge candidates (aaa/aaaa), back-to-back merges (abab),
# a merged symbol that immediately re-pairs (aab + ab), tie-breaking
# (equal counts resolved lexicographically), and 1-char words.
CORPORA = [
    {"aaa": 3, "aaaa": 2, "ab": 5, "abab": 4, "aab": 1, "a": 7},
    {"low": 5, "lower": 2, "newest": 6, "widest": 3},
    {"xy": 1, "yx": 1, "zz": 1},          # 3-way count tie
    {"q": 4, "z": 9},                     # no pairs at all
    {"banana": 3, "bandana": 2, "ana": 8},
]


@pytest.mark.parametrize("wc", CORPORA)
def test_learn_matches_reference(spark, wc):
    docs = spark.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(wc.items())],
        "doc_id LONG, text STRING")
    got = bpe_learn_rules(docs, n_merges=6)
    want, _ = ref_bpe(wc, 6)
    assert got == want
    # the production (driver-side-loop) fit must be merge-identical
    assert bpe_learn_local(docs, n_merges=6) == want


@pytest.mark.parametrize("wc", CORPORA)
def test_segment_matches_reference(spark, wc):
    docs = spark.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(wc.items())],
        "doc_id LONG, text STRING")
    rules = bpe_learn_rules(docs, n_merges=6)
    _, segs = ref_bpe(wc, 6)
    out = {r["doc_id"]: r for r in
           bpe_segment(docs, [(l, r) for l, r, _ in rules]).collect()}
    for i, (w, c) in enumerate(wc.items()):
        row = out[i]
        assert row["n_bpe_words"] == c
        assert row["n_subwords"] == len(segs[w]) * c
        assert row["n_base_chars"] == len(w) * c


def test_learn_matches_reference_random_corpora(spark):
    """Differential fuzz: random corpora over a 3-letter alphabet
    with 'a' drawn twice as often — maximal pair-collision pressure
    (repeated substrings, overlapping candidates, frequent count
    ties) plus a rarer third symbol for disjoint-pair merges, seeded
    so failures reproduce. Spark round-trips are expensive, so the
    DataFrame-per-corpus loop is kept deliberately small."""
    import random

    rng = random.Random(0xB9E)
    for trial in range(6):
        words = {"".join(rng.choice("abac") for _ in range(
            rng.randint(1, 7))): rng.randint(1, 9)
            for _ in range(rng.randint(2, 12))}
        docs = spark.createDataFrame(
            [(i, " ".join([w] * c))
             for i, (w, c) in enumerate(words.items())],
            "doc_id LONG, text STRING")
        want, segs = ref_bpe(words, 5)
        assert bpe_learn_local(docs, n_merges=5) == want, (trial, words)
        assert bpe_learn_rules(docs, n_merges=5) == want, (trial, words)
        out = {r["doc_id"]: r["n_subwords"] for r in
               bpe_segment(docs, [(l, r) for l, r, _ in want]).collect()}
        for i, (w, c) in enumerate(words.items()):
            assert out[i] == len(segs[w]) * c, (trial, w, words)


def test_ineligible_and_empty_docs(spark):
    # doc 4: a token with a trailing newline (trim strips spaces
    # only). Java regex $ would accept 'ab\n' while RE2's $ (the
    # DuckDB oracle) rejects it — WORD_RE's \A/\z anchors must
    # exclude it in Spark too, or the engines diverge.
    docs = spark.createDataFrame(
        [(0, "abc abc XYZ 123 a-b"), (1, ""), (2, "   "), (3, "ABC 9"),
         (4, "abc ab\n")],
        "doc_id LONG, text STRING")
    assert {r["word"]: r["cnt"] for r in word_freqs(docs).collect()} == {
        "abc": 3}
    rows = {r["doc_id"]: r for r in bpe_segment(docs, [("a", "b"),
                                                       ("ab", "c")])
            .collect()}
    assert (rows[0]["n_bpe_words"], rows[0]["n_subwords"],
            rows[0]["n_base_chars"]) == (2, 2, 6)
    for d in (1, 2, 3):
        assert (rows[d]["n_bpe_words"], rows[d]["n_subwords"],
                rows[d]["n_base_chars"]) == (0, 0, 0)
    # doc 4: only 'abc' survives the anchor filter ('ab\n' excluded)
    assert (rows[4]["n_bpe_words"], rows[4]["n_subwords"],
            rows[4]["n_base_chars"]) == (1, 1, 3)


def test_learn_dataframe_shape_and_determinism(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox the quick the")],
        "doc_id LONG, text STRING")
    df1 = bpe_learn(docs, n_merges=4)
    assert [f.name for f in df1.schema.fields] == [
        "merge_rank", "lhs", "rhs", "pair_count"]
    r1 = [tuple(r) for r in df1.collect()]
    r2 = [tuple(r) for r in bpe_learn(docs, n_merges=4).collect()]
    assert r1 == r2
    assert [r[0] for r in r1] == [1, 2, 3, 4]


def test_vocab_exhaustion_stops_early(spark):
    # "ab" collapses to one symbol after 1 merge: no pairs remain.
    docs = spark.createDataFrame([(0, "ab ab ab")],
                                 "doc_id LONG, text STRING")
    assert bpe_learn_rules(docs, n_merges=5) == [("a", "b", 3)]


def test_segment_stays_jvm_side(spark):
    """The hot path (segmentation over the corpus) must be pure
    JVM-side expressions — no Python eval nodes."""
    docs = spark.createDataFrame([(0, "aa bb aa")],
                                 "doc_id LONG, text STRING")
    plan = bpe_segment(docs, [("a", "a")])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_segment_oracle_survives_vocab_exhaustion(spark):
    """The DuckDB segment oracle must treat a missing merge (vocabulary
    exhausted before n_merges) as a no-op, like bpe_learn_rules' early
    break — not NULL-poison seg via a NULL scalar subquery, which
    coalesced n_subwords to 0 and would red a CORRECT engine on any
    small/degenerate corpus."""
    import duckdb

    import __spark_entry__ as E

    docs = spark.createDataFrame([(1, "ab ab ab"), (2, "xyz")],
                                 "doc_id LONG, text STRING")
    rules = bpe_learn_local(docs, n_merges=8)
    assert len(rules) < 8  # the corpus really does exhaust early
    got = {r["doc_id"]: (r["n_bpe_words"], r["n_subwords"],
                         r["n_base_chars"])
           for r in bpe_segment(docs, [(l, r) for l, r, _ in rules])
           .collect()}

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM (VALUES"
            " (1, 'ab ab ab'), (2, 'xyz')) t(doc_id, text)")
    want = {row[0]: (row[1], row[2], row[3])
            for row in con.sql(E._bpe_segment_oracle(8)).fetchall()}
    assert got == want == {1: (3, 3, 6), 2: (1, 1, 3)}


def _seq_apply(word: str, merges) -> list[str]:
    """Sequential textbook application: each merge in rank order,
    left-to-right non-overlapping — literally what bpe_segment's
    replace chain executes."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@pytest.mark.parametrize("wc", CORPORA)
def test_segment_prod_matches_expression_path(spark, wc):
    """bpe_segment_prod (rank-loop mapInPandas encoder) must be
    output-identical to bpe_segment (chained-replace expression) under
    the learned merges, on every corpus where both run."""
    docs = spark.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(wc.items())],
        "doc_id LONG, text STRING")
    merges = [(l, r) for l, r, _ in bpe_learn_local(docs, n_merges=6)]
    expr = sorted(tuple(r) for r in bpe_segment(docs, merges).collect())
    prod = sorted(tuple(r) for r in
                  bpe_segment_prod(docs, merges).collect())
    assert prod == expr


def test_count_symbols_equals_sequential_apply_large_n():
    """The rank-loop encoder == sequential rank-order application, at
    merge counts far past the expression path's planning ceiling.
    Holds because learned merge lists are properly nested (rank j's
    operands exist before rank j, so applying rank j can never
    resurrect an exhausted earlier pair); random corpora + random
    probe words (members AND non-members of the training vocabulary)
    over a collision-heavy alphabet."""
    import random

    rng = random.Random(0xB9E2)
    for trial in range(5):
        words = {"".join(rng.choice("ababc") for _ in range(
            rng.randint(1, 12))): rng.randint(1, 9)
            for _ in range(rng.randint(50, 200))}
        n = rng.choice([300, 700, 2000])
        rules, segs = ref_bpe(words, n)
        merges = [(a, b) for a, b, _ in rules]
        ranks = {m: i for i, m in enumerate(merges)}
        # every training word: ref_bpe's final segs ARE the
        # sequential application
        for w, s in segs.items():
            assert _count_symbols(w, ranks) == len(s), (trial, w)
        # probe words the fit never saw
        for _ in range(50):
            w = "".join(rng.choice("ababc")
                        for _ in range(rng.randint(1, 20)))
            assert _count_symbols(w, ranks) == len(_seq_apply(w, merges)), \
                (trial, w)


def test_segment_prod_past_expression_ceiling(spark):
    """End-to-end at a merge count the expression path cannot even
    PLAN (512+ throws StackOverflowError in Catalyst analysis,
    measured r10): learn 600 merges, segment with the production
    encoder, check per-doc counts against the textbook reference."""
    import random

    rng = random.Random(0xB9E3)
    words = {"".join(rng.choice("abcdefgh") for _ in range(
        rng.randint(4, 14))): rng.randint(1, 5) for _ in range(250)}
    docs = spark.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(words.items())],
        "doc_id LONG, text STRING")
    rules = bpe_learn_local(docs, n_merges=600)
    assert len(rules) == 600  # the corpus really supports this depth
    _, segs = ref_bpe(words, 600)
    out = {r["doc_id"]: r for r in
           bpe_segment_prod(docs, [(l, r) for l, r, _ in rules])
           .collect()}
    for i, (w, c) in enumerate(words.items()):
        assert out[i]["n_bpe_words"] == c
        assert out[i]["n_subwords"] == len(segs[w]) * c, (w, segs[w])
        assert out[i]["n_base_chars"] == len(w) * c


def test_segment_prod_null_and_ineligible(spark):
    """NULL text mirrors the expression path's F.size(NULL) -> NULL;
    ineligible tokens (digits, trailing newline, empty) are excluded
    exactly as WORD_RE's absolute anchors exclude them."""
    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "  ab  cd1  ab\n  ef  ")],
        "doc_id LONG, text STRING")
    merges = [("a", "b"), ("e", "f")]
    prod = {r["doc_id"]: (r["n_bpe_words"], r["n_subwords"],
                          r["n_base_chars"])
            for r in bpe_segment_prod(docs, merges).collect()}
    expr = {r["doc_id"]: (r["n_bpe_words"], r["n_subwords"],
                          r["n_base_chars"])
            for r in bpe_segment(docs, merges).collect()}
    assert prod == expr
    assert prod[0] == (None, None, None)
    assert prod[1] == (0, 0, 0)
    # 'ab' and 'ef' each merge to 1 symbol; 'cd1' and 'ab\n' excluded
    assert prod[2] == (2, 2, 4)


def test_learn_local_incremental_matches_reference_deep(spark):
    """The incremental trainer (pair-count deltas + lazy-deletion
    heap, r10) must stay merge-identical to the textbook global
    recount at DEEP merge counts over collision-heavy alphabets — the
    regime where a wrong delta or a stale heap entry first surfaces.
    (Caught during r10 development: a pair present in both the
    before- and after-multisets of a rewritten word had its delta
    applied from both loops, silently shifting later argmax
    tie-breaks.)"""
    import random

    rng = random.Random(0x17C)
    words = {"".join(rng.choice("aabbc") for _ in range(
        rng.randint(1, 14))): rng.randint(1, 5) for _ in range(400)}
    docs = spark.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(words.items())],
        "doc_id LONG, text STRING")
    want, _ = ref_bpe(words, 2000)
    got = bpe_learn_local(docs, n_merges=2000)
    assert got == want
    assert len(got) > 100  # deep enough to exercise the heap churn


def test_learn_from_counts_fuzz_vs_reference():
    """Spark-free differential fuzz of the incremental merge loop
    (the REAL implementation, via bpe_learn_from_counts) against the
    textbook global recount: many trials over collision-heavy
    alphabets and deep merge counts, affordable because no Spark
    round-trips are involved."""
    import random

    from deltalake_poc_spark.pipeline.bpe import bpe_learn_from_counts

    rng = random.Random(0xB9E4)
    for trial in range(40):
        alpha = rng.choice(["ab", "abac", "abcdefgh", "aabbc"])
        words = {"".join(rng.choice(alpha) for _ in range(
            rng.randint(1, 14))): rng.randint(1, 5)
            for _ in range(rng.randint(2, 300))}
        n = rng.choice([5, 60, 600, 3000])
        want, _ = ref_bpe(words, n)
        got = bpe_learn_from_counts(words, n)
        assert got == want, (trial, n, [x for x in zip(got, want)
                                        if x[0] != x[1]][:2])


def test_segment_prod_cache_cap_output_identical(spark):
    """The two-generation cache cap is a memory bound, never a
    semantics knob: a cache_words small enough to force constant
    generation swaps (2 -> hot holds ONE word) must produce exactly
    the uncapped output, including re-encoded evictees."""
    import random

    rng = random.Random(0xB9E4)
    words = {"".join(rng.choice("abcdef") for _ in range(
        rng.randint(2, 10))): rng.randint(1, 4) for _ in range(120)}
    docs = spark.createDataFrame(
        [(i, " ".join(rng.sample(sorted(words), k=min(30, len(words)))))
         for i in range(40)],
        "doc_id LONG, text STRING")
    merges = [(l, r) for l, r, _ in bpe_learn_local(docs, n_merges=50)]
    uncapped = sorted(tuple(r) for r in
                      bpe_segment_prod(docs, merges).collect())
    capped = sorted(tuple(r) for r in
                    bpe_segment_prod(docs, merges,
                                     cache_words=2).collect())
    assert capped == uncapped
