"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) and corpus segmentation with the learned merges.

Scope note vs the reference: the reference budgets documents with a
FIXED tokenizer (see ``text.bpe_token_stats``); a 100 TB training-data
pipeline also needs to FIT the tokenizer on the corpus it is about to
tokenize. This module implements the classic scaling shape — the one
real trainers (HuggingFace tokenizers' word-level pre-count,
SentencePiece's BPE mode) use:

1. Collapse the corpus to a word-frequency table FIRST. This is the
   only pass that touches every byte (one explode + one groupBy
   shuffle); Zipf's law makes the distinct-word table orders of
   magnitude smaller than the corpus, and it is cached once.
2. Every merge iteration then runs over the word table only: one
   small adjacent-pair aggregation (map-side combinable), one 1-row
   argmax collect (bounded by construction), one literal string
   replace mapped over the table. At 100 TB with a billion distinct
   words this is a per-iteration agg over ~GBs, not TBs — the corpus
   is never re-read.

Cross-engine trick that makes the fit ORACLE-REPLAYABLE: a
segmentation is stored as a DELIM-wrapped string — ``"abc"`` becomes
``"·a··b··c·"`` — so every symbol carries its own delimiters. Applying
merge ``(A, B) -> AB`` is then a single literal
``replace("·A··B·" -> "·AB·")``, and the left-to-right non-overlapping
scan of standard ``replace`` IS greedy BPE merging (adjacent matches
cannot share characters because each symbol owns its wrappers). The
semantics are bit-identical in Spark (``F.replace``) and ANSI SQL
(DuckDB ``replace``), which is what lets the DuckDB oracle replay the
entire fit — every pair count, every argmax, every merge — from the
raw parquet. Symbol counting never splits strings: a segmentation
with k symbols has exactly 2k delimiter characters, so
``k = (len(seg) - len(strip_delims(seg))) / 2``.

Execution surfaces (post-r10): the distributed fit
(``bpe_learn_rules``) and the demo segmenter (``bpe_segment``) are
pure ``pyspark.sql.functions`` — JVM-side, WholeStageCodegen, zero
per-row Python; the fit's only ``.collect()`` is the
1-row-per-iteration argmax, the algorithm's sequential dependency.
The PRODUCTION paths trade that purity for the shapes real trainers
use where the expression paths stop scaling: ``bpe_learn_local``
collects the (Zipf-bounded) word-frequency table and runs the
incremental merge loop driver-side, and ``bpe_segment_prod`` is an
Arrow-batched ``mapInPandas`` rank-loop encoder (the chained-replace
expression cannot PLAN past ~512 merges — measured, see the
docstrings below). No row-at-a-time Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Symbol-wrapper delimiter. The alphabet restriction below guarantees
# it can never appear inside a symbol.
DELIM = "·"

# BPE is learned over lowercase-alpha words only (the standard
# restricted-alphabet setup): keeps DELIM out of symbols and makes the
# word filter identical in Spark rlike and DuckDB regexp_matches.
# \A/\z, not ^/$: Java regex lets $ match BEFORE a final line
# terminator (so rlike('^[a-z]+$') accepts 'world\n') while RE2's $
# is end-of-text — the absolute anchors pin both engines to the same
# token set (the DuckDB oracle's '^[a-z]+$' IS end-of-text in RE2).
WORD_RE = r"\A[a-z]+\z"


def _wrapped(col):
    """'abc' -> '·a··b··c·' (each char wrapped in its own delimiters)."""
    return F.regexp_replace(col, "(.)", DELIM + "$1" + DELIM)


def _merge_pattern(left: str, right: str) -> tuple[str, str]:
    """(search, replacement) literals for merge (left, right)."""
    return (f"{DELIM}{left}{DELIM}{DELIM}{right}{DELIM}",
            f"{DELIM}{left}{right}{DELIM}")


def word_freqs(docs: DataFrame) -> DataFrame:
    """Corpus -> (word, cnt) frequency table, BPE-eligible words only.

    The single corpus-wide pass of the fit: explode whitespace tokens,
    keep lowercase-alpha words, one groupBy. At 100 TB this shuffle is
    keyed on the word itself — uniform under Zipf hashing (the hot
    head words are FEW distinct keys with big partial counts, and the
    map-side combine collapses them before the shuffle)."""
    toks = F.split(F.trim(F.col("text")), " ")
    return (docs
            .select(F.explode(toks).alias("word"))
            .filter(F.col("word").rlike(WORD_RE))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def bpe_learn_rules(docs: DataFrame,
                    n_merges: int = 8) -> list[tuple[str, str, int]]:
    """Fit ``n_merges`` BPE merges; return [(lhs, rhs, pair_count)].

    Greedy argmax per iteration with a fully deterministic tie-break
    (count DESC, lhs ASC, rhs ASC — binary string order, identical in
    Spark and DuckDB). The per-iteration ``.limit(1).collect()`` is
    exactly one row — the algorithm's inherent sequential step."""
    base = word_freqs(docs).select(
        _wrapped(F.col("word")).alias("seg"), "cnt").persist()
    wf = base  # rebound per merge; unpersist must target the CACHED plan
    try:
        rules: list[tuple[str, str, int]] = []
        for _ in range(n_merges):
            syms = F.filter(F.split("seg", DELIM),
                            lambda x: x != F.lit(""))
            ex = (wf.select("cnt", syms.alias("syms"))
                  .filter(F.size("syms") >= 2)
                  .select("cnt", "syms",
                          F.explode(F.sequence(
                              F.lit(1), F.size("syms") - 1)).alias("i")))
            best = (ex.select(
                        "cnt",
                        F.element_at("syms", F.col("i")).alias("l"),
                        F.element_at("syms", F.col("i") + 1).alias("r"))
                    .groupBy("l", "r")
                    .agg(F.sum("cnt").alias("c"))
                    .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                    .limit(1)
                    .collect())
            if not best:  # vocabulary exhausted (every word one symbol)
                break
            l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
            rules.append((l, r, c))
            pat, rep = _merge_pattern(l, r)
            wf = wf.withColumn(
                "seg", F.replace(F.col("seg"), F.lit(pat), F.lit(rep)))
        return rules
    finally:
        base.unpersist()


def bpe_learn_local(docs: DataFrame,
                    n_merges: int = 8) -> list[tuple[str, str, int]]:
    """Production fit: distributed word count, DRIVER-SIDE merge loop.

    The shape real trainers use (HuggingFace tokenizers, SentencePiece
    BPE): the corpus-wide pass is distributed, and once the
    word-frequency table exists the merge loop runs where that table
    fits — 32k merges as a local loop over a dict, not 64k cluster
    jobs of per-iteration scheduling overhead. The ``.collect()`` is
    bounded by the DISTINCT-WORD count (Zipf: ~31k words for the 22 GB
    1000x derivative, see SCALE_RUN_BPE.json — vocabulary grows
    sublinearly in corpus size), not by the corpus. Produces merges
    IDENTICAL to ``bpe_learn_rules`` (same argmax, same count-DESC /
    lhs / rhs tie-break; pinned in tests/test_bpe.py); use the
    distributed loop only when the vocabulary itself cannot fit on
    one node.

    Merge-loop cost is INCREMENTAL, not per-iteration-global (r10;
    the r9 loop recounted every pair over the whole vocabulary each
    merge — O(n_merges x vocab chars), ~20 min extrapolated to a real
    32k-merge vocabulary): see ``bpe_learn_from_counts``, which this
    delegates to after the one distributed corpus pass. Measured:
    32,000 merges over the sf100 vocabulary (31k distinct words) in
    10.4 s end-to-end (SCALE_RUN_BPE_32K.json)."""
    wcount = {r["word"]: int(r["cnt"])
              for r in word_freqs(docs).collect()}
    return bpe_learn_from_counts(wcount, n_merges)


def bpe_learn_from_counts(wcount: dict[str, int],
                          n_merges: int) -> list[tuple[str, str, int]]:
    """The driver-side merge loop over a word-frequency table,
    INCREMENTAL: a pair -> count dict and a pair -> words inverted
    index are maintained by signed per-word deltas when a merge
    rewrites a word, and the argmax pops a lazy-deletion heap keyed
    (-count, lhs, rhs) — the exact count-DESC/lhs/rhs tie-break as a
    tuple order (heap entries are pushed on every count change and
    discarded on pop unless they match the live dict). Total update
    work is bounded by actual merge occurrences (near-linear in
    vocabulary chars), the structure real tokenizer trainers
    maintain. Merge-identical to the textbook global recount —
    pinned by the seeded differential fuzz in tests/test_bpe.py,
    Spark-free here so the fuzz can afford many trials."""
    import heapq

    segs: dict[str, tuple[str, ...]] = {}
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[str]] = {}
    for w, c in wcount.items():
        s = tuple(w)
        segs[w] = s
        for p in zip(s, s[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(w)

    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def bump(p: tuple[str, str], delta: int) -> None:
        c = pair_counts.get(p, 0) + delta
        if c <= 0:
            pair_counts.pop(p, None)
        else:
            pair_counts[p] = c
            # always push the NEW count (up or down — a pop only
            # honors an entry equal to the live count, so the pair
            # must have a current-count entry); stale entries die on
            # pop
            heapq.heappush(heap, (-c, p[0], p[1]))

    rules: list[tuple[str, str, int]] = []
    while len(rules) < n_merges and heap:
        negc, a, b = heapq.heappop(heap)
        cur = pair_counts.get((a, b))
        if cur is None or -negc != cur:
            continue  # stale entry (count changed since push)
        rules.append((a, b, cur))
        merged = a + b
        for w in list(pair_words.get((a, b), ())):
            s = segs[w]
            c = wcount[w]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            ns = tuple(out)
            segs[w] = ns
            # O(len) delta: full before/after pair multisets of this
            # one word, applied ONCE per pair via a single signed
            # delta map (a pair present in both multisets with
            # changed multiplicity must not be adjusted from both
            # directions). Handles every overlap case — 'aaa' under
            # (a,a), a merged symbol immediately re-pairing, etc.
            delta: dict[tuple[str, str], int] = {}
            for p in zip(s, s[1:]):
                delta[p] = delta.get(p, 0) - 1
            for p in zip(ns, ns[1:]):
                delta[p] = delta.get(p, 0) + 1
            for p, d in delta.items():
                if d:
                    bump(p, d * c)
            new_set = set(zip(ns, ns[1:]))
            old_set = set(zip(s, s[1:]))
            for p in old_set - new_set:
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        pair_words.pop(p, None)
            for p in new_set - old_set:
                pair_words.setdefault(p, set()).add(w)
    return rules


def bpe_learn(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """The learned merge table: (merge_rank, lhs, rhs, pair_count).

    Fits via :func:`bpe_learn_local` — one distributed word-count
    pass, then the driver-side incremental merge loop (the production
    path real trainers use). Merge-identical to the distributed
    per-iteration loop ``bpe_learn_rules`` (same argmax and
    count-DESC/lhs/rhs tie-break; both pinned equal in
    tests/test_bpe.py, incl. a seeded differential fuzz), and drops
    its n_merges sequential argmax JOBS: at 8 merges the fit goes
    from 9 cluster round trips to 1."""
    spark = docs.sparkSession
    rules = bpe_learn_local(docs, n_merges=n_merges)
    rows = [(i + 1, l, r, c) for i, (l, r, c) in enumerate(rules)]
    return spark.createDataFrame(
        rows, "merge_rank INT, lhs STRING, rhs STRING, pair_count BIGINT")


def bpe_segment(docs: DataFrame,
                merges: list[tuple[str, str]]) -> DataFrame:
    """Per-document subword statistics under the learned merges.

    Row-local (zero shuffles): the merge list is folded into the plan
    as a chain of literal replaces applied inside a higher-order
    ``transform`` over the document's eligible words — at 100 TB this
    is a map-only pass riding the same scan as any other row-local
    signal. Symbol counting is delimiter arithmetic, no splitting.

    MERGE-COUNT CEILING (measured, r10): each merge adds one nested
    Replace node to a single Catalyst expression tree, and analysis
    recurses over it — a 512-merge chain throws StackOverflowError at
    plan time (256 still plans; the wall is Catalyst recursion depth,
    hit before any codegen limit). This path is therefore for DEMO /
    oracle-replayable merge counts (the gate's n=8) only; production
    vocabularies (2k-32k merges) go through ``bpe_segment_prod``,
    which is pinned output-identical on every corpus where both
    run (tests/test_bpe.py)."""
    toks = F.split(F.trim(F.col("text")), " ")
    words = F.filter(toks, lambda t: t.rlike(WORD_RE))

    def seg_of(w):
        e = _wrapped(w)
        for left, right in merges:
            pat, rep = _merge_pattern(left, right)
            e = F.replace(e, F.lit(pat), F.lit(rep))
        return e

    segs = F.transform(words, seg_of)
    n_sub = F.aggregate(
        segs, F.lit(0).cast("long"),
        lambda acc, s: acc + ((F.length(s) - F.length(
            F.replace(s, F.lit(DELIM), F.lit("")))) / 2).cast("long"))
    n_chars = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w).cast("long"))
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_bpe_words"),
        n_sub.alias("n_subwords"),
        n_chars.alias("n_base_chars"))


def _count_symbols(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Symbol count of ``word`` encoded under rank-ordered merges.

    Iteratively merges the LOWEST-RANK adjacent pair present
    (left-to-right, non-overlapping) until none remains — the
    standard rank-loop BPE encoder. This equals applying the merges
    sequentially in rank order (what ``bpe_segment``'s replace chain
    does): merge k's operands are symbols that exist before rank k,
    and a merge can only CREATE its own output symbol, so applying
    rank j > k can never make a rank-k pair reappear once rank k has
    been exhausted. Pinned against the replace chain AND the
    sequential textbook encoder in tests/test_bpe.py.

    Cost per word is O(len^2) dict lookups worst case — independent
    of n_merges, which is the whole point at a 2k-32k production
    vocabulary (a per-word scan over the merge LIST would be
    O(n_merges * len) and dominated by misses)."""
    syms: list[str] = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            return len(syms)
        a, b = best_pair
        merged = a + b
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def bpe_segment_prod(docs: DataFrame,
                     merges: list[tuple[str, str]],
                     cache_words: int = 1 << 19) -> DataFrame:
    """Production-merge-count segmentation: same output contract as
    ``bpe_segment`` at any vocabulary size.

    ``bpe_segment``'s replace chain is one Catalyst expression node
    per merge and stops PLANNING at ~512 merges (StackOverflowError
    in analysis, measured r10) — a 2k-32k production vocabulary needs
    a different execution shape. This is the one real trainers use
    (HuggingFace tokenizers' encode): broadcast the merge-rank map,
    encode each DISTINCT word once with the rank-loop encoder, look
    everything else up. Concretely, an Arrow-batched ``mapInPandas``
    pass that keeps a word -> symbol-count cache across the
    partition's batches, so per-partition encode work is bounded by
    the partition's DISTINCT eligible words (Zipf: ~31k for the 22 GB
    1000x derivative) while lookups cover the token stream. Still a
    row-local map-only pass — zero shuffles, no corpus re-read, and
    the merge table rides task serialization (2k merges ~ 30 KB;
    a broadcast-map expression lookup would be a LINEAR scan per
    token, see foot-gun notes on ArrayBasedMapData).

    Word eligibility mirrors the JVM path exactly: trim SPACES only
    (Spark ``F.trim``), split on single spaces, keep ``[a-z]+``
    fullmatch (Python ``fullmatch`` is absolute-anchored like
    ``\\A..\\z``, no ``$``-before-trailing-newline trap).

    The merge-rank map travels as a BROADCAST, not a closure capture:
    a production 32k-merge map is ~3 MB pickled, and a closure rides
    EVERY task's serialized payload — at a 100 TB pass with 10^5
    tasks that is hundreds of GB of duplicate shipping, where a
    broadcast ships once per executor.

    Cache memory model (measured, scripts/scale_bpe_cache.py →
    SCALE_RUN_BPE_CACHE.json): entries are the partition's DISTINCT
    eligible words at ~87 bytes each (dict hash table + key
    strings; values are CPython-interned small ints), so at the
    22 GB sf100 tier every partition saturates at the full ~31k Zipf
    vocabulary = ~2.7 MB — vocab-bounded, not corpus-bounded. The
    pathological
    regime is a 10^9-distinct-word corpus where one partition can see
    millions of distinct words (~87 MB/task, × concurrent tasks);
    ``cache_words`` bounds that with a TWO-GENERATION cache (hot dict
    + previous generation, swap when hot fills): O(1) per lookup with
    no per-hit LRU bookkeeping, Zipf-hot words are re-promoted on
    first touch after a swap, and worst-case residency is
    ``cache_words`` entries (~46 MB at the default 2^19). At the
    default the sf100 tier never evicts (31k << 2^19)."""
    import re

    import pandas as pd

    ranks = {(left, right): i for i, (left, right) in enumerate(merges)}
    bc_ranks = docs.sparkSession.sparkContext.broadcast(ranks)
    word_ok = re.compile(r"[a-z]+").fullmatch
    half = max(1, int(cache_words) // 2)

    def encode(batches):
        ranks = bc_ranks.value
        hot: dict[str, int] = {}
        cold: dict[str, int] = {}
        for pdf in batches:
            out_words, out_subs, out_chars = [], [], []
            for text in pdf["text"]:
                if text is None:  # F.size(null array) is NULL upstream
                    out_words.append(None)
                    out_subs.append(None)
                    out_chars.append(None)
                    continue
                n_words = n_subs = n_chars = 0
                for w in text.strip(" ").split(" "):
                    if not w or not word_ok(w):
                        continue
                    k = hot.get(w)
                    if k is None:
                        k = cold.get(w)
                        if k is None:
                            k = _count_symbols(w, ranks)
                        if len(hot) >= half:  # generation swap
                            cold = hot
                            hot = {}
                        hot[w] = k
                    n_words += 1
                    n_subs += k
                    n_chars += len(w)
                out_words.append(n_words)
                out_subs.append(n_subs)
                out_chars.append(n_chars)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bpe_words": pd.Series(out_words, dtype="Int64"),
                "n_subwords": pd.Series(out_subs, dtype="Int64"),
                "n_base_chars": pd.Series(out_chars, dtype="Int64"),
            })

    # spread(): a single-file documents scan is ONE partition, which
    # would serialize the whole corpus's Python encode on one core —
    # the exact failure mode the other mapInPandas operators guard
    # against (see dedup.spread; AQE coalesces the exchange where the
    # scan already has parallelism). 1x vs 2x tasks/core measured
    # WITHIN host noise at the 5M-doc tier (8.2-9.1 s both ways), so
    # this keeps the engine-wide spread() default.
    from deltalake_poc_spark.pipeline.dedup import spread

    return spread(docs.select("doc_id", "text")).mapInPandas(
        encode,
        "doc_id long, n_bpe_words long, n_subwords long, "
        "n_base_chars long")
