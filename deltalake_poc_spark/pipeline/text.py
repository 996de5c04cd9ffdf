"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting — each a declarative DataFrame transform
(pure pyspark.sql.functions, WholeStageCodegen-friendly; no Python
on the hot path). All of these are row-local: they scale linearly,
no shuffle except where a corpus-level aggregate is requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deltalake_poc_spark.exprlit import lit_double_array

# tiny per-language stopword lists for the n-gram/stopword LID heuristic
LID_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
}


def tokens_col(text_col="text"):
    """Whitespace tokenization (plain split — identical semantics in
    Spark and DuckDB, unlike regex splits)."""
    return F.split(F.trim(F.col(text_col)), " ")


def token_counts(docs: DataFrame) -> DataFrame:
    """Per-document token statistics."""
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(F.col("text")).alias("n_chars_actual"),
    )


# BPE-ish pre-tokenization pattern (the GPT-2 style split, restricted
# to constructs whose semantics are identical in Java regex and RE2 so
# the DuckDB oracle can run the same pattern): contractions, letter
# runs, digit runs, single non-space-non-alnum symbols.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_stats(docs: DataFrame,
                    chars_per_piece: float = 4.0) -> DataFrame:
    """Token-count estimation the way a training pipeline budgets
    documents: whitespace words, BPE-ish pre-token pieces (regex
    above), and an estimated subword count (pieces-aware chars/4
    heuristic). Row-local; the regex runs JVM-side via
    regexp_extract_all (no Python)."""
    toks = tokens_col()
    pieces = F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT_PATTERN),
                                  F.lit(0))
    n_pieces = F.size(pieces)
    piece_chars = F.aggregate(
        F.transform(pieces, lambda p: F.length(p)),
        F.lit(0), lambda acc, x: acc + x)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        n_pieces.cast("long").alias("n_pieces"),
        piece_chars.cast("long").alias("n_piece_chars"),
        # ceil-div in integers: deterministic, no float rounding
        F.floor((piece_chars + F.lit(int(chars_per_piece) - 1))
                / F.lit(int(chars_per_piece))).cast("long")
        .alias("est_subwords"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Quality heuristics: length, mean token length, stopword ratio,
    alpha ratio — the standard cheap pre-filters for training corpora."""
    toks = tokens_col()
    n_tokens = F.size(toks)
    n_chars = F.length(F.col("text"))
    stop = LID_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop)))
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round((n_chars - n_tokens + 1) / n_tokens, 4).alias("mean_token_len"),
        F.round(n_stop / n_tokens, 4).alias("stopword_ratio"),
        F.round(alpha_chars / n_chars, 4).alias("alpha_ratio"),
        ((n_tokens >= 10) & (n_tokens <= 100_000)).alias("length_ok"),
    )


# Distilled quality-filter weights: the deployment shape of a trained
# text-quality classifier (fastText/LR distilled to a linear model the
# way production corpus filters ship — training happens offline, the
# corpus-scale pass is a pure row-local projection). Feature order is
# the evaluation order; keep it fixed: z is a left-associated IEEE
# double chain over identical inputs in any engine, so the keep/drop
# decision is bit-deterministic cross-engine.
QUALITY_CLF = {
    "bias": -1.2,
    "mean_token_len": 0.35,
    "stopword_ratio": 4.0,
    "alpha_ratio": 1.5,
    "distinct_ratio": 0.8,
    "log10_tokens": 0.25,
}


def quality_classifier(docs: DataFrame, weights: dict | None = None,
                       threshold: float = 0.0) -> DataFrame:
    """Linear quality classifier over the cheap per-doc features
    (row-local, zero shuffles — at 100 TB this is a map-only pass that
    rides the same scan as any other row-local signal).

    Emits the raw margin ``z`` (bit-deterministic: fixed-order double
    arithmetic over exact integer counts), the sigmoid ``score``
    rounded to 4dp (exp() may differ by an ulp across engines —
    the rounding margin is property-tested like tf_idf's ln), and the
    ``keep`` decision ``z >= threshold`` (pure comparison on the
    deterministic margin, never on the rounded score)."""
    w = weights or QUALITY_CLF
    toks = tokens_col()
    n_tokens = F.size(toks)
    n_chars = F.length(F.col("text"))
    stop = LID_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop)))
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    mean_tl = (n_chars - n_tokens + 1) / n_tokens
    stop_r = n_stop / n_tokens
    alpha_r = alpha_chars / n_chars
    distinct_r = n_distinct / n_tokens
    log_nt = F.log10(n_tokens.cast("double"))
    z = (F.lit(float(w["bias"]))
         + F.lit(float(w["mean_token_len"])) * mean_tl
         + F.lit(float(w["stopword_ratio"])) * stop_r
         + F.lit(float(w["alpha_ratio"])) * alpha_r
         + F.lit(float(w["distinct_ratio"])) * distinct_r
         + F.lit(float(w["log10_tokens"])) * log_nt)
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(z, 6).alias("z"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4).alias("score"),
        (z >= F.lit(float(threshold))).alias("keep"),
    )


def pack_sequences(docs: DataFrame, budget: int = 256,
                   n_shards: int = 32) -> DataFrame:
    """Fixed-budget sequence packing: assign documents (in doc_id
    order) to training sequences of ~``budget`` tokens, the standard
    constant-length example-packing step before tokenization.

    Distributed variant: docs shard by ``doc_id % n_shards`` and pack
    WITHIN shards (training shards are the natural parallel unit), so
    the window sort never funnels the corpus through one partition —
    the exact greedy algorithm is inherently sequential, and this is
    its shard-parallel deployment shape. Boundary semantics: sequence
    k spans the running-token interval (k*budget, (k+1)*budget] and a
    doc belongs to the sequence where its running total STARTED
    (straddling docs overflow, never split), so every non-final
    sequence's token count lies within one max-doc-length of the
    budget — the fixed-grid approximation of greedy packing that a
    window cumsum can express (true greedy resets at each boundary
    and is not window-expressible). Same window expression evaluates
    identically in the SQL oracle.

    Output: one row per packed sequence with doc/token counts and the
    doc_id span, ready to drive a writer that emits one file per
    sequence group."""
    toks = tokens_col()
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = (
        docs.select(
            "doc_id",
            (F.col("doc_id") % n_shards).alias("shard"),
            F.size(toks).cast("long").alias("n_tokens"),
        )
        .withColumn("running", F.sum("n_tokens").over(w))
        .withColumn(
            "seq_id",
            F.floor((F.col("running") - F.col("n_tokens"))
                    / F.lit(int(budget))).cast("long"),
        )
    )
    return (
        assigned.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


def language_id(docs: DataFrame, min_ratio: float = 0.04) -> DataFrame:
    """Stopword-ratio language ID: score per language = fraction of
    tokens that are that language's stopwords; argmax wins if above
    ``min_ratio`` else 'und'. Deterministic, declarative, no UDF."""
    toks = tokens_col()
    n_tokens = F.size(toks)

    def _member_of(sw):
        # single-arg lambda: PySpark HOFs infer lambda-variable count
        # from the function signature, so no default-arg captures
        return lambda t: t.isin(*sw)

    scored = docs.select(
        "doc_id",
        *[
            F.round(
                F.size(F.filter(toks, _member_of(sw))) / n_tokens, 6
            ).alias(f"score_{lang}")
            for lang, sw in LID_STOPWORDS.items()
        ],
    )
    langs = list(LID_STOPWORDS)
    best_score = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    # argmax with first-lang-wins tie-break (stable, portable)
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") >= min_ratio)
            & (F.col(f"score_{lang}") == best_score),
            lang,
        ).otherwise(pred)
    # reversed loop makes earlier langs override later ones on ties
    return scored.select("doc_id", *[f"score_{lang}" for lang in langs],
                         pred.alias("lang_pred"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (the cheap exact-dup key) + a 64-bit rolling-style hash."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
        F.length(norm).alias("n_chars_norm"),
    )


PII_PATTERNS = {
    # simple-syntax patterns valid in both Java regex and RE2
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def scrub_pii(docs: DataFrame, replacement: str = "<PII>") -> DataFrame:
    """Training-corpus PII scrubbing: regex-replace emails / phone
    numbers / SSN-shaped strings, and report per-kind match counts
    (the counts drive filtering policies; the scrub drives the copy
    that ships). Row-local, no shuffle."""
    scrubbed = F.col("text")
    for pat in PII_PATTERNS.values():
        scrubbed = F.regexp_replace(scrubbed, pat, replacement)
    out = docs.select(
        "doc_id",
        scrubbed.alias("text_scrubbed"),
        *[
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
            .alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS.items()
        ],
    )
    return out


def tf_idf(docs: DataFrame, min_df: int = 1,
           rounded: bool = True) -> DataFrame:
    """Corpus TF-IDF: (doc_id, token, tf, df, tfidf) with the smooth
    idf = ln((N+1)/(df+1)) + 1. Two shuffles (token counts per doc;
    document frequency per token joined back on the token key).

    Cross-engine note: ln() is the one transcendental in the oracle
    surface; JVM and DuckDB may differ by <=1 ulp, which only matters
    if a value sits within ~1 ulp of a 4dp rounding boundary.
    ``rounded=False`` exposes the raw product as ``tfidf_raw`` so the
    margin invariant is testable (test_tf_idf_ln_agreement_pinned)."""
    toks = tokens_col()
    # explode_outer: plain explode triggers InferFiltersFromGenerate,
    # which clones the tokenizer into a pre-Generate filter (split()
    # evaluated twice per document); outer explode is exempt and the
    # != '' filter on the OUTPUT column also drops the null rows
    posting = (
        docs.select("doc_id", F.explode_outer(toks).alias("token"))
        .filter(F.col("token").isNotNull() & (F.col("token") != ""))
    )
    tf = posting.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"))
    df_ = (tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
           .filter(F.col("df") >= min_df))
    n_docs = docs.select("doc_id").distinct().count()
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + 1.0)) + 1.0
    out = tf.join(df_, "token")
    if not rounded:
        return out.select("doc_id", "token", "tf", "df",
                          (F.col("tf") * idf).alias("tfidf_raw"))
    return out.select("doc_id", "token", "tf", "df",
                      F.round(F.col("tf") * idf, 4).alias("tfidf"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Split documents into overlapping token-window chunks (the
    standard pre-tokenization step for training/embedding pipelines).
    Stride = chunk_tokens - overlap; the last partial window is kept.
    Row-local (sequence/transform/slice + posexplode) — no shuffle,
    scales linearly with corpus size."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_col()
    n = F.size(F.col("__toks"))
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("__toks"), (i * stride).cast("int") + 1,
                         chunk_tokens)),
    )
    return (
        docs.select("doc_id", toks.alias("__toks"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn("n_chunk_tokens",
                    F.size(F.split(F.col("chunk_text"), " ")))
    )


def all_ngrams_col(tokens_col, n: int):
    """ALL word n-grams (multiplicities kept — unlike
    dedup.word_ngrams_col, which distincts for set-Jaccard). Docs
    shorter than n tokens yield an empty array.

    PRECONDITION: array elements must be non-null. The gram pieces
    are joined with null-PROPAGATING concat (a null token nulls its
    grams), unlike the pre-r11 concat_ws build which silently skipped
    null tokens and emitted partial grams. Every current caller
    tokenizes via split(), which never produces null elements; a
    future caller with nullable tokens must filter() or coalesce them
    first.

    Built by zip_with over n SHIFTED slices of the token array, not
    transform(sequence, i -> concat_ws(slice(t, i, n))): the latter
    allocates an n-element array PER GRAM inside the interpreted
    lambda, and that per-element slice was ~80% of
    repetition_signals' tier wall (measured at sf10: bigram
    construction 9.6 s -> 2.0 s, trigram 11.5 s -> 1.8 s; the shifted
    slices allocate once per DOCUMENT). Output identical, pinned in
    tests."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    m = F.size(t) - (n - 1)
    grams = F.slice(t, 1, m)
    for j in range(2, n + 1):
        grams = F.zip_with(grams, F.slice(t, j, m),
                           lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def _gram_profile(tokens_col, n: int):
    """struct(n, nd, top): total grams, distinct grams, and max
    multiplicity of any single gram — computed ROW-LOCALLY with one
    sort + one fold over the doc's gram array. The relational
    formulation (explode -> groupBy(doc, gram) -> max) shuffles every
    gram in the corpus twice; this shuffles nothing, which is the
    difference between a metadata job and a corpus-sized job at 100 TB.
    Duplicates are adjacent after array_sort, so one pass tracking
    (prev, current run, best run, total, distinct) suffices."""
    grams = F.array_sort(all_ngrams_col(tokens_col, n))
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best"),
        zero.alias("n"), zero.alias("nd"),
    )

    def step(acc, x):
        run = (F.when(x == acc["prev"], acc["run"] + 1)
               .otherwise(F.lit(1).cast("long")))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (acc["n"] + 1).alias("n"),
            (acc["nd"] + F.when(x == acc["prev"], F.lit(0))
             .otherwise(F.lit(1))).alias("nd"),
        )

    return F.aggregate(
        grams, init, step,
        lambda a: F.struct(a["n"].alias("n"), a["nd"].alias("nd"),
                           a["best"].alias("top")))


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals, all-integer outputs
    (integer columns hash identically across engines; consumers derive
    the published ratios — e.g. top_bigram_count/n_bigrams is the
    'fraction of n-grams in the most common n-gram' filter). Row-local:
    scales linearly with corpus size, zero shuffles."""
    with_toks = docs.select("doc_id", tokens_col().alias("__toks"))
    b = _gram_profile("__toks", 2)
    t = _gram_profile("__toks", 3)
    # explode of a 1-element array = a Generate barrier: higher-order
    # folds are interpreted (no codegen, no common-subexpression
    # elimination), so extracting 6 fields straight off the two fold
    # expressions would re-run each sort+fold per field. Behind the
    # barrier each profile is computed exactly once per row.
    prof = with_toks.select(
        "doc_id",
        F.explode(F.array(F.struct(b.alias("b"), t.alias("t")))).alias("__p"),
    )
    return prof.select(
        "doc_id",
        F.col("__p.b.n").alias("n_bigrams"),
        F.col("__p.b.nd").alias("n_distinct_bigrams"),
        F.col("__p.b.top").alias("top_bigram_count"),
        F.col("__p.t.n").alias("n_trigrams"),
        F.col("__p.t.nd").alias("n_distinct_trigrams"),
        F.col("__p.t.top").alias("top_trigram_count"),
    )


def top_tokens(docs: DataFrame, k: int = 10) -> DataFrame:
    """Corpus-level token frequency top-k (the classic map-side-combine
    aggregation: explode -> partial count -> final count -> TakeOrdered)."""
    return (
        # explode_outer: see tf_idf — avoids the InferFilters clone of
        # the tokenizer into a pre-Generate filter
        docs.select(F.explode_outer(tokens_col()).alias("token"))
        .filter(F.col("token").isNotNull() & (F.col("token") != ""))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )


def token_drift(docs: DataFrame, side_col, k: int = 50) -> DataFrame:
    """Corpus drift monitor: which tokens are most over-represented in
    one half of a corpus vs the other (two snapshots, two sources, two
    time windows — anything ``side_col`` can label 'a' or 'b').

    The divergence score per token is the EXACT integer cross product
    ``count_a * total_b - count_b * total_a`` — positive means
    over-represented in side a; |score| orders tokens by how far their
    frequency ratio diverges, with zero float arithmetic, so any
    engine reproduces the ranking bit-for-bit. (At extreme corpus
    sizes where count * total would overflow int64, normalize counts
    to integer parts-per-million first — same ranking, bounded
    operands.)

    Scale shape: one explode -> groupBy(token) shuffle carrying
    (token, side) pairs; totals are a two-row aggregate broadcast
    back. Top-k by (|score| desc, token) is a TakeOrdered, not a full
    sort.
    """
    side = side_col if not isinstance(side_col, str) else F.col(side_col)
    toks = (
        docs.select(side.alias("__side"), tokens_col().alias("__t"))
        .select("__side", F.explode_outer("__t").alias("token"))
        .filter(F.col("token").isNotNull() & (F.col("token") != ""))
    )
    counts = (
        toks.groupBy("token")
        .agg(F.sum(F.when(F.col("__side") == "a", 1).otherwise(0))
             .cast("long").alias("count_a"),
             F.sum(F.when(F.col("__side") == "b", 1).otherwise(0))
             .cast("long").alias("count_b"))
    )
    totals = counts.agg(F.sum("count_a").alias("__ta"),
                        F.sum("count_b").alias("__tb"))
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "token", "count_a", "count_b",
        (F.col("count_a") * F.col("__tb")
         - F.col("count_b") * F.col("__ta")).alias("drift"))
    return (scored
            .orderBy(F.abs(F.col("drift")).desc(), F.col("token").asc())
            .limit(k))


def sketch_distinct_rollup(docs: DataFrame, strata_col: str = "source",
                           text_col: str = "text",
                           max_rel_err_pct: float = 5.0) -> DataFrame:
    """Mergeable-sketch distinct-token accounting per stratum — the
    100 TB vocabulary-monitoring pattern: each partition/day/source
    builds an HLL sketch of its tokens (Spark's DataSketches
    hll_sketch_agg, map-side combinable), and corpus-level distincts
    come from hll_union_agg over the tiny per-stratum sketches — NO
    re-scan of the corpus to roll up, which is the whole point of a
    mergeable summary (a COUNT(DISTINCT) rollup would shuffle every
    token again; sketch union shuffles kilobytes).

    Because HLL estimates are not bit-portable across engines, the
    returned frame carries EXACT integer distincts (gate-safe); the
    sketch path is SELF-CHECKING instead: per-stratum estimates and
    the union rollup are computed eagerly here and a RelativeError >
    ``max_rel_err_pct`` raises — so the driver row also certifies the
    sketch machinery, the way skipping_read certifies pruning.

    Returns (strata, n_tokens, distinct_tokens) plus one __ALL__ row
    with the corpus totals.
    """
    toks = (
        docs.select(F.col(strata_col).alias("__strata"),
                    tokens_col(text_col).alias("__t"))
        .select("__strata", F.explode_outer("__t").alias("token"))
        .filter(F.col("token").isNotNull() & (F.col("token") != ""))
    )
    from deltalake_poc_spark.analytics.scratch import scratch_persist

    # the per-stratum aggregate feeds the eager self-checks AND the
    # returned plan: scratch-persist it (released on the next
    # invocation) so the token explode+aggregate runs once, not three
    # times (tiny frame — one row per stratum)
    per = scratch_persist(
        "text.sketch_rollup.per",
        toks.groupBy("__strata")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
             F.countDistinct("token").alias("distinct_tokens"),
             F.hll_sketch_agg("token").alias("__sk"),
             F.hll_sketch_estimate(
                 F.hll_sketch_agg("token")).alias("__est")))
    # self-check 1: per-stratum estimate within tolerance of exact
    rows = per.select("__strata", "n_tokens", "distinct_tokens",
                      "__est", "__sk").collect()
    for r in rows:
        exact, est = r["distinct_tokens"], r["__est"]
        if exact > 0 and abs(est - exact) / exact * 100 > max_rel_err_pct:
            raise AssertionError(
                f"HLL estimate off by >{max_rel_err_pct}% for "
                f"{r['__strata']}: est {est} vs exact {exact}")
    # self-check 2: the union of per-stratum sketches (merge-only, no
    # token re-scan) matches the exact corpus-wide distinct count
    union_est = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("e")
    ).collect()[0]["e"]
    total_exact = toks.agg(
        F.countDistinct("token").alias("d"),
        F.count(F.lit(1)).cast("long").alias("n")).collect()[0]
    if total_exact["d"] > 0 and \
            abs(union_est - total_exact["d"]) / total_exact["d"] * 100 \
            > max_rel_err_pct:
        raise AssertionError(
            f"HLL union estimate off by >{max_rel_err_pct}%: "
            f"{union_est} vs exact {total_exact['d']}")
    spark = docs.sparkSession
    all_row = spark.createDataFrame(
        [("__ALL__", int(total_exact["n"]), int(total_exact["d"]))],
        "__strata string, n_tokens long, distinct_tokens long")
    return (per.select("__strata", "n_tokens", "distinct_tokens")
            .unionByName(all_row)
            .select(F.col("__strata").alias(strata_col),
                    "n_tokens", "distinct_tokens"))


def length_quantiles(docs: DataFrame, strata_col: str = "source",
                     text_col: str = "text",
                     percents: tuple[int, ...] = (25, 50, 90, 99),
                     accuracy: int = 200) -> DataFrame:
    """Token-length distribution profile per stratum plus a corpus
    ``__ALL__`` row — the shape-of-the-data monitor a training corpus
    needs (is one source all tweets? did a filter chop the p99 tail?).

    Two paths, same numbers:

    - the RETURNED columns are EXACT discrete quantiles (the element
      at 1-indexed rank ``(p*(n-1)) div 100 + 1`` of the ascending
      lengths) — pure integer arithmetic, so any engine reproduces
      them bit-for-bit (gate-safe). Exactness costs a per-stratum
      sort; that is the certification path.
    - the SCALE path is ``percentile_approx`` — a mergeable
      Greenwald-Khanna summary that partial-aggregates map-side
      (kilobyte summaries shuffle, not rows; no sort). It is
      SELF-CHECKING here: for every (stratum, p) the approx value's
      true rank window (#shorter .. #not-longer, one conditional
      aggregate for all pairs) must overlap the target rank ±
      ``n/accuracy + 1``, the GK guarantee — a violation raises, so a
      green driver row certifies the sketch machinery too (the
      sketch_distinct_rollup contract, applied to quantiles).

    Returns (strata, n_docs, p25, p50, p90, p99) as longs.
    """
    lens = docs.select(
        F.col(strata_col).alias("__strata"), F.col("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"))
    both = lens.unionByName(lens.withColumn("__strata", F.lit("__ALL__")))
    rank_w = Window.partitionBy("__strata").orderBy("n_tokens", "doc_id")
    n_w = Window.partitionBy("__strata")
    ranked = both.select(
        "__strata", "n_tokens",
        F.row_number().over(rank_w).alias("__rn"),
        F.count(F.lit(1)).over(n_w).alias("__n"))

    def _target(p: int):
        # 1-indexed discrete-quantile rank, exact integer arithmetic
        return F.expr(f"({p} * (__n - 1)) DIV 100 + 1")

    per = ranked.groupBy("__strata").agg(
        F.max("__n").alias("n_docs"),
        *[F.max(F.when(F.col("__rn") == _target(p), F.col("n_tokens")))
          .alias(f"p{p}") for p in percents])

    # --- self-check: mergeable-summary quantiles within GK tolerance
    approx = both.groupBy("__strata").agg(
        F.percentile_approx(
            "n_tokens", lit_double_array([p / 100.0 for p in percents]),
            F.lit(accuracy)).alias("__ap"),
        F.count(F.lit(1)).alias("__n")).collect()
    # one conditional aggregate computes every pair's rank window;
    # each agg rides as one parsed SQL string — 2 py4j calls per
    # (stratum, p) pair instead of ~20 (the exprlit rule)
    aggs, meta = [], []
    for i, r in enumerate(approx):
        for j, p in enumerate(percents):
            v = int(r["__ap"][j])
            # Spark SQL string literals use BACKSLASH escapes (quote-
            # doubling '' is literal concatenation, not an escape), so
            # escape \ and ' with backslash semantics; a NULL stratum
            # gets an IS NULL branch (no quoting at all)
            if r["__strata"] is None:
                s = "(__strata IS NULL)"
            else:
                esc = (r["__strata"].replace("\\", "\\\\")
                       .replace("'", "\\'"))
                s = f"(__strata = '{esc}')"
            aggs.append(F.expr(
                f"sum(CASE WHEN {s} AND (n_tokens < {v}L) THEN 1 "
                f"ELSE 0 END) AS lt_{i}_{j}"))
            aggs.append(F.expr(
                f"sum(CASE WHEN {s} AND (n_tokens <= {v}L) THEN 1 "
                f"ELSE 0 END) AS le_{i}_{j}"))
            meta.append((i, j, r["__strata"], p, v, r["__n"]))
    bounds = both.agg(*aggs).collect()[0]
    for i, j, strata, p, v, n in meta:
        lo, hi = bounds[f"lt_{i}_{j}"] + 1, bounds[f"le_{i}_{j}"]
        target = p * (n - 1) // 100 + 1
        eps_rank = n // accuracy + 1
        if not (lo - eps_rank <= target <= hi + eps_rank):
            raise AssertionError(
                f"percentile_approx p{p} for {strata!r} returned {v} "
                f"(rank window [{lo},{hi}]) outside GK tolerance "
                f"±{eps_rank} of target rank {target} (n={n})")

    return per.select(F.col("__strata").alias(strata_col), "n_docs",
                      *[f"p{p}" for p in percents])


def heavy_hitters(docs: DataFrame, strata_col: str = "source",
                  text_col: str = "text", k: int = 5,
                  eps: float = 0.001, confidence: float = 0.99,
                  seed: int = 42) -> DataFrame:
    """Per-stratum top-k tokens plus a corpus ``__ALL__`` top-k — the
    boilerplate/contamination tripwire (a token whose corpus share
    jumps is usually a template, a scraped nav bar, or an injection).

    Exact path (the RETURNED rows, gate-safe): one explode ->
    groupBy(strata, token) shuffle; per-stratum top-k is a rank
    window over the already-aggregated counts; the corpus top-k is
    rolled up FROM the per-stratum counts — no second scan of the
    corpus, the same no-rescan contract the HLL rollup pins.

    Sketch path (self-checking): per-stratum Count-Min sketches
    (``count_min_sketch`` aggregate — map-side combinable, KB each)
    are collected and merged driver-side (``mergeInPlace``) exactly
    like the engine's bloom filters; for every reported token the CMS
    estimate must satisfy ``exact <= est <= exact + ceil(eps * N)``
    (the CMS deterministic lower bound and its confidence-bounded
    upper bound) at both stratum and merged-corpus level, else this
    raises. That certifies the pattern a 100 TB monitor runs: shards
    publish KB sketches, the rollup merges summaries, never rows.

    Returns (strata, token, freq, rank) with rank 1..k per stratum by
    (freq desc, token asc) — all exact integers.
    """
    from deltalake_poc_spark.analytics.scratch import scratch_persist

    toks = (
        docs.select(F.col(strata_col).alias("__strata"),
                    tokens_col(text_col).alias("__t"))
        .select("__strata", F.explode_outer("__t").alias("token"))
        .filter(F.col("token").isNotNull() & (F.col("token") != ""))
    )
    counts = scratch_persist(
        "text.heavy_hitters.counts",
        toks.groupBy("__strata", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq")))
    rank_w = Window.partitionBy("__strata").orderBy(
        F.desc("freq"), F.asc("token"))
    per_top = (counts
               .withColumn("rank", F.row_number().over(rank_w))
               .filter(F.col("rank") <= k))
    corpus = (counts.groupBy("token")
              .agg(F.sum("freq").cast("long").alias("freq"))
              .withColumn("__strata", F.lit("__ALL__")))
    corpus_top = (corpus
                  .withColumn("rank", F.row_number().over(rank_w))
                  .filter(F.col("rank") <= k)
                  .select("__strata", "token", "freq", "rank"))
    result = per_top.select("__strata", "token", "freq", "rank") \
        .unionByName(corpus_top)

    # --- self-check: per-stratum CMS + driver-side merged rollup
    spark = docs.sparkSession
    sketches = (toks.groupBy("__strata")
                .agg(F.count_min_sketch(
                        "token", F.lit(eps), F.lit(confidence),
                        F.lit(seed)).alias("__sk"),
                     F.count(F.lit(1)).cast("long").alias("__n"))
                ).collect()
    if not sketches:
        # empty / whitespace-only corpus: zero tokens means zero
        # sketch rows AND zero reported rows — nothing to cross-check,
        # and sketches[0] below would IndexError.
        return result.select(F.col("__strata").alias(strata_col),
                             "token", "freq", "rank")
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    by_strata = {r["__strata"]: (jcms.readFrom(bytes(r["__sk"])),
                                 r["__n"]) for r in sketches}
    total_n = sum(n for _, n in by_strata.values())
    # merge into a FRESH deserialization so the per-stratum sketches
    # in by_strata stay pristine (mergeInPlace mutates the receiver)
    merged = jcms.readFrom(bytes(sketches[0]["__sk"]))
    for r in sketches[1:]:
        merged.mergeInPlace(jcms.readFrom(bytes(r["__sk"])))
    reported = result.collect()
    import math
    for row in reported:
        strata, token, exact = row["__strata"], row["token"], row["freq"]
        if strata == "__ALL__":
            sk, n = merged, total_n
        else:
            sk, n = by_strata[strata]
        est = sk.estimateCount(token)
        if not (exact <= est <= exact + max(1, math.ceil(eps * n))):
            raise AssertionError(
                f"CMS estimate {est} for {token!r} in {strata!r} "
                f"outside [{exact}, {exact} + ceil({eps}*{n})]")
    return result.select(F.col("__strata").alias(strata_col),
                         "token", "freq", "rank")


# --------------------------------------------------------- bigram LM

def lm_bigram_score(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    rounded: bool = True, min_count: int = 1,
                    broadcast_model: bool = True) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood — the classic
    perplexity quality filter (CCNet / LLaMA-style: score text against
    an n-gram language model; unusually-high NLL = boilerplate, noise,
    wrong language). The model here is add-one-smoothed bigrams
    TRAINED ON THE CORPUS ITSELF:

        p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)
        nll_token(d) = − Σ_i ln p(tok_i | tok_{i-1}) / (|d| − 1)

    Scale shape: ONE map-side-combined shuffle each for unigram and
    bigram counts (bounded by the observed vocabulary, not the
    corpus); the log-prob table is BROADCAST-JOINED onto the exploded
    per-document bigrams (never a data-sized shuffle of the model
    side), then one groupBy(doc) reassembles per-document scores. At
    100 TB the production variant scores against a FIXED reference LM
    (the CCNet pattern — the model is KB-GB and broadcastable no
    matter how big the scored corpus is); training in-corpus at that
    scale means capping the vocabulary (top-K by count) and pruning
    rare bigrams — both just filters on the count aggregates upstream
    of the same broadcast.

    Why a join and not a broadcast MAP column: Spark's ``element_at``
    on a map is a LINEAR scan of the map's key array per lookup
    (ArrayBasedMapData carries no hash index), so map-lookup scoring
    degrades O(model_size) per gram — measured 40x+ super-linear on
    the 10x derivative whose rotation-renamed vocabulary grows the
    model 10x. The broadcast hash join does the same lookup against a
    real hash table.

    Cross-engine determinism: every count is an exact integer; each
    document folds its ln-probabilities in SORTED-(bigram, lp)
    left-assoc order from 0.0 (collect_list order is nondeterministic,
    so the collected (bigram, lp) structs are array_sort'ed first —
    duplicate bigrams carry identical lp, so the value sequence is
    total-ordered and both engines add the same doubles in the same
    sequence); ROUND(·,4) absorbs ≤1-ulp ln() differences (margin
    test pinned alongside tf_idf's). Docs with <2 tokens score 0.0.

    The two scale knobs the 100 TB docstring above promises are real
    parameters: ``min_count`` prunes bigrams seen fewer times from
    the MODEL — a pruned (or never-seen) bigram falls back to the
    add-one unseen probability 1/(c(w1)+V), so min_count=1 is
    bit-identical to the unpruned model and larger values only shrink
    the model table (classic n-gram pruning); ``broadcast_model=False``
    drops the broadcast hint on the model join so AQE picks the
    strategy — required once the in-corpus model outgrows broadcast
    range (measured at the 1000× tier, SCALE.md).

    Returns (id, n_bigrams, nll_token) — unrounded ``nll_raw`` when
    ``rounded=False`` (for the margin test)."""
    from .dedup import _explode_posting

    toks = tokens_col(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                   F.slice(toks, 2, F.size(toks) - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b))
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(F.col(id_col), toks.alias("__t"),
                       bigrams.alias("__bg"))

    uni = (_explode_posting(base, "__t", "__w", keys=())
           .groupBy("__w").agg(F.count(F.lit(1)).alias("__cu")))
    vocab = uni.agg(F.count(F.lit(1)).alias("__v"))
    bic = (_explode_posting(base, "__bg", "__b", keys=())
           .groupBy("__b").agg(F.count(F.lit(1)).alias("__cb")))
    kept = bic if min_count <= 1 else bic.filter(
        F.col("__cb") >= int(min_count))
    lnp = (kept
           .join(uni, F.substring_index(F.col("__b"), " ", 1)
                 == F.col("__w"))
           .crossJoin(F.broadcast(vocab))
           .select("__b", F.log(
               (F.col("__cb") + 1).cast("double")
               / (F.col("__cu") + F.col("__v")).cast("double"))
               .alias("__lp")))
    model = F.broadcast(lnp) if broadcast_model else lnp
    # hash-join the model onto the exploded doc bigrams, then
    # reassemble per doc with a canonical sorted fold
    posting = _explode_posting(base, "__bg", "__b", keys=(id_col,))
    if min_count <= 1:
        # every observed bigram is in the unpruned model: inner join
        hit = posting.join(model, "__b")
    else:
        # pruned bigrams fall back to the add-one unseen probability
        # 1/(c(w1)+V) — the same number the model would give cb=0
        uni1 = F.broadcast(uni.select(F.col("__w").alias("__w1"),
                                      F.col("__cu").alias("__cu1")))
        hit = (posting.join(model, "__b", "left")
               .join(uni1, F.substring_index(F.col("__b"), " ", 1)
                     == F.col("__w1"))
               .crossJoin(F.broadcast(vocab))
               .select(id_col, "__b", F.coalesce(
                   F.col("__lp"),
                   F.log(F.lit(1.0)
                         / (F.col("__cu1") + F.col("__v"))
                         .cast("double"))).alias("__lp")))
    scored = (hit
              .groupBy(id_col)
              .agg(F.array_sort(
                  F.collect_list(F.struct("__b", "__lp"))).alias("__e")))
    total = F.aggregate(F.col("__e"), F.lit(0.0),
                        lambda acc, s: acc + s["__lp"])
    # explicit isNull branch, not coalesce(size(...)): size(NULL) is
    # NULL only under ANSI mode / legacy.sizeOfNull=false; on stock
    # Spark 3.x defaults it is -1 and coalesce would never fire,
    # emitting (n_bigrams=-1, NULL score) for zero-bigram docs. This
    # form is config-independent.
    n_bg = (F.when(F.col("__e").isNull(), F.lit(0))
            .otherwise(F.size("__e")))
    nll = (-total) / n_bg.cast("double")
    out_col = (F.when(n_bg == 0, F.lit(0.0))
               .otherwise(F.round(nll, 4)).alias("nll_token")
               if rounded else
               F.when(n_bg == 0, F.lit(0.0))
               .otherwise(nll).alias("nll_raw"))
    return (base.select(id_col)
            .join(scored, id_col, "left")  # zero-bigram docs keep rows
            .select(F.col(id_col), n_bg.cast("long").alias("n_bigrams"),
                    out_col)
            .orderBy(id_col))


def lm_trigram_backoff_score(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             alpha: float = 0.4,
                             min_count3: int = 1, min_count2: int = 1,
                             rounded: bool = True) -> DataFrame:
    """Per-document trigram-LM NLL with STUPID BACKOFF (Brants et
    al. 2007 — the web-scale smoothing: no discount bookkeeping,
    just a fixed backoff factor), trained on the corpus itself:

        S(w3|w1 w2) = c(w1w2w3)/c(w1w2)          if c(w1w2w3) > 0
                    = a * c(w2w3)/c(w2)          elif c(w2w3) > 0
                    = a^2 * c(w3)/N              otherwise
        nll_token(d) = - SUM_i ln S(tok_i | ctx) / (|d| - 2)

    Stupid backoff produces SCORES, not normalized probabilities —
    precisely why it's the scheme used at 100 TB (each level is a
    plain count ratio; no cross-level normalization pass).

    Scale shape mirrors lm_bigram_score: three vocabulary-bounded
    count shuffles (tri/bi/uni, all map-side combined) + one 1-row
    token total; scoring is the exploded per-doc trigrams
    hash-joined (broadcast) against the tri/bi/uni count tables —
    the backoff CASE is evaluated per gram from joined counts, so
    no per-row Python and no model-sized shuffle. Every count is an
    exact integer and each doc folds ln-scores in sorted order, so
    the DuckDB oracle recomputes bit-for-bit (ROUND(.,4) absorbs
    <=1-ulp ln differences). Docs with <3 tokens score 0.0.

    ``min_count3`` / ``min_count2`` prune the trigram / bigram
    MODEL tables (the 100 TB model-size lever, as in
    lm_bigram_score) — and they are what makes backoff LIVE when
    training in-corpus: unpruned, every scored trigram was seen in
    training and the first branch always wins. A pruned trigram
    backs off to the bigram level, a pruned bigram to the unigram
    level. Denominators stay UNPRUNED counts (c(w1w2), c(w2), N are
    context totals, not model entries)."""
    from .dedup import _explode_posting

    toks = tokens_col(text_col)
    n = F.size(toks)
    trigrams = F.when(
        n >= 3,
        F.zip_with(
            F.zip_with(F.slice(toks, 1, n - 2), F.slice(toks, 2, n - 2),
                       lambda a, b: F.concat(a, F.lit(" "), b)),
            F.slice(toks, 3, n - 2),
            lambda ab, c: F.concat(ab, F.lit(" "), c)),
    ).otherwise(F.array().cast("array<string>"))
    bigrams = F.when(
        n >= 2,
        F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
    ).otherwise(F.array().cast("array<string>"))
    # the tokenize/explode work below is CPU-bound per row: spread it
    # across cores when the scan partitioning is narrower than the
    # session (locally the corpus is ONE parquet file -> the count
    # fill and the scoring pass each ran as a single task); on a
    # production table the split count already covers the cluster and
    # the probe skips the exchange (guide §2: parallelism follows the
    # data, not a constant)
    from .dedup import spread_if_narrow

    base = spread_if_narrow(docs).select(
        F.col(id_col), toks.alias("__t"),
        bigrams.alias("__bg"), trigrams.alias("__tg"))

    # ALL THREE model count tables from ONE corpus pass: each gram
    # rides as a (level, gram) struct in one concatenated array, so
    # uni/bi/tri counts come out of a single explode + groupBy instead
    # of three separate scans that each re-tokenize the corpus (the
    # plan had 3 extra full passes; at 100 TB those are the cost).
    # The aggregate is vocabulary-bounded, so it scratch-persists
    # (bounded one-live-cache registry) and the three broadcast
    # builds below read the cache instead of re-counting.
    # explode_outer + output-null filter per the _explode_posting
    # rule; (level, gram) keys cannot collide across levels.
    from deltalake_poc_spark.analytics.scratch import scratch_persist

    lvl_arr = F.concat(
        F.transform(F.col("__t"),
                    lambda w: F.struct(F.lit(1).alias("l"), w.alias("g"))),
        F.transform(F.col("__bg"),
                    lambda b: F.struct(F.lit(2).alias("l"), b.alias("g"))),
        F.transform(F.col("__tg"),
                    lambda g: F.struct(F.lit(3).alias("l"), g.alias("g"))))
    counts = scratch_persist(
        "text.lm3.counts",
        base.select(F.explode_outer(lvl_arr).alias("__e"))
        .filter(F.col("__e").isNotNull())
        .groupBy(F.col("__e.l").alias("__l"), F.col("__e.g").alias("__gr"))
        .agg(F.count(F.lit(1)).alias("__c")))
    uni = counts.filter(F.col("__l") == 1).select(
        F.col("__gr").alias("__w"), F.col("__c").alias("__cu"))
    bic = counts.filter(F.col("__l") == 2).select(
        F.col("__gr").alias("__b"), F.col("__c").alias("__cb"))
    tric = counts.filter(F.col("__l") == 3).select(
        F.col("__gr").alias("__g"), F.col("__c").alias("__ct"))
    total_n = uni.agg(F.sum("__cu").cast("long").alias("__n"))

    posting = _explode_posting(base, "__tg", "__g", keys=(id_col,))
    w12 = F.substring_index(F.col("__g"), " ", 2)
    w23 = F.substring_index(F.col("__g"), " ", -2)
    w3 = F.substring_index(F.col("__g"), " ", -1)
    kept3 = tric if min_count3 <= 1 else tric.filter(
        F.col("__ct") >= int(min_count3))
    kept2 = bic if min_count2 <= 1 else bic.filter(
        F.col("__cb") >= int(min_count2))
    ctx12 = F.broadcast(bic.select(F.col("__b").alias("__b12"),
                                   F.col("__cb").alias("__c12")))
    back23 = F.broadcast(kept2.select(F.col("__b").alias("__b23"),
                                      F.col("__cb").alias("__c23")))
    uni2 = F.broadcast(uni.select(F.col("__w").alias("__w2"),
                                  F.col("__cu").alias("__cu2")))
    uni3 = F.broadcast(uni.select(F.col("__w").alias("__w3"),
                                  F.col("__cu").alias("__cu3")))
    la = F.lit(float(alpha))
    hit = (posting
           .join(F.broadcast(kept3), "__g", "left")
           .join(ctx12, w12 == F.col("__b12"), "left")
           .join(back23, w23 == F.col("__b23"), "left")
           .join(uni2, F.substring_index(w23, " ", 1) == F.col("__w2"))
           .join(uni3, w3 == F.col("__w3"))
           .crossJoin(F.broadcast(total_n))
           .select(
               id_col, "__g",
               F.when(F.col("__ct").isNotNull(),
                      F.log(F.col("__ct").cast("double")
                            / F.col("__c12").cast("double")))
               .when(F.col("__c23").isNotNull(),
                     F.log(la * F.col("__c23").cast("double")
                           / F.col("__cu2").cast("double")))
               .otherwise(
                   F.log(la * la * F.col("__cu3").cast("double")
                         / F.col("__n").cast("double")))
               .alias("__lp")))
    scored = (hit.groupBy(id_col)
              .agg(F.array_sort(
                  F.collect_list(F.struct("__g", "__lp"))).alias("__e")))
    n_tg = (F.when(F.col("__e").isNull(), F.lit(0))
            .otherwise(F.size("__e")))
    total = F.aggregate(F.col("__e"), F.lit(0.0),
                        lambda acc, s: acc + s["__lp"])
    nll = (-total) / n_tg.cast("double")
    out_col = (F.when(n_tg == 0, F.lit(0.0))
               .otherwise(F.round(nll, 4)).alias("nll_token")
               if rounded else
               F.when(n_tg == 0, F.lit(0.0))
               .otherwise(nll).alias("nll_raw"))
    return (base.select(id_col)
            .join(scored, id_col, "left")
            .select(F.col(id_col), n_tg.cast("long").alias("n_trigrams"),
                    out_col)
            .orderBy(id_col))
