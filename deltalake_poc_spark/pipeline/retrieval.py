"""BM25 full-text retrieval over the documents corpus.

Okapi BM25 (Robertson & Walker, public literature; the Lucene-style
robust idf ln(1 + (N − df + 0.5)/(df + 0.5)) that never goes
negative). This is the lexical-retrieval counterpart to the
embedding ANN operators in pipeline/similarity.py — the other half
of what a training-data pipeline needs for targeted corpus probes
(find documents about X, audit contamination for a benchmark query,
seed DSIR targets).

Execution shape, chosen for 100 TB: a BM25 *query* is a handful of
terms, so there is no reason to build or shuffle a posting list —

1. one map-only projection computes each document's length and its
   per-query-term term frequencies ROW-LOCALLY (size(filter(tokens))
   against literal terms — JVM-side, no explode, no shuffle);
2. ONE map-side-combined global aggregate reduces that to a single
   stats row (N, total length, per-term document frequencies — a few
   longs regardless of corpus size);
3. the stats row broadcasts back and scoring is a second map-only
   pass, finishing in TakeOrderedAndProject (per-partition top-k,
   k-row merge — never a global sort).

Two corpus scans, zero data-sized shuffles, nothing driver-side.

Cross-engine determinism (the gate contract): every float is derived
from exact integers (tf, df, N, doc/total lengths) through a FIXED
left-assoc operator order mirrored verbatim in the DuckDB oracle;
the per-term contributions fold in sorted-term order; ln() may differ
by ≤1 ulp between engines, absorbed by ROUND(·, 4) and pinned by the
same margin-invariant test tf_idf and dsir use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(docs: DataFrame, query: str, k: int = 25,
              k1: float = BM25_K1, b: float = BM25_B,
              id_col: str = "doc_id", text_col: str = "text",
              rounded: bool = True) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25 (ties: lowest id).

    ``rounded=False`` returns ALL documents with the unrounded score
    (for the margin-invariant test)."""
    terms = sorted(set(query.split()))
    if not terms:
        raise ValueError("bm25_topk: empty query")
    toks = F.split(F.trim(F.col(text_col)), " ")
    def _tf(term: str):
        # a plain 1-arg lambda: a 2-arg lambda (x, t=term) would make
        # Spark bind the second parameter as the ELEMENT INDEX
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"__tf{i}") for i, t in enumerate(terms)]
    base = docs.select(F.col(id_col), F.size(toks).alias("__len"),
                       *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__len").alias("__tl"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
          for i in range(len(terms))])

    scored = base.crossJoin(F.broadcast(stats))
    n_d = F.col("__n").cast("double")
    avgdl = F.col("__tl").cast("double") / n_d
    # left-assoc fold over sorted terms from 0.0 — the oracle adds the
    # same doubles in the same order
    score = F.lit(0.0)
    for i in range(len(terms)):
        df_d = F.col(f"__df{i}").cast("double")
        idf = F.log((n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5))
                    + F.lit(1.0))
        tf = F.col(f"__tf{i}").cast("double")
        denom = tf + (F.lit(k1) * (F.lit(1.0) - F.lit(b)
                                   + F.lit(b) * (F.col("__len")
                                                 .cast("double") / avgdl)))
        score = score + idf * ((tf * (F.lit(k1) + F.lit(1.0))) / denom)
    if not rounded:
        return scored.select(F.col(id_col), score.alias("bm25_raw"))
    out = scored.select(F.col(id_col), F.round(score, 4).alias("bm25"))
    return out.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(int(k))
