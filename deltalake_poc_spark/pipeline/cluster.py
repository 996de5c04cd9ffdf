"""Distributed k-means clustering and semantic (embedding-space)
deduplication.

SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540 —
public paper): cluster the corpus's embeddings with k-means, then
search for near-duplicates ONLY within each cluster and keep one
representative per duplicate group. Clustering is the blocking
structure that makes embedding dedup linear: within-cluster pairing
costs Σ n_c² ≈ n·(n/k), so with k grown proportionally to the corpus
(the paper uses k ≈ n/10⁴) the pair stage stays O(n·avg_cluster) —
never the all-pairs O(n²). The reference engine has no clustering
operator; this is part of the training-data surface layered on top
(SURVEY.md §6).

The k-means here is Lloyd's algorithm in the classic Spark shape
(the same aggregate-to-driver loop MLlib's KMeans uses): each
iteration is ONE map-side-combinable groupBy producing k·dim rows of
exact (count, sum); only those longs ever reach the driver — KB per
iteration at any corpus size. Assignment is a pure row-local
expression (higher-order-function squared-distance folds against k
literal centroids — JVM-side over primitive arrays), zero Python.

Determinism contract (what lets DuckDB hash-match an ITERATIVE
algorithm): embeddings are quantized ONCE to integers
(floor(x·2²⁰ + 0.5), the same exact-integer convention as
analytics/money.py), so

- centroid numerators are exact int64 sums — associative, order-free,
  identical under any partitioning or engine;
- centroids are the exact rationals (sums, count); the only floating
  point is sum/count and the distance fold, both evaluated
  left-to-right over the same integers in both engines — IEEE doubles
  are deterministic when the operand ORDER is fixed;
- ties in the argmin go to the lowest cluster id on both sides
  (array_position first-min here, ROW_NUMBER(ORDER BY d, cid) in the
  oracle);
- initial centroids are the k lowest-id vectors (no RNG);
- the within-cluster cosine is an exact int64 dot product over the
  quantized vectors divided by exact-integer-rooted norms.

Scale notes for 100 TB: the quantize/assign maps are scan-local; the
per-iteration shuffle moves (cluster, 64 longs) rows with map-side
partial aggregation — k·dim·cores bytes, not data-sized; the
within-cluster self-join shuffles once on cluster id (size the
cluster count so clusters stay ~10³-10⁴ members); duplicate-group
closure reuses :func:`..dedup.connected_components` (bounded driver
union-find with a distributed min-label fallback). For corpora where
k itself is large (10⁵+), the flat argmin-over-k expression should be
replaced by a two-level quantizer (coarse pivots then refine within
the probed shard — the IVF pattern in pipeline/similarity.py); k is
the knob this module deliberately exposes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1 << 20  # float -> exact integer grid; 2^20·2^23 docs
# of ±1-ish components keeps every sum far inside int64


def quantize_expr(vec_col: Column | str) -> Column:
    """array<float> -> array<long> on the 2^20 grid, row-local.

    floor(x·S + 0.5) — identical to the money convention: never
    ROUND() a double (engines disagree on .5 at even), always
    floor(+0.5)."""
    c = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * QUANT_SCALE + F.lit(0.5))
        .cast("long"))


def _centroid_lit(centroids: list[tuple[list[int], int]]) -> Column:
    """k×dim literal double array of centroid values s_d/n.

    The division happens in Python — Python float division IS IEEE
    double division, bit-identical to the oracle's CAST(s AS
    DOUBLE)/n over the same exact integers."""
    return F.array(*[F.array(*[F.lit(s / n) for s in sums])
                     for sums, n in centroids])


def assign_expr(qcol: Column, centroids: list[tuple[list[int], int]]) -> Column:
    """Nearest-centroid id (0-based) for a quantized vector column.

    Formulated with higher-order functions (transform/zip_with/
    aggregate) rather than an unrolled k×dim expression on purpose:
    the unrolled form put ~500 arithmetic nodes into whole-stage
    codegen and paid ~7 s of janino compilation PER distinct plan
    (each Lloyd iteration is a distinct plan — different centroid
    literals), which dominated wall time at every test scale. The HOF
    form is evaluated over primitive arrays with a constant-size
    plan; the fold order (index-ascending, left-assoc) is identical,
    so the doubles — and the oracle hash — are unchanged.

    First-min tie rule: array_position returns the FIRST index
    holding the minimum, i.e. the lowest cluster id — mirrored by the
    oracle's ROW_NUMBER(ORDER BY d ASC, cid ASC)."""
    dists = F.transform(
        _centroid_lit(centroids),
        lambda c: F.aggregate(
            F.zip_with(qcol, c,
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, t: acc + t))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> list[tuple[list[int], int]]:
    """Lloyd's k-means over quantized embeddings; returns the exact
    rational centroids as (per-dimension int64 sums, member count).

    Deterministic by construction: init = the k lowest-``id_col``
    vectors (collect of a TakeOrdered — k rows, bounded); each of the
    ``iters`` rounds runs one distributed groupBy whose k·dim-long
    result is the only data the driver sees. A cluster that loses all
    members keeps its previous centroid (the oracle mirrors this with
    a LEFT JOIN + COALESCE)."""
    q = emb.select(F.col(id_col).alias("__id"),
                   quantize_expr(vec_col).alias("__q"))
    init = q.orderBy("__id").limit(k).collect()
    if not init:
        raise ValueError("kmeans_fit: empty input")
    cents = [(list(r["__q"]), 1) for r in init]
    k = len(cents)  # fewer rows than k: cluster over what exists
    dim = len(cents[0][0])
    for _ in range(iters):
        cl = assign_expr(F.col("__q"), cents)
        # per-dimension exact int64 sums as dim narrow aggregates in
        # ONE map-side-combinable groupBy (k rows out). NOT a
        # posexplode over __q: a Generate whose required output
        # includes the assignment column re-evaluates that whole
        # HOF fold per exploded row — dim× the work (measured 10 s
        # vs 1.6 s at sf0.1).
        upd = (q.select(cl.alias("__cl"), "__q")
               .groupBy("__cl")
               .agg(F.count(F.lit(1)).alias("__n"),
                    *[F.sum(F.col("__q")[d]).alias(f"__s{d}")
                      for d in range(dim)]))
        got = {int(r["__cl"]): r for r in upd.collect()}  # <= k rows
        cents = [
            ([int(got[j][f"__s{d}"]) for d in range(dim)], int(got[j]["__n"]))
            if j in got else cents[j]
            for j in range(k)
        ]
    return cents


def kmeans_assign(emb: DataFrame, centroids: list[tuple[list[int], int]],
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, cluster) for every vector — one row-local projection."""
    q = emb.select(F.col(id_col), quantize_expr(vec_col).alias("__q"))
    return q.select(id_col, assign_expr(F.col("__q"), centroids)
                    .alias("cluster"))


def kmeans_profile(emb: DataFrame, k: int = 8, iters: int = 2,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Cluster-size + exact-centroid profile: one row per cluster with
    member count and the int64 component sums' total (an exact
    checksum of the centroid the next iteration would use). Everything
    integer — hash-stable across engines."""
    cents = kmeans_fit(emb, k=k, iters=iters, id_col=id_col,
                       vec_col=vec_col)
    q = emb.select(F.col(id_col).alias("__id"),
                   quantize_expr(vec_col).alias("__q"))
    cl = assign_expr(F.col("__q"), cents)
    return (q.select(cl.alias("cluster"), "__q")
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
                 F.sum(F.aggregate(F.col("__q"), F.lit(0).cast("long"),
                                   lambda a, x: a + x))
                 .alias("centroid_sum"))
            .orderBy("cluster"))


def semantic_neardup_pairs(emb: DataFrame,
                           centroids: list[tuple[list[int], int]],
                           threshold: float = 0.7,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Within-cluster cosine near-dup pairs: (vec_a, vec_b, cluster,
    cosine). The cosine is an exact int64 dot over quantized vectors
    divided by per-vector norms (computed once per vector, not per
    pair), rounded to 4 decimals for the cross-engine gate.

    The join condition carries only the cluster equi-key and id
    order; the cosine filter sits on the join output with
    null-tolerant coalesce guards so Catalyst cannot infer an
    IsNotNull over the quantize/fold expressions and push their
    re-evaluation into the scans (the simhash lesson, SCALE.md)."""
    from .dedup import spread

    q = quantize_expr(vec_col)
    n2 = F.aggregate(F.transform(F.col("__q"), lambda x: x * x),
                     F.lit(0).cast("long"), lambda a, x: a + x)
    base = (spread(emb.select(F.col(id_col), q.alias("__q")))
            .select(F.col(id_col), "__q",
                    assign_expr(F.col("__q"), centroids).alias("cluster"),
                    n2.alias("__n2")))
    a, b = base.alias("a"), base.alias("b")
    zero = F.array().cast("array<bigint>")
    dot = F.aggregate(
        F.zip_with(F.coalesce(F.col("a.__q"), zero),
                   F.coalesce(F.col("b.__q"), zero), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    cos = F.round(
        dot.cast("double")
        / (F.sqrt(F.coalesce(F.col("a.__n2"), F.lit(1)).cast("double"))
           * F.sqrt(F.coalesce(F.col("b.__n2"), F.lit(1)).cast("double"))),
        4)
    return (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("vec_a"),
                F.col(f"b.{id_col}").alias("vec_b"),
                F.col("a.cluster").alias("cluster"),
                cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def hard_negatives(emb: DataFrame, k: int = 8, iters: int = 2,
                   dup_threshold: float = 0.99,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Contrastive-training hard-negative mining: for every anchor
    vector, the most similar OTHER vector in its k-means cluster that
    is not a near-duplicate (cosine < ``dup_threshold``) — the
    classic in-batch-negatives upgrade (cluster = the candidate pool,
    so mining stays linear exactly like SemDeDup's pair search).

    Returns (vec_id, neg_id, cosine); vectors whose cluster holds no
    eligible candidate are absent. One max_by per anchor — no
    per-anchor sort; ties break to the lowest candidate id via the
    (cosine, -neg_id) struct order."""
    cents = kmeans_fit(emb, k=k, iters=iters, id_col=id_col,
                       vec_col=vec_col)
    pairs = semantic_neardup_pairs(emb, cents, threshold=-1.0,
                                   id_col=id_col, vec_col=vec_col)
    # one pass over the (a<b) pair join, each pair feeding BOTH
    # anchors via a 2-element explode — a unionAll of two projections
    # would re-run the whole join; explode_outer, not explode, keeps
    # InferFiltersFromGenerate from re-evaluating the array (the
    # documented Generate idiom)
    both = (pairs.filter(F.col("cosine") < dup_threshold)
            .select(F.explode_outer(F.array(
                F.struct(F.col("vec_a").alias("anchor"),
                         F.col("vec_b").alias("cand"), F.col("cosine")),
                F.struct(F.col("vec_b").alias("anchor"),
                         F.col("vec_a").alias("cand"), F.col("cosine"))))
                .alias("e"))
            .select("e.anchor", "e.cand", "e.cosine"))
    return (both.groupBy("anchor")
            .agg(F.max_by(F.struct(F.col("cand"), F.col("cosine")),
                          F.struct(F.col("cosine"),
                                   (-F.col("cand")).alias("nid")))
                 .alias("best"))
            .select(F.col("anchor").alias(id_col),
                    F.col("best.cand").alias("neg_id"),
                    F.col("best.cosine").alias("cosine")))


def semantic_dedup(emb: DataFrame, k: int = 8, iters: int = 2,
                   threshold: float = 0.7,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup: one row per vector — its cluster, its duplicate
    group's keeper (min id, via connected components over the
    within-cluster near-dup pairs), and whether it survives.

    Returns (vec_id, cluster, keep_vec_id, is_kept)."""
    from .dedup import connected_components

    cents = kmeans_fit(emb, k=k, iters=iters, id_col=id_col,
                       vec_col=vec_col)
    pairs = (semantic_neardup_pairs(emb, cents, threshold=threshold,
                                    id_col=id_col, vec_col=vec_col)
             .select(F.col("vec_a").alias("doc_a"),
                     F.col("vec_b").alias("doc_b")))
    comp = connected_components(pairs)
    assigned = kmeans_assign(emb, cents, id_col=id_col, vec_col=vec_col)
    return (assigned
            .join(comp, assigned[id_col] == comp["doc_id"], "left")
            .select(F.col(id_col), "cluster",
                    F.coalesce("group_id", F.col(id_col))
                    .alias("keep_vec_id"))
            .withColumn("is_kept", F.col(id_col) == F.col("keep_vec_id")))
