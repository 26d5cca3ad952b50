"""Approximate nearest neighbor via IVF (inverted-file) partition
pruning — the scale path for the reference's top-k similarity search
(``/root/reference/app/services/pinecone_service.py:148-182``, which
delegates ANN to the Pinecone service; we implement it as DataFrame
ops per SURVEY.md §4 item 2).

Design (FAISS-style IVF, Spark-first):

1. **Coarse quantizer**: ``k`` centroids. Seed selection is
   deterministic (the ``k`` lowest-id vectors) so the whole pipeline
   is reproducible in the DuckDB oracle; ``lloyd_refine`` improves
   them with standard k-means iterations when quality matters more
   than oracle parity.
2. **Assignment is a map, not a join**: centroids are collected to
   the driver (k·dim doubles — tiny by construction) and inlined as
   a literal array, so every index vector gets its nearest-centroid
   id inside a single narrow projection. No shuffle, no join; at
   100 TB this is one pass over the index, fully parallel.
3. **Layout**: ``write_ivf_index`` writes the assigned index
   partitioned by ``centroid_id``. A probe that joins on
   ``centroid_id`` then touches only ``nprobe`` of ``k`` partitions
   (Parquet partition pruning / dynamic partition pruning at scale).
4. **Probe**: score query↔centroids (tiny), take ``nprobe`` best
   centroids per query, join the (query, centroid) probe pairs
   against the assigned index — a broadcast hash join on
   ``centroid_id`` — and run the exact scorer + per-query top-k
   window on the surviving ~nprobe/k fraction of the index.

Recall is tunable by ``nprobe`` (see the ``ann_ivf_recall`` query:
IVF@nprobe vs the exact scan, per query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
    dot_product,
    l2_norm,
    similarity_expr,
)


def seed_centroids(index: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Deterministic coarse-quantizer seeds: the ``k`` lowest-id
    vectors, as driver-local ``(centroid_id, vector)`` pairs.
    Centroid ids are the source vector ids (stable, oracle-friendly).
    """
    rows = (
        index.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    return [(int(r["id"]), [float(x) for x in r["v"]]) for r in rows]


def _py_l2(vec: list[float]) -> float:
    """Left-fold sum of squares — the same IEEE op order as the
    Spark/DuckDB folds, so driver-side centroid norms are
    bit-identical to engine-side ones."""
    s = 0.0
    for x in vec:
        s += x * x
    return s ** 0.5


def _centroid_literal(centroids: list[tuple[int, list[float]]]) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(cid).cast("int").alias("cid"),
                F.lit(vec).cast("array<double>").alias("cvec"),
                F.lit(_py_l2(vec)).alias("cnorm"),
            )
            for cid, vec in centroids
        ]
    )


def _best_centroids(vec: Column, centroids: list[tuple[int, list[float]]],
                    metric: str, n: int, vec_norm: Column | None = None) -> Column:
    """Array of the ``n`` best centroid ids for ``vec`` — computed
    entirely inside one projection (sort a k-element struct array;
    ties break to the lower centroid id, mirroring the oracle's
    ``ORDER BY sim DESC, cid``).

    For cosine, pass ``vec_norm`` (pre-projected once) — centroid
    norms are baked into the literal — so each of the k comparisons
    folds only the dot product instead of re-folding both norms."""
    carr = _centroid_literal(centroids)
    # euclidean: smaller is better → sort ascending on score;
    # cosine/dot: larger is better → sort ascending on -score
    def keyed(c: Column) -> Column:
        if metric == "cosine" and vec_norm is not None:
            denom = vec_norm * c["cnorm"]
            s = F.when(denom != 0.0, dot_product(vec, c["cvec"]) / denom)
        else:
            s = similarity_expr(metric, vec, c["cvec"])
        key = s if metric == "euclidean" else -s
        return F.struct(key.alias("key"), c["cid"].alias("cid"))

    ranked = F.array_sort(F.transform(carr, keyed))
    return F.transform(F.slice(ranked, 1, n), lambda s: s["cid"])


def assign_centroids(
    index: DataFrame,
    centroids: list[tuple[int, list[float]]],
    metric: str = "cosine",
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Add ``centroid_id`` = nearest centroid, as a narrow map stage
    (no shuffle — see module doc #2)."""
    v = F.col(vec_col).cast("array<double>")
    if metric == "cosine":
        index = index.withColumn("__vnorm", l2_norm(v))
        best = _best_centroids(v, centroids, metric, 1, vec_norm=F.col("__vnorm"))
        return index.withColumn(out_col, best[0]).drop("__vnorm")
    best = _best_centroids(v, centroids, metric, 1)
    return index.withColumn(out_col, best[0])


def write_ivf_index(
    index: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
    metric: str = "cosine",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF layout: parquet partitioned by
    ``centroid_id`` so probes prune to ``nprobe`` directories."""
    assigned = assign_centroids(index, centroids, metric, vec_col)
    (
        assigned.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )


def ivf_topk(
    queries: DataFrame,
    index: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 4,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: bool = False,
) -> DataFrame:
    """IVF-pruned top-k: exact scoring restricted to the ``nprobe``
    most promising centroid buckets per query.

    ``assigned=True`` means ``index`` already carries ``centroid_id``
    (e.g. read back from ``write_ivf_index`` — the production path,
    which also gets partition pruning); otherwise assignment is
    computed on the fly in the same scan.
    """
    qv = F.col(query_vec_col).cast("array<double>")
    qbase = queries.select(
        F.col(query_id_col).alias("query_id"),
        qv.alias("__qvec"),
        *( [l2_norm(qv).alias("__qnorm")] if metric == "cosine" else [] ),
    )
    probe_pairs = qbase.select(
        "query_id",
        "__qvec",
        *( ["__qnorm"] if metric == "cosine" else [] ),
        F.explode(
            _best_centroids(
                F.col("__qvec"),
                centroids,
                metric,
                nprobe,
                vec_norm=F.col("__qnorm") if metric == "cosine" else None,
            )
        ).alias("centroid_id"),
    )
    idx = index if assigned else assign_centroids(index, centroids, metric, vec_col)
    if metric == "cosine":
        idx = idx.withColumn("__vnorm", l2_norm(F.col(vec_col).cast("array<double>")))
        denom = F.col("__qnorm") * F.col("__vnorm")
        score = F.when(
            denom != 0.0, dot_product(F.col("__qvec"), F.col(vec_col)) / denom
        )
    else:
        score = similarity_expr(metric, F.col("__qvec"), F.col(vec_col))
    scored = idx.join(F.broadcast(probe_pairs), "centroid_id").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        score.alias("score"),
    )
    lead = F.col("score").asc() if metric == "euclidean" else F.col("score").desc()
    w = Window.partitionBy("query_id").orderBy(lead, F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def lloyd_refine(
    index: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iters: int = 2,
    metric: str = "euclidean",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Standard k-means refinement of the seed centroids: assign →
    per-cluster element-wise mean → repeat. Each iteration is one
    narrow assignment pass + one groupBy (single shuffle on
    ``centroid_id``); centroids come back to the driver (k·dim —
    tiny) to be re-inlined, so the big side is never shuffled on
    anything but the aggregation.

    Empty clusters keep their previous centroid.
    """
    dim = len(centroids[0][1])
    cur = centroids
    for _ in range(iters):
        assigned = assign_centroids(index, cur, metric, vec_col)
        v = F.col(vec_col).cast("array<double>")
        means = (
            assigned.groupBy("centroid_id")
            .agg(*[F.avg(v[i]).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        by_cid = {
            int(r["centroid_id"]): [float(r[f"m{i}"]) for i in range(dim)] for r in means
        }
        cur = [(cid, by_cid.get(cid, vec)) for cid, vec in cur]
    return cur
