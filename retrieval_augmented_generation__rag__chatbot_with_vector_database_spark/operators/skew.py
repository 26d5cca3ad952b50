"""Hot-key (skew) levers for grouped computation.

A 100 TB corpus always has hot groups — one event type with half the
rows, one language with 90 % of the documents. Spark's partial (map-
side) aggregation already absorbs skew for ALGEBRAIC aggregates
(sum/count/min/max fold per-partition before the exchange), but two
common shapes do NOT get that for free and need an explicit two-phase
rewrite:

- **per-group top-k**: a ``row_number`` window shuffles EVERY row of a
  group into one partition before ranking. WindowGroupLimit (Spark
  3.5+) pre-filters map-side, but the reduce side still receives all
  survivors of a hot group in one task. ``salted_topk_per_group``
  ranks per (group, salt) first — #salts parallel partitions per
  group, each emitting at most k rows — then ranks the ≤ k·#salts
  survivors per group. Identical output to the plain window whenever
  the ordering is a total order within a group (caller supplies the
  tiebreak, same contract as every ranked operator here).

- **exact distinct counts**: ``count(DISTINCT x)`` must co-locate
  every (group, x) pair; a hot group's full value set lands in one
  task. ``two_phase_distinct`` shuffles on the HIGH-cardinality
  (group, x) key first (hash-partitioned evenly regardless of group
  skew, with map-side combine collapsing repeats), then counts the
  already-distinct rows per group — the second shuffle carries one row
  per distinct value. This is the classic exact-distinct skew rewrite;
  the sketch alternative (HLL, ``events_daily_users_hll``) trades
  exactness for one fewer pass.

Salting is applied where it is SOUND (rank-then-merge, distinct-then-
count) — not on as-of windows, where cross-salt ordering would break
the semantics (see operators/temporal.py's bucketed design instead).

Reference parity: the reference has no hot-key handling (single-node
Pinecone service); these are scale extensions (SURVEY.md north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    salt_from: str,
    n_salts: int = 16,
    rank_name: str = "rank",
) -> DataFrame:
    """Exact per-group top-k via two windows: (group, salt)-local
    top-k, then top-k of the survivors. ``order_by`` must be a total
    order within each group (include a unique-id tiebreak) — that is
    what makes the salted result identical to the single-window plan.
    ``salt_from`` is any column that spreads a group's rows (an id);
    the salt is ``xxhash64`` of it mod ``n_salts``, so the result is
    deterministic but NEVER depends on the salt value itself.

    Cost: two shuffles — (group, salt) with ≤ k rows emitted per
    partition, then group over ≤ k·n_salts rows per group. The hot
    group's rank work parallelizes n_salts-wide instead of serializing
    in one reduce task.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if n_salts <= 0:
        raise ValueError(f"n_salts must be positive, got {n_salts}")
    reserved = {"__salt", "__lr", rank_name}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} clash with reserved/output "
            "names (__salt, __lr, rank_name) — rename them or pass a "
            "different rank_name"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    w_local = Window.partitionBy(*group_cols, "__salt").orderBy(*order_by)
    w_final = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__salt", salt)
        .withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .withColumn(rank_name, F.row_number().over(w_final))
        .filter(F.col(rank_name) <= k)
        .drop("__salt", "__lr")
    )


def two_phase_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    out_name: str = "n_distinct",
) -> DataFrame:
    """Exact ``count(DISTINCT distinct_col)`` per group as distinct-
    then-count: the first aggregation keys on the high-cardinality
    (group, value) pair — evenly hash-partitioned even when one group
    dominates, with map-side combine deduplicating locally — and the
    second counts one row per surviving distinct value. NULL values
    are excluded, matching SQL ``count(DISTINCT ...)``.

    DIVERGENCE from ``GROUP BY g + count(DISTINCT x)``: a group whose
    ``distinct_col`` is entirely NULL is OMITTED here (the null filter
    removes its rows before grouping), whereas GROUP BY emits it with
    count 0. Callers needing those groups should left-join from the
    group dimension and ``coalesce(n_distinct, 0)`` (the fixture's
    user_id is non-null, so the registry query is unaffected).
    """
    return (
        df.filter(F.col(distinct_col).isNotNull())
        .select(*group_cols, distinct_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count("*").alias(out_name))
    )
