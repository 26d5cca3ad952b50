"""Relational analytics layer (SURVEY.md §2d, §7 step 7).

Generalizes the reference notebook's batch-analysis queries
(``/root/reference/notebooks/demo.ipynb`` cells 22-26: per-query
metrics, retrieval frequency, argmax selection) over the driver's
TPC-H-ish star schema — demonstrating "same data-processing
capabilities" breadth on relational data.

Scale notes baked into each query:
- dimension tables (region/nation/customer-side aggregates) are
  broadcast — no shuffle of the fact table for the join;
- aggregations are expressed so Catalyst plans partial (map-side)
  aggregation before the exchange;
- top-k uses row_number + filter → WindowGroupLimit pushes the limit
  below the shuffle.

Float determinism: cross-engine value-hash comparison cannot rely on
double summation order, so money sums are computed in DECIMAL (exact,
order-independent) and cast to double at the end (FIXTURES.md
conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    epoch_micros,
    load,
    register,
)

DEC = "decimal(18,4)"


def _dec(col):
    return F.col(col).cast(DEC)


@register(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::DECIMAL(18,4))::VARCHAR::DOUBLE AS sum_qty,
       sum(l_extendedprice::DECIMAL(18,4))::VARCHAR::DOUBLE AS sum_base_price,
       sum((l_extendedprice::DECIMAL(18,4)) * (1 - l_discount::DECIMAL(18,4)))::VARCHAR::DOUBLE AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter (pushed to Parquet) + partial agg.
    The canonical 100 TB sanity query — one shuffle of
    #groups·#partitions pre-aggregated rows only."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "top_revenue_orders",
    """
WITH rev AS (
  SELECT l_orderkey, sum((l_extendedprice::DECIMAL(18,4)) * (1 - l_discount::DECIMAL(18,4))) AS r
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderkey, o.o_orderdate, rev.r
  FROM orders o JOIN rev ON o.o_orderkey = rev.l_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
), ranked AS (
  SELECT o_orderkey, o_orderdate, r,
         row_number() OVER (ORDER BY r DESC, o_orderkey ASC) AS rank
  FROM j
)
SELECT o_orderkey, o_orderdate, r::DOUBLE AS revenue, rank::INT AS rank
FROM ranked WHERE rank <= 10
""",
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact-fact join on the order key + broadcast of
    the filtered customer dimension + global top-k."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).alias("r")
    )
    j = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(rev, orders.o_orderkey == rev.l_orderkey)
        .select("o_orderkey", "o_orderdate", "r")
    )
    w = Window.orderBy(F.col("r").desc(), F.col("o_orderkey").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("r").cast("double").alias("revenue"),
            "rank",
        )
    )


@register(
    "nation_revenue",
    """
SELECT n.n_name AS nation, r.r_name AS region,
       sum((l.l_extendedprice::DECIMAL(18,4)) * (1 - l.l_discount::DECIMAL(18,4)))::VARCHAR::DOUBLE AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join — every dimension broadcast, single
    shuffle for the final group-by."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"), F.col("r_name").alias("region")
    ).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


@register(
    "top_customers_per_nation",
    """
WITH spend AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         sum(o.o_totalprice::DECIMAL(18,4)) AS total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_custkey, c.c_name, n.n_name
), ranked AS (
  SELECT n_name AS nation, c_custkey, c_name, total,
         row_number() OVER (PARTITION BY n_name ORDER BY total DESC, c_custkey ASC) AS rank
  FROM spend
)
SELECT nation, c_custkey, c_name, total::DOUBLE AS total_spend, rank::INT AS rank
FROM ranked WHERE rank <= 3
""",
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — WindowGroupLimit keeps only 3
    rows per nation per map task before the exchange."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dec("o_totalprice")).alias("total"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("total").desc(), F.col("c_custkey").asc()
    )
    return (
        spend.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("n_name").alias("nation"),
            "c_custkey",
            "c_name",
            F.col("total").cast("double").alias("total_spend"),
            "rank",
        )
    )


@register(
    "order_priority_stats",
    """
SELECT o_orderpriority,
       count(*) AS n_orders,
       sum(o_totalprice::DECIMAL(18,4))::VARCHAR::DOUBLE AS total_price,
       (sum(o_totalprice::DECIMAL(18,4)) / count(*))::VARCHAR::DOUBLE AS avg_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderpriority
""",
)
def order_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
            (F.sum(_dec("o_totalprice")) / F.count("*")).cast("double").alias("avg_price"),
        )
    )


@register(
    "part_brand_share",
    """
WITH b AS (
  SELECT p_brand, count(*) AS n_parts,
         sum(p_retailprice::DECIMAL(18,4)) AS total_retail
  FROM part GROUP BY p_brand
)
SELECT p_brand, n_parts, total_retail::DOUBLE AS total_retail,
       round(total_retail / sum(total_retail) OVER (), 6)::VARCHAR::DOUBLE AS share
FROM b
""",
)
def part_brand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed share-of-total (unpartitioned window over the small
    aggregated frame, not over the raw fact table)."""
    part = load(spark, sf_dir, "part")
    b = part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.sum(_dec("p_retailprice")).alias("total_retail"),
    )
    w = Window.partitionBy()
    return b.select(
        "p_brand",
        "n_parts",
        F.col("total_retail").cast("double").alias("total_retail"),
        F.round(F.col("total_retail") / F.sum("total_retail").over(w), 6)
        .cast("double")
        .alias("share"),
    )


@register(
    "events_hourly",
    """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       sum(value::DECIMAL(18,6))::VARCHAR::DOUBLE AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch form — the same plan a
    Structured Streaming job produces for `window(ts, '1 hour')`."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


@register(
    "events_sessionized",
    """
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
), d AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
                   OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
), s AS (
  SELECT user_id, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM d
), g AS (
  SELECT user_id, session_id, count(*) AS n_events,
         (max(us) - min(us)) // 1000000 AS duration_s
  FROM s GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions,
       sum(n_events)::BIGINT AS total_events,
       max(duration_s)::BIGINT AS max_session_s
FROM g GROUP BY user_id
""",
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum — the batch twin of `session_window(ts, '30 minutes')`.
    One shuffle on user_id serves both windows and the final group-by
    (same partitioning reused across stages)."""
    # integer microseconds end-to-end: bit-exact vs the oracle's
    # epoch_ns(ts) // 1000 (no float epoch, no second truncation);
    # epoch_micros is the NTZ-safe unix_micros (ts is TIMESTAMP_NTZ)
    ev = load(spark, sf_dir, "events").withColumn("us", epoch_micros("ts"))
    by_user = Window.partitionBy("user_id").orderBy("us")
    d = ev.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(by_user).isNull()
            | (F.col("us") - F.lag("us").over(by_user) > 1800 * 1000 * 1000),
            1,
        ).otherwise(0),
    )
    s = d.withColumn(
        "session_id",
        F.sum("new_session").over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    g = s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.expr("(max(us) - min(us)) div 1000000").alias("duration_s"),
    )
    return g.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.max("duration_s").cast("bigint").alias("max_session_s"),
    )


@register(
    "argmax_best_index",
    """
WITH stats AS (
  SELECT label AS index_name, count(*) AS vector_count
  FROM embeddings GROUP BY label
)
SELECT index_name, vector_count
FROM stats
ORDER BY vector_count DESC, index_name ASC
LIMIT 1
""",
)
def argmax_best_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: best-index argmax probe (app/api/routes.py:78-116) — pick
    the candidate with the most vectors; deterministic tiebreak."""
    emb = load(spark, sf_dir, "embeddings")
    stats = emb.groupBy(F.col("label").alias("index_name")).agg(
        F.count("*").alias("vector_count")
    )
    return stats.orderBy(
        F.col("vector_count").desc(), F.col("index_name").asc()
    ).limit(1)


@register(
    "retrieval_frequency",
    """
SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY source
""",
)
def retrieval_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-source frequency (demo.ipynb cell-26 source_counts)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@register(
    "batch_query_metrics",
    """
WITH m AS (
  SELECT doc_id, length(text) AS answer_length,
         len(string_split(source, ',')) AS num_sources
  FROM documents
)
SELECT count(*) AS n_queries,
       (sum(answer_length::DECIMAL(18,4)) / count(*))::VARCHAR::DOUBLE AS avg_answer_length,
       (sum(num_sources::DECIMAL(18,4)) / count(*))::VARCHAR::DOUBLE AS avg_num_sources
FROM m
""",
)
def batch_query_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: batch metrics means (demo.ipynb cells 22-24) over the
    documents fixture as the answer corpus."""
    docs = load(spark, sf_dir, "documents")
    m = docs.select(
        F.length("text").alias("answer_length"),
        F.size(F.split("source", ",")).alias("num_sources"),
    )
    return m.agg(
        F.count("*").alias("n_queries"),
        (F.sum(F.col("answer_length").cast(DEC)) / F.count("*"))
        .cast("double")
        .alias("avg_answer_length"),
        (F.sum(F.col("num_sources").cast(DEC)) / F.count("*"))
        .cast("double")
        .alias("avg_num_sources"),
    )


@register(
    "events_session_windows",
    """
WITH e AS (
  SELECT user_id, value, epoch_ns(ts) // 1000 AS us FROM events
), d AS (
  SELECT user_id, value, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
                   OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
), s AS (
  SELECT user_id, value, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM d
)
SELECT user_id,
       make_timestamp(min(us)) AS session_start,
       make_timestamp(max(us) + 1800000000) AS session_end,
       count(*) AS n_events,
       sum(value::DECIMAL(18,6))::VARCHAR::DOUBLE AS total_value
FROM s GROUP BY user_id, sid
""",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessions via the NATIVE `session_window` operator (the
    Spark-first form of `events_sessionized`'s hand-rolled islands;
    same operator powers the streaming variant in
    `streaming/sessions.py`). Oracle mirrors Spark's session-end
    contract: last event + gap."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.sessions import (
        session_rollup,
    )

    ev = load(spark, sf_dir, "events")
    return session_rollup(ev, gap="30 minutes")


@register(
    "events_daily_rollup",
    """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events,
         sum(value::DECIMAL(18,6)) AS total_value
  FROM events
  GROUP BY date_trunc('hour', ts), event_type
)
SELECT date_trunc('day', hour)::TIMESTAMP AS day, event_type,
       sum(n_events)::BIGINT AS n_events,
       sum(total_value)::VARCHAR::DOUBLE AS total_value
FROM hourly GROUP BY date_trunc('day', hour), event_type
""",
)
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level continuous-aggregate pattern (hypertable-style): the
    daily rollup re-aggregates the HOURLY partials instead of raw
    events — at 100 TB the hourly table is the materialized stream
    sink (streaming/rollup.py) and daily reads are orders of magnitude
    smaller. Only additive measures re-aggregate (counts, decimal
    sums); distinct-user counts need mergeable sketches
    (hll_sketch_agg) and are intentionally excluded here."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
    )
    return hourly.groupBy(
        F.date_trunc("day", "hour").alias("day"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").cast("double").alias("total_value"),
    )


@register(
    "events_value_histogram",
    """
SELECT event_type,
       least(floor(value / 25.0), 19)::BIGINT AS bucket,
       count(*) AS n,
       min(value) AS bucket_min,
       max(value) AS bucket_max
FROM events
GROUP BY event_type, least(floor(value / 25.0), 19)
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram profile (25-unit buckets, last bucket
    open-ended): the single-pass data-profiling shape — one partial
    aggregate per (type, bucket), one shuffle of #groups rows, fully
    codegen'd. The profiling stage of a curation pipeline runs dozens
    of these in one pass over 100 TB."""
    ev = load(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("bigint")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("value").alias("bucket_min"),
        F.max("value").alias("bucket_max"),
    )


@register(
    "documents_field_profile",
    """
SELECT count(*) AS n_rows,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END)::BIGINT AS n_empty_text,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       (sum(n_chars::DECIMAL(18,4)) / count(*))::VARCHAR::DOUBLE AS avg_chars,
       quantile_cont(n_chars, 0.5) AS median_chars
FROM documents
""",
)
def documents_field_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table field profile (nulls/empties, cardinalities, char
    stats, exact median) in ONE aggregate pass — the data-quality gate
    run before a corpus enters training. At 100 TB the distincts
    become approx_count_distinct and the median approx_percentile —
    same single-pass plan, sketch merges instead of exact state."""
    docs = load(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(
            F.when(
                F.col("text").isNull() | (F.length("text") == 0), 1
            ).otherwise(0)
        ).alias("n_empty_text"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum(F.col("n_chars").cast("decimal(18,4)")) / F.count("*"))
        .cast("double")
        .alias("avg_chars"),
        F.expr("percentile(n_chars, 0.5D)").alias("median_chars"),
    )


@register(
    "events_conversion_funnel",
    """
WITH v AS (
  SELECT user_id, min(ts) AS vt FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS ct
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click'
    AND e.ts > v.vt AND e.ts <= v.vt + INTERVAL 48 HOUR
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS pt
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > c.ct AND e.ts <= c.ct + INTERVAL 96 HOUR
  GROUP BY e.user_id
)
SELECT 1 AS step, 'first_view' AS gate, (SELECT count(*) FROM v)::BIGINT AS n_users
UNION ALL
SELECT 2, 'click_within_48h', (SELECT count(*) FROM c)::BIGINT
UNION ALL
SELECT 3, 'purchase_within_96h_of_click', (SELECT count(*) FROM p)::BIGINT
""",
)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: first view → first click within 48 h
    of it → first purchase within 96 h of that click, per user;
    reported as per-step user counts. Three keyed aggregations + two
    time-banded joins — the same banded-join shape
    ``operators.temporal.range_join`` generalizes; no window over a
    user's full history, so hot users cost nothing extra."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("vt"))
            & (F.col("ts") <= F.expr("vt + INTERVAL 48 HOUR"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("ct"))
            & (F.col("ts") <= F.expr("ct + INTERVAL 96 HOUR"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("pt"))
    )
    rows = [
        (1, "first_view", v),
        (2, "click_within_48h", c),
        (3, "purchase_within_96h_of_click", p),
    ]
    out = None
    for step, gate, df in rows:
        one = df.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(step).alias("step"), F.lit(gate).alias("gate"), "n_users"
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "events_retention_cohorts",
    """
WITH f AS (
  SELECT user_id, min(ts::DATE) AS cohort FROM events GROUP BY user_id
),
sz AS (SELECT cohort, count(*) AS n_cohort FROM f GROUP BY cohort),
act AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
ret AS (
  SELECT f.cohort, date_diff('day', f.cohort, a.d) AS day_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM f JOIN act a ON a.user_id = f.user_id
  WHERE date_diff('day', f.cohort, a.d) BETWEEN 0 AND 7
  GROUP BY f.cohort, date_diff('day', f.cohort, a.d)
)
SELECT r.cohort, r.day_offset::INT AS day_offset, r.n_active, s.n_cohort,
       round(r.n_active * 1.0 / s.n_cohort, 6) AS retention
FROM ret r JOIN sz s ON s.cohort = r.cohort
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, the
    share still active on each of the next 7 days — the standard
    product-analytics rollup. Two aggregations + one broadcast-sized
    cohort join; the distinct-(user, day) projection keeps the shuffle
    ∝ active user-days, not raw events."""
    ev = load(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    sz = f.groupBy("cohort").agg(F.count("*").alias("n_cohort"))
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    ret = (
        f.join(act, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort"))
        .filter((F.col("day_offset") >= 0) & (F.col("day_offset") <= 7))
        .groupBy("cohort", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return ret.join(sz, "cohort").select(
        "cohort",
        F.col("day_offset").cast("int").alias("day_offset"),
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )


@register(
    "events_props_profile",
    """
WITH x AS (
  SELECT event_type,
         json_extract_string(props, '$.k')::INT AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       count(DISTINCT k) AS n_distinct_k,
       min(k) AS min_k,
       max(k) AS max_k,
       round(avg(k::DECIMAL(18,6))::DOUBLE, 6) AS avg_k
FROM x GROUP BY event_type
""",
)
def events_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON flattening: extract ``props.$.k`` and
    profile it per event type — the semi-structured-column stage every
    event pipeline runs before typed processing.

    Scale shape: ``get_json_object`` evaluates JVM-side inside
    whole-stage codegen (no Python), parsing only the requested path;
    the aggregate is one partial-agg shuffle of #event_types rows. At
    100 TB with many keys, the move is ``from_json`` with an explicit
    schema (parse once, extract many) — same plan shape, one parser
    pass; the decimal avg keeps the value order-independent for the
    cross-engine hash."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg(F.col("k").cast("decimal(18,6)")).cast("double"), 6).alias(
                "avg_k"
            ),
        )
    )


@register(
    "events_rollup_day_type",
    """
SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
       GROUPING(date_trunc('day', ts), event_type)::INT AS gid,
       count(*) AS n_events,
       sum(value::DECIMAL(18,6))::VARCHAR::DOUBLE AS sum_value
FROM events
GROUP BY ROLLUP(date_trunc('day', ts), event_type)
""",
)
def events_rollup_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (day, event_type) → day subtotals → grand
    total in ONE pass, with ``grouping_id`` disambiguating real NULLs
    from subtotal rows — the OLAP cube surface of the engine.

    Scale shape: Catalyst plans rollup as an Expand (3 grouping sets
    per row) feeding ONE partial-aggregated shuffle — output rows ∝
    days × types, never raw events; the decimal sum keeps the measure
    order-independent across engines."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    return ev.rollup(day.alias("day"), F.col("event_type")).agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("string")
        .cast("double")
        .alias("sum_value"),
    ).select("day", "event_type", "gid", "n_events", "sum_value")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_type_pivot",
    f"""
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       {', '.join(
        f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS {t}"
        for t in _EVENT_TYPES)}
FROM events GROUP BY date_trunc('day', ts)
""",
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts pivoted wide by event type — the
    dashboard-feed projection.

    Scale shape: the pivot values are EXPLICIT, which matters twice at
    100 TB: Spark skips the distinct-values collect pass it would
    otherwise run over the fact table, and the output schema is stable
    under late-arriving garbage types (they simply don't pivot).
    Compiles to two partial-aggregated exchanges — (day, type) counts,
    then pivotfirst re-keyed to day — both map-side combined; nulls
    backfilled to 0 to match the conditional-aggregation oracle."""
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return piv.na.fill(0, _EVENT_TYPES)


@register(
    "events_top_values_per_type_salted",
    """
SELECT event_type, rank::INT AS rank, event_id, round(value, 6) AS value
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rank
  FROM events
) WHERE rank <= 5
""",
)
def events_top_values_per_type_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k on a HOT grouping key (5 event types × all
    rows — the exact shape where a single ranking window serializes a
    group into one reduce task), computed with the two-phase salted
    rewrite (operators/skew.py): (type, salt)-local top-5, then top-5
    of the ≤ 5·n_salts survivors. The oracle is the PLAIN single-window
    SQL — hash-equality IS the proof the salted plan is exact."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.skew import (
        salted_topk_per_group,
    )

    ev = load(spark, sf_dir, "events")
    top = salted_topk_per_group(
        ev,
        ["event_type"],
        [F.col("value").desc(), F.col("event_id").asc()],
        k=5,
        salt_from="event_id",
        n_salts=8,
    )
    return top.select(
        "event_type",
        F.col("rank").cast("int").alias("rank"),
        "event_id",
        F.round("value", 6).alias("value"),
    )


@register(
    "events_distinct_users_exact",
    """
SELECT event_type, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
)
def events_distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via the two-phase
    distinct-then-count rewrite (operators/skew.py): the first shuffle
    keys on the high-cardinality (type, user) pair — evenly
    partitioned even when one type dominates — the second carries one
    row per distinct user. The mergeable-sketch alternative for
    continuous rollups is ``events_daily_users_hll``; this is the
    exact batch form."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.skew import (
        two_phase_distinct,
    )

    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy("event_type").agg(F.count("*").alias("n_events"))
    users = two_phase_distinct(ev, ["event_type"], "user_id", out_name="n_users")
    return totals.join(users, "event_type")
