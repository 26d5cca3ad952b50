"""Temporal-join and sketch-rollup queries over ``events``: as-of
(point-in-time) feature attachment, bounded range-join context
aggregation, exact percentile profiles, and a mergeable HLL distinct
rollup — the feature-engineering primitives of a training-data
pipeline, oracle-checked against DuckDB (which has a NATIVE ASOF JOIN,
making it a genuinely independent implementation to diff against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.temporal import (
    asof_join,
    range_join,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    REGISTRY,
    epoch_micros,
    load,
    register,
)


def _purchases(ev: DataFrame) -> DataFrame:
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )


def _clicks(ev: DataFrame) -> DataFrame:
    return ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )


@register(
    "events_asof_purchase_click",
    """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       epoch_ns(p.ts) // 1000 AS purchase_us,
       p.value AS purchase_value,
       c.value AS click_value,
       epoch_ns(c.ts) // 1000 AS click_us,
       (epoch_ns(p.ts) // 1000 - epoch_ns(c.ts) // 1000) // 1000000 AS gap_s
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join: every purchase picks up the user's
    most recent at-or-before click (value + timestamp + gap). The Spark
    side is the union+window composition (operators/temporal.py — ONE
    shuffle on user_id); the oracle is DuckDB's native ASOF LEFT JOIN,
    so the two implementations share no code path at all."""
    ev = load(spark, sf_dir, "events")
    j = asof_join(
        _purchases(ev), _clicks(ev), on=["user_id"], payload=["value"]
    )
    return j.select(
        "event_id",
        "user_id",
        epoch_micros("ts").alias("purchase_us"),
        F.col("value").alias("purchase_value"),
        F.col("value_r").alias("click_value"),
        epoch_micros("ts_r").alias("click_us"),
        F.expr(
            f"({epoch_sql('ts')} - {epoch_sql('ts_r')}) div 1000000"
        ).alias("gap_s"),
    )


def epoch_sql(col: str) -> str:
    """SQL fragment for NTZ epoch micros (shared by select exprs)."""
    return f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"


@register(
    "events_asof_bucketed",
    REGISTRY["events_asof_purchase_click"].oracle,
)
def events_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-SAFE as-of path (``bucket_s``: in-bucket windows +
    carry-forward over per-bucket summaries — partitions bounded by
    bucket population, the hot-key shape a plain window can't salt)
    against the SAME DuckDB native-ASOF oracle as
    ``events_asof_purchase_click``: hash-equality proves the bucketed
    assembly changes the plan, not the semantics. SCALE.md: 11x on a
    one-key 8M-row corpus."""
    ev = load(spark, sf_dir, "events")
    j = asof_join(
        _purchases(ev), _clicks(ev), on=["user_id"], payload=["value"],
        bucket_s=3600,
    )
    return j.select(
        "event_id",
        "user_id",
        epoch_micros("ts").alias("purchase_us"),
        F.col("value").alias("purchase_value"),
        F.col("value_r").alias("click_value"),
        epoch_micros("ts_r").alias("click_us"),
        F.expr(
            f"({epoch_sql('ts')} - {epoch_sql('ts_r')}) div 1000000"
        ).alias("gap_s"),
    )


@register(
    "events_asof_tolerance",
    """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
     j AS (
  SELECT p.event_id, p.user_id, p.ts AS pts, c.ts AS cts, c.value AS cval
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT event_id, user_id,
       CASE WHEN cts IS NULL OR pts - cts > INTERVAL 1 HOUR THEN NULL
            ELSE cval END AS click_value,
       CASE WHEN cts IS NULL OR pts - cts > INTERVAL 1 HOUR THEN NULL
            ELSE epoch_ns(cts) // 1000 END AS click_us
FROM j
""",
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 1-hour tolerance: matches further back than
    the tolerance are nulled (stale state must not leak into
    features). Oracle emulates tolerance on top of DuckDB's ASOF."""
    ev = load(spark, sf_dir, "events")
    j = asof_join(
        _purchases(ev),
        _clicks(ev),
        on=["user_id"],
        payload=["value"],
        tolerance_s=3600,
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("value_r").alias("click_value"),
        epoch_micros("ts_r").alias("click_us"),
    )


@register(
    "events_range_click_context",
    """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       count(c.user_id) AS n_clicks,
       sum(c.value::DECIMAL(18,6))::VARCHAR::DOUBLE AS click_value_sum
FROM p LEFT JOIN c
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
GROUP BY p.event_id, p.user_id
""",
)
def events_range_click_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded context window: per purchase, how many clicks (and
    their value sum) landed in the preceding 30 minutes. Runs the
    BUCKETED scale path of range_join (pure equi-join on (user_id,
    30-min cell) — candidates bounded even for hot keys), then
    re-attaches zero-click purchases with a broadcast-eligible left
    join. Decimal sums keep the hash float-order-independent."""
    ev = load(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clk = _clicks(ev)
    j = range_join(
        pur, clk, on=["user_id"], lower_s=-1800, upper_s=0, bucket_s=1800
    )
    agg = j.groupBy("event_id", "user_id").agg(
        F.count("*").alias("n_clicks"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("click_value_sum"),
    )
    return (
        pur.select("event_id", "user_id")
        .join(agg, ["event_id", "user_id"], "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            "click_value_sum",
        )
    )


@register(
    "events_value_percentiles",
    """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       min(value) AS vmin,
       max(value) AS vmax
FROM events GROUP BY event_type
""",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per event type — Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` implement the same
    continuous-quantile definition, so values must agree to 6 dp.
    (At 100 TB swap in ``approx_percentile`` — same plan shape, sketch
    merge instead of exact sort; kept exact here for a checkable
    oracle.)"""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("p50"),
        F.expr("percentile(value, 0.9D)").alias("p90"),
        F.expr("percentile(value, 0.99D)").alias("p99"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


@register(
    "events_daily_users_hll",
    """
SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
       count(DISTINCT user_id) AS n_users,
       TRUE AS sketch_ok
FROM events GROUP BY 1, 2
""",
)
def events_daily_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per (day, type) two ways: exact, and via MERGED
    per-hour Datasketches HLL partials (``hll_sketch_agg`` →
    ``hll_union_agg`` → estimate) — the mergeable-sketch pattern that
    makes a continuous-aggregate rollup possible for non-additive
    measures at 100 TB (events_daily_rollup deliberately excludes
    distinct counts because plain counts don't re-aggregate; sketches
    do). ``sketch_ok`` asserts the estimate lands within 5% of exact —
    the oracle pins it TRUE, so a drifting sketch fails the hash."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    daily_est = hourly.groupBy(
        F.date_trunc("day", "hour").alias("day"), "event_type"
    ).agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    daily_exact = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.countDistinct("user_id").alias("n_users"))
    return daily_exact.join(daily_est, ["day", "event_type"]).select(
        "day",
        "event_type",
        "n_users",
        (
            F.abs(F.col("est") - F.col("n_users"))
            <= 0.05 * F.col("n_users")
        ).alias("sketch_ok"),
    )


@register(
    "events_session_examples",
    """
WITH e AS (
  SELECT user_id, event_type, value, epoch_ns(ts) // 1000 AS us FROM events
), d AS (
  SELECT user_id, event_type, value, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
                   OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
), s AS (
  SELECT user_id, event_type, value, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM d
), r AS (
  SELECT user_id, sid, event_type, us,
         row_number() OVER (PARTITION BY user_id, sid ORDER BY us DESC) AS rev
  FROM s
)
SELECT user_id, sid::BIGINT AS session_id,
       string_agg(CASE WHEN rev > 1 THEN event_type END, '>' ORDER BY us)
         AS context,
       max(CASE WHEN rev = 1 THEN event_type END) AS label,
       (count(*) - 1)::BIGINT AS context_len
FROM r GROUP BY user_id, sid
HAVING count(*) >= 2
""",
)
def events_session_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-example construction — the stage that turns raw event
    logs into next-action training rows: per (user, 30-min session),
    the time-ordered event-type sequence becomes the CONTEXT and the
    session's final event the LABEL (sessions of one event have no
    context and are dropped). One shuffle on user_id serves the
    sessionization windows; one more groups examples. At 100 TB this
    is the same plan with sid-salted grouping if single users dominate
    (documented skew lever)."""
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
        "sid",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    by_sess = Window.partitionBy("user_id", "sid").orderBy(F.col("us").desc())
    r = s.withColumn("rev", F.row_number().over(by_sess))
    g = r.groupBy("user_id", F.col("sid").alias("session_id")).agg(
        F.concat_ws(
            ">",
            F.array_compact(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rev") > 1,
                                F.struct("us", "event_type"),
                            )
                        )
                    ),
                    lambda x: x["event_type"],
                )
            ),
        ).alias("context"),
        F.max(F.when(F.col("rev") == 1, F.col("event_type"))).alias("label"),
        (F.count("*") - 1).alias("context_len"),
    )
    return g.filter(F.col("context_len") >= 1)


@register(
    "events_histogram_rollup",
    """
WITH binned AS (
  SELECT date_trunc('hour', ts)::TIMESTAMP AS hour,
         greatest(0, least(floor(value / 10.0), 49))::INT AS bin
  FROM events
),
hourly AS (
  SELECT hour, bin, count(*) AS cnt FROM binned GROUP BY hour, bin
),
daily AS (
  SELECT date_trunc('day', hour)::TIMESTAMP AS day, bin, sum(cnt) AS cnt
  FROM hourly GROUP BY 1, bin
),
cum AS (
  SELECT day, bin, cnt,
         sum(cnt) OVER (PARTITION BY day ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY day) AS total
  FROM daily
)
SELECT day,
       max(total)::BIGINT AS n_events,
       min(CASE WHEN cum >= ceil(0.5 * total) THEN (bin + 1) * 10.0 END)::DOUBLE AS p50_est,
       min(CASE WHEN cum >= ceil(0.9 * total) THEN (bin + 1) * 10.0 END)::DOUBLE AS p90_est,
       min(CASE WHEN cum >= ceil(0.99 * total) THEN (bin + 1) * 10.0 END)::DOUBLE AS p99_est
FROM cum GROUP BY day
""",
)
def events_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantile rollup (operators.histogram): the
    quantile counterpart of ``events_daily_users_hll``. Exact
    percentiles don't re-aggregate (a daily p99 is not a function of
    hourly p99s); fixed-bin counts DO — hourly (hour, bin) partials
    add into daily histograms and p50/p90/p99 are read off the merged
    cumulative counts. Post-merge data volume is #hours x #bins rows
    regardless of event count — the continuous-aggregate shape for
    quantiles at 100 TB. Estimates are bin upper edges (width 10 over
    [0, 500)), deterministic on both engines."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
        histogram,
    )

    ev = load(spark, sf_dir, "events")
    hourly = histogram.histogram_by(
        ev,
        "value",
        [F.date_trunc("hour", "ts").alias("hour")],
        lo=0.0,
        width=10.0,
        n_bins=50,
    )
    daily = histogram.merge_histograms(
        hourly, [F.date_trunc("day", "hour").alias("day")]
    )
    return histogram.histogram_percentiles(
        daily, ["day"], [0.5, 0.9, 0.99], lo=0.0, width=10.0
    )


@register(
    "events_scd2_tier_attribution",
    """
WITH p AS (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'purchase'),
dim AS (
  SELECT user_id, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS tier
  FROM p
),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
j AS (
  SELECT c.user_id, c.value, d.tier
  FROM c LEFT JOIN dim d
    ON d.user_id = c.user_id
   AND d.valid_from <= c.ts AND (d.valid_to IS NULL OR c.ts < d.valid_to)
)
SELECT coalesce(tier, 0)::INT AS tier, count(*) AS n_clicks,
       count(DISTINCT user_id) AS n_users,
       sum(value::DECIMAL(18,6))::VARCHAR::DOUBLE AS sum_click_value
FROM j GROUP BY coalesce(tier, 0)
""",
)
def events_scd2_tier_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension) enrichment: a per-user "tier"
    dimension is DERIVED from the event stream (tier n = the validity
    interval between a user's n-th and n+1-th purchase, half-open,
    current version open-ended), then every click is attributed to the
    tier valid AT ITS TIMESTAMP via ``operators.temporal.interval_join``
    — the warehouse-standard point-in-time dimension join.

    The oracle is the naive BETWEEN join; the Spark side never builds
    interval candidates at all — it is the as-of window on
    ``valid_from`` plus an atomic expiry check (one shuffle, hot-key
    bucketable). Hash-equality proves the rewrite. Clicks before a
    user's first purchase fall in no interval → tier 0."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.temporal import (
        interval_join,
    )

    ev = load(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    dim = (
        p.withColumn("tier", F.row_number().over(w))
        .withColumn("valid_to", F.lead("ts").over(w))
        .withColumnRenamed("ts", "valid_from")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    j = interval_join(clicks, dim, on=["user_id"], left_ts="ts", payload=["tier"])
    return (
        j.groupBy(F.coalesce("tier", F.lit(0)).cast("int").alias("tier"))
        .agg(
            F.count("*").alias("n_clicks"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("string")
            .cast("double")
            .alias("sum_click_value"),
        )
    )


@register(
    "events_audience_overlap_theta",
    """
WITH t AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM t a JOIN t b ON a.event_type < b.event_type
),
u AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT p.type_a, p.type_b,
       (SELECT count(*) FROM u WHERE u.event_type = p.type_a) AS n_users_a,
       (SELECT count(*) FROM u WHERE u.event_type = p.type_b) AS n_users_b,
       (SELECT count(*) FROM u x JOIN u y
         ON x.user_id = y.user_id
        AND x.event_type = p.type_a AND y.event_type = p.type_b) AS n_overlap
FROM pairs p
""",
)
def events_audience_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix via Datasketches THETA sketches — the
    set-operation sketch family (HLL unions but cannot intersect;
    theta does both). One pass builds a per-event-type sketch of its
    user set; every pairwise overlap is then a SKETCH-local
    ``theta_intersection`` — no re-scan, no join of the fact table per
    pair. At 100 TB the sketches are the only thing that moves
    (kilobytes per slice, mergeable across partitions/days like the
    HLL rollup); the pairwise stage touches P² sketch pairs, not P²
    data scans.

    lgNomEntries=20 keeps the sketch in EXACT mode for up to ~1M
    distinct users per slice — far above the fixtures — so estimates
    round to the exact integers and the oracle is a full-value check
    against plain SQL distinct-intersections (the fallback at larger
    cardinalities is the same query with an error-contract oracle)."""
    ev = load(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id, 20)").alias("sk")
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    return pairs.select(
        "type_a",
        "type_b",
        F.round(F.expr("theta_sketch_estimate(sk_a)")).cast("bigint").alias("n_users_a"),
        F.round(F.expr("theta_sketch_estimate(sk_b)")).cast("bigint").alias("n_users_b"),
        F.round(
            F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
        ).cast("bigint").alias("n_overlap"),
    )


@register(
    "events_value_quantiles_kll",
    """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
FROM events GROUP BY date_trunc('day', ts)
""",
)
def events_value_quantiles_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile rollup with Datasketches KLL: HOURLY
    ``kll_sketch_agg_double`` partials merge to daily via
    ``kll_merge_agg_double`` (the same partial→rollup shape as the HLL
    distinct and fixed-bin histogram rollups, but with a guaranteed
    rank-error bound and no bin configuration), then p50/p90/p99 are
    read off the merged sketch. The contract oracle pins each daily
    approx quantile inside the EXACT ±5%-rank band (k=800 ⇒ ~0.5%
    rank error — a 10× safety margin); a continuous aggregate keeps
    only the hourly sketch bytes, never the raw history."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.expr("kll_sketch_agg_double(value, 800)").alias("sk"))
    daily = hourly.groupBy(
        F.date_trunc("day", "hour").alias("day")
    ).agg(F.expr("kll_merge_agg_double(sk)").alias("sk"))
    approx = daily.select(
        "day",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("a50"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.9)").alias("a90"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.99)").alias("a99"),
    )
    exact = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.percentile("value", [0.45, 0.55, 0.85, 0.95, 0.94, 1.0]).alias("ex")
    )
    j = approx.join(exact, "day")
    return j.select(
        "day",
        ((F.col("a50") >= F.col("ex")[0]) & (F.col("a50") <= F.col("ex")[1])).alias("ok_p50"),
        ((F.col("a90") >= F.col("ex")[2]) & (F.col("a90") <= F.col("ex")[3])).alias("ok_p90"),
        ((F.col("a99") >= F.col("ex")[4]) & (F.col("a99") <= F.col("ex")[5])).alias("ok_p99"),
    )
