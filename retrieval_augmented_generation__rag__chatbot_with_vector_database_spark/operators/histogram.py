"""Mergeable fixed-bin histograms — the quantile counterpart of the
HLL rollup (queries/temporal_queries.py ``events_daily_users_hll``).

Exact percentiles don't re-aggregate: a daily p99 cannot be computed
from hourly p99s. The mergeable form is the histogram itself — hourly
(key, bin) counts ADD, so a daily histogram is a plain ``sum`` over
the hourly partials and any percentile is then read off the merged
cumulative counts. This is the continuous-aggregate pattern every
streaming/rollup store uses for quantiles (fixed-bin here for a
deterministic SQL oracle; t-digest/KLL swap in at the same plan shape
when bins can't be fixed a priori).

Cost model at 100 TB: the hourly build is one map-side-combinable
groupBy (partial aggregation does the heavy lifting before the
shuffle); the merge moves only ``#hours × #bins`` rows regardless of
event volume; the percentile read is a window over ``#bins``-sized
partitions. Nothing downstream of the first aggregation scales with
the data.

Reference parity: the reference engine has no analytics rollups (it
is a RAG service); this extends the engine for the monitoring/
statistics surface a 100 TB pipeline needs (SURVEY.md north-star
extensions). Estimator convention: a percentile estimate is the
UPPER EDGE of the first bin whose cumulative count reaches
``q * total`` — deterministic, engine-independent, error bounded by
one bin width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bin_index(value_col: str, lo: float, width: float, n_bins: int) -> Column:
    """Fixed-width bin index in [0, n_bins): values below ``lo`` clamp
    to bin 0, values at/above ``lo + n_bins*width`` clamp to the last
    bin (open-topped histogram — no row is ever dropped)."""
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    return F.greatest(
        F.lit(0), F.least(raw, F.lit(n_bins - 1))
    ).cast("int")


def histogram_by(
    df: DataFrame,
    value_col: str,
    keys: list[Column | str],
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """(keys..., bin, cnt) partial histogram — one map-side-combinable
    aggregation; the mergeable unit of the rollup."""
    return (
        df.withColumn("bin", bin_index(value_col, lo, width, n_bins))
        .groupBy(*keys, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def merge_histograms(partials: DataFrame, keys: list[Column | str]) -> DataFrame:
    """Re-aggregate partial histograms to a coarser key (e.g. hourly →
    daily): counts simply add. Input row count is ``#fine_keys ×
    #bins`` — decoupled from event volume."""
    return partials.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_percentiles(
    hist: DataFrame,
    keys: list[str],
    qs: list[float],
    lo: float,
    width: float,
) -> DataFrame:
    """Per-key percentile estimates from a merged histogram: for each
    q, the upper edge ``lo + (bin+1)*width`` of the first bin whose
    cumulative count >= ceil(q * total). Window partitions are
    #bins-sized; the output is one row per key group."""
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*keys)
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_tot)
    )
    edge = F.lit(lo) + (F.col("bin") + 1) * F.lit(width)
    aggs = [F.max("total").cast("long").alias("n_events")]
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("total"))
        hit = F.when(F.col("cum") >= target, edge)
        aggs.append(
            F.min(hit).cast("double").alias(f"p{int(round(q * 100))}_est")
        )
    return cum.groupBy(*keys).agg(*aggs)
