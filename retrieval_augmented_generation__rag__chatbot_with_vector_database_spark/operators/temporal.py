"""Temporal joins: distributed as-of (point-in-time) join and bounded
range join — the feature-attachment primitives of a training-data
pipeline (label events joined to the most recent prior state snapshot,
or to all context events inside a time window).

Spark has no native ASOF JOIN (DuckDB/Pandas do); the Spark-first form
here is a UNION + single keyed WINDOW composition, not a UDF and not a
driver loop:

    tag right rows 0 and left rows 1, union by name, then over
    ``partitionBy(key) orderBy(ts, tag)`` take ``last(payload,
    ignorenulls=True)`` from the start of the partition — every left
    row sees exactly the latest right row at-or-before its timestamp.

Cost model: ONE shuffle on the join key (the same lower bound any
keyed join pays), one partition-local sort shared by the window. No
per-left-row probe, no range explosion, no state on the driver. At
100 TB this is shuffle-bound exactly like a regular join.

Hot keys: a window CANNOT be salted (as-of needs the key's total time
order, which salting severs), so a low-cardinality key puts its entire
combined history in one partition. The scale path is ``bucket_s``:
time is cut into buckets and the match is assembled in two
(key, bucket)-grained phases — an in-bucket as-of window (partitions
bounded by bucket population, not key population) plus a carry-forward
of per-bucket "last right row" summaries across buckets (a window over
AT MOST one row per (key, bucket), so the per-key partition is
#buckets-sized regardless of data volume). Same results, bit for bit —
the hot-key randomized cross-check pins it.

The range join's scale path buckets time into ``bucket`` -second cells
and equi-joins on (key, cell) — each right row lands in exactly one
cell and each left row explodes to the few cells its window overlaps,
so candidate pairs are bounded without an O(n^2) cross product per key.

Reference parity: the reference engine has no temporal joins (it is a
RAG service); these extend the engine for the point-in-time feature
joins a 100 TB training-data pipeline needs (SURVEY.md north-star
extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def _us(col: str) -> Column:
    """Integer epoch micros from a TIMESTAMP_NTZ column (tz-independent;
    ``unix_micros`` fails analysis on NTZ)."""
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {col})")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    suffix: str = "_r",
    tolerance_s: float | None = None,
    direction: str = "backward",
    bucket_s: float | None = None,
) -> DataFrame:
    """For every left row, attach ``payload`` columns of the single
    right row with the greatest ``right_ts`` <= ``left_ts`` (backward;
    ``forward`` = smallest >=) sharing the ``on`` keys — DuckDB
    ``ASOF LEFT JOIN`` semantics, inclusive at equality. Unmatched left
    rows keep nulls (left-outer). ``tolerance_s`` nulls out matches
    further than that many seconds away.

    Among right rows tied on (key, ts), the survivor is deterministic
    (md5 over the payload struct — same total-order trick as
    ``merge_last_write_wins``), so results are stable across runs and
    partitionings.

    Scale path (``bucket_s``, seconds): identical results via
    (key, time-bucket)-grained windows — use it when a key's combined
    history is too large for one window partition (hot keys; see the
    module doc). The default single-window path is right for
    user-grained keys.

    Output columns: all of ``left``, plus each payload column (suffixed
    with ``suffix`` on name clashes), plus ``{right_ts}{suffix}`` (the
    matched row's timestamp).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    for k in on:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} missing from one side")
    reserved = {
        "__t", "__tag", "__tb", "__rts", "__mts", "__pk", "__m",
        "__ku", "__b", "__s", "__fl", "__m_in", "__m_prev", "__prev",
    }
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"reserved column names in input: {sorted(clash)}")
    if payload is None:
        payload = [c for c in right.columns if c not in on and c != right_ts]

    # SQL join equality never matches NULL keys: a NULL-key right row
    # must match nothing (window partitionBy would otherwise group
    # NULL with NULL). NULL-key left rows stay, unmatched, via the
    # left-outer contract.
    for k in on:
        right = right.filter(F.col(k).isNotNull())

    # temp names dodge clashes with left columns during the union.
    # ALL payload columns (and the matched timestamp) ride in ONE
    # struct so the single `last(ignorenulls)` below picks one whole
    # right row — per-column lasts would back-fill a NULL payload
    # value from an older right row, emitting a mixed row that never
    # existed.
    tmp = {c: f"__p{i}" for i, c in enumerate(payload)}
    r2 = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__t"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(tmp[c]) for c in payload],
        ).alias("__pk"),
        F.lit(0).alias("__tag"),
        # deterministic tiebreak among right rows tied on (key, ts)
        F.md5(F.to_json(F.struct(*payload))).alias("__tb"),
    )
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("string").alias("__tb"),
    )
    if bucket_s is None:
        u = l2.unionByName(r2, allowMissingColumns=True)

        # one shuffle on the keys; right rows sort before tied left
        # rows (tag 0 < 1) so equality is inclusive (ASOF semantics)
        t_ord = (
            F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
        )
        w = (
            Window.partitionBy(*on)
            .orderBy(t_ord, F.col("__tag").asc(), F.col("__tb").asc_nulls_last())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # ONE last() over the packed struct: the matched timestamp and
        # every payload value come from the SAME right row
        out = (
            u.select("*", F.last("__pk", ignorenulls=True).over(w).alias("__m"))
            .filter(F.col("__tag") == 1)
            .drop("__t", "__tag", "__tb", "__pk")
        )
    else:
        out = _asof_bucketed(l2, r2, on, direction, bucket_s)

    if tolerance_s is not None:
        gap = F.expr(
            f"abs(timestampdiff(MICROSECOND, __m.__rts, {left_ts}))"
        ) / F.lit(1_000_000.0)
        keep = F.col("__m.__rts").isNotNull() & (
            gap <= F.lit(float(tolerance_s))
        )
        # nulling the whole struct nulls the match atomically
        out = out.withColumn("__m", F.when(keep, F.col("__m")))

    # final names: payload cols, suffixed on clash with left's columns
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__m.__rts").alias(f"{right_ts}{suffix}"))
    for c in payload:
        name = c if c not in left.columns else f"{c}{suffix}"
        sel.append(F.col(f"__m.{tmp[c]}").alias(name))
    return out.select(*sel)


def _asof_bucketed(
    l2: DataFrame,
    r2: DataFrame,
    on: list[str],
    direction: str,
    bucket_s: float,
) -> DataFrame:
    """Skew-safe as-of core: same ``__m`` result as the single-window
    path, assembled from (key, time-bucket)-grained pieces.

    Direction is normalized away by negating the microsecond order key
    for ``forward``: a forward as-of on t is a backward as-of on -t,
    including tie semantics (forward's survivor among ties is the
    max-md5 row, exactly what backward-on-negated produces). With the
    normalized key ``__ku``, the true match for a left row is the
    right row with the greatest (``__ku``, md5) <= the left row's key,
    which is either

    - **in the left row's own bucket** — found by the same union +
      ``last(ignorenulls)`` window as the default path, but partitioned
      by (key, bucket): the partition holds one bucket's population,
      never a key's full history; or
    - **in an earlier bucket** — in which case it is the overall-latest
      right row of the latest non-empty earlier bucket. Those
      "per-bucket latest" summaries are one row per (key, bucket);
      running ``max`` over them with a range frame up to the PREVIOUS
      bucket is a window over a #buckets-sized partition regardless of
      row volume. The in-bucket candidate, when present, always wins
      (same bucket ⇒ later than anything in earlier buckets), so the
      final match is ``coalesce(in_bucket, carried)``.

    Cost: one (key, bucket) shuffle for the in-bucket window, one
    (key, bucket) aggregation for the summaries, one small window and
    one (key, bucket) equi-join — no partition ever holds more than a
    bucket's rows or a key's bucket count.
    """
    b_us = int(bucket_s * 1_000_000)
    if b_us <= 0:
        raise ValueError("bucket_s must be positive")
    sign = 1 if direction == "backward" else -1
    dtype = dict(r2.dtypes)["__t"]
    if "timestamp" in dtype:
        ku = F.expr(
            f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, "
            "cast(__t as timestamp_ntz))"
        )
    else:  # numeric ts column: values are seconds
        ku = (F.col("__t") * F.lit(1_000_000)).cast("long")
    ku = ku * F.lit(sign)

    l3 = l2.withColumn("__ku", ku).withColumn(
        "__b", F.floor(F.col("__ku") / F.lit(b_us))
    )
    r3 = r2.withColumn("__ku", ku).withColumn(
        "__b", F.floor(F.col("__ku") / F.lit(b_us))
    )

    # phase 1: in-bucket as-of — partitions bounded by bucket population
    u = l3.unionByName(r3, allowMissingColumns=True)
    w_in = (
        Window.partitionBy(*on, "__b")
        .orderBy(
            F.col("__ku").asc(), F.col("__tag").asc(),
            F.col("__tb").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inb = (
        u.select("*", F.last("__pk", ignorenulls=True).over(w_in).alias("__m_in"))
        .filter(F.col("__tag") == 1)
    )

    # phase 2: carry-forward of per-bucket "latest right row" summaries
    bl = r3.groupBy(*on, "__b").agg(
        F.max(
            F.struct(
                F.col("__ku").alias("k"),
                F.col("__tb").alias("tb"),
                F.col("__pk").alias("pk"),
            )
        ).alias("__s")
    )
    s_type = bl.schema["__s"].dataType
    lb = l3.select(*on, "__b").distinct()
    allb = bl.select(
        *on, "__b", "__s", F.lit(0).alias("__fl")
    ).unionByName(
        lb.select(
            *on, "__b",
            F.lit(None).cast(s_type).alias("__s"),
            F.lit(1).alias("__fl"),
        )
    )
    w_cum = (
        Window.partitionBy(*on)
        .orderBy(F.col("__b"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        allb.withColumn("__prev", F.max("__s").over(w_cum))
        .filter(F.col("__fl") == 1)
        .select(*on, "__b", F.col("__prev.pk").alias("__m_prev"))
    )

    return (
        inb.join(cum, [*on, "__b"], "left")
        .withColumn("__m", F.coalesce(F.col("__m_in"), F.col("__m_prev")))
        .drop("__t", "__tag", "__tb", "__pk", "__ku", "__b", "__m_in", "__m_prev")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = 0.0,
    upper_s: float = 0.0,
    bucket_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of every left row to ALL right rows sharing the
    ``on`` keys with ``right_ts`` in ``[left_ts + lower_s, left_ts +
    upper_s]`` (seconds, inclusive, either bound may be negative).

    Default path: keyed equi-join + range predicate — Catalyst builds a
    shuffled hash join on the keys and evaluates the band per pair;
    right-sized when keys bound the per-key row count (user_id here).

    Scale path (``bucket_s``): time is cut into ``bucket_s``-second
    cells; each right row lands in exactly ONE cell key and each left
    row explodes to the (few) cells overlapping its window — the join
    becomes a pure equi-join on (keys, cell), bounding candidates even
    for hot keys or key-free bands, then the exact band predicate
    filters. Each matching pair appears exactly once (one cell per
    right row). Pick ``bucket_s`` ≈ the window width.

    Right's payload columns are suffixed with ``suffix`` on clashes.
    """
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)
    if lo_us > hi_us:
        raise ValueError(f"lower_s {lower_s} > upper_s {upper_s}")

    rcols = [c for c in right.columns if c not in on]
    r2 = right.select(
        *on,
        *[
            F.col(c).alias(c if c not in left.columns else f"{c}{suffix}")
            for c in rcols
        ],
    )
    rts = right_ts if right_ts not in left.columns else f"{right_ts}{suffix}"

    l_us = _us(left_ts)
    r_us = _us(rts)

    if bucket_s is None:
        cond = [left[k] == r2[k] for k in on]
        joined = left.join(r2, cond, "inner").drop(*[r2[k] for k in on])
        return joined.filter(
            (r_us >= l_us + F.lit(lo_us)) & (r_us <= l_us + F.lit(hi_us))
        )

    b_us = int(bucket_s * 1_000_000)
    if b_us <= 0:
        raise ValueError("bucket_s must be positive")
    rb = r2.withColumn("__cell", F.floor(r_us / F.lit(b_us)))
    lb = left.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor((l_us + F.lit(lo_us)) / F.lit(b_us)),
                F.floor((l_us + F.lit(hi_us)) / F.lit(b_us)),
            )
        ),
    )
    cond = [lb[k] == rb[k] for k in on] + [lb["__cell"] == rb["__cell"]]
    joined = lb.join(rb, cond, "inner").drop(rb["__cell"]).drop(
        *[rb[k] for k in on]
    )
    return joined.filter(
        (r_us >= l_us + F.lit(lo_us)) & (r_us <= l_us + F.lit(hi_us))
    ).drop("__cell")


def interval_join(
    left: DataFrame,
    dim: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    payload: list[str] | None = None,
    suffix: str = "_r",
    bucket_s: float | None = None,
) -> DataFrame:
    """SCD2 / validity-interval enrichment: attach to every left row
    the dimension row whose ``[valid_from, valid_to)`` interval
    contains ``left_ts`` (half-open, the SCD2 convention; a NULL
    ``valid_to`` means the open current version). Left-outer — rows in
    an interval gap (or before the first version) keep nulls.

    Requires the standard SCD2 shape: per key, intervals do NOT
    overlap (``interval_overlaps`` audits that; a warehouse's dimension
    maintenance guarantees it). Under that contract the containing
    interval is exactly the one with the greatest ``valid_from`` <=
    ``left_ts`` whose ``valid_to`` has not passed, so the operator IS
    the as-of join on ``valid_from`` plus an atomic expiry check on the
    matched row — one shuffle, window-based, inheriting the skew-safe
    ``bucket_s`` two-phase path untouched. The naive BETWEEN join the
    oracle runs would fan out per (key, interval) candidate at scale;
    this form never builds candidate pairs at all.

    Output: all of ``left``, plus the matched version's bounds and
    payload columns — each under its own name, or ``{name}{suffix}``
    only when that name already exists on ``left`` (clash-only
    suffixing, the ``asof_join`` convention). Payload defaults to
    every dim column except keys and the two bound columns; a caller-
    supplied payload may list ``valid_to`` (it is carried once either
    way).
    """
    if payload is None:
        payload = [
            c for c in dim.columns if c not in on and c not in (valid_from, valid_to)
        ]
    # valid_to is appended as the expiry-check column; a payload that
    # already names it would otherwise duplicate the struct field and
    # make the __m.<field> reference ambiguous inside asof_join
    payload = [c for c in payload if c != valid_to]
    j = asof_join(
        left,
        dim,
        on=on,
        left_ts=left_ts,
        right_ts=valid_from,
        payload=payload + [valid_to],
        suffix=suffix,
        bucket_s=bucket_s,
    )
    vf = f"{valid_from}{suffix}" if valid_from in left.columns else valid_from
    vt = f"{valid_to}{suffix}" if valid_to in left.columns else valid_to
    # asof_join emits the matched valid_from as {right_ts}{suffix}
    matched_from = f"{valid_from}{suffix}"
    alive = F.col(vt).isNull() | (F.col(left_ts) < F.col(vt))
    out_payload = [c if c not in left.columns else f"{c}{suffix}" for c in payload]
    sel = [F.col(c) for c in left.columns]
    sel.append(F.when(alive, F.col(matched_from)).alias(vf))
    sel.append(F.when(alive, F.col(vt)).alias(vt))
    for c in out_payload:
        # all payload columns come from the single asof-matched row,
        # so per-column nulling under ONE shared predicate is atomic
        sel.append(F.when(alive, F.col(c)).alias(c))
    return j.select(*sel)


def interval_overlaps(
    dim: DataFrame,
    on: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Audit the SCD2 non-overlap contract ``interval_join`` relies
    on: per key, sorted by ``valid_from``, flag every version whose
    predecessor is still open when it starts (``prev_to > from`` or
    prev ``valid_to`` NULL). Returns the violating rows with the
    offending predecessor bounds — empty means the dimension is
    well-formed. One window over the DIMENSION (small next to facts)."""
    w = Window.partitionBy(*on).orderBy(F.col(valid_from).asc())
    prev_to = F.lag(F.col(valid_to)).over(w)
    prev_from = F.lag(F.col(valid_from)).over(w)
    return (
        dim.withColumn("__prev_to", prev_to)
        .withColumn("__prev_from", prev_from)
        .filter(
            F.col("__prev_from").isNotNull()
            & (F.col("__prev_to").isNull() | (F.col("__prev_to") > F.col(valid_from)))
        )
        .withColumnRenamed("__prev_to", "prev_valid_to")
        .withColumnRenamed("__prev_from", "prev_valid_from")
    )
