"""operators/temporal: as-of join (backward/forward, tolerance, tie
determinism, left-outer nulls) and range join (plain vs bucketed
parity, bound inclusivity), plus the one-shuffle plan contract."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.temporal import (
    asof_join,
    range_join,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.plans.inspect import (
    shuffle_count,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00"), 5.0),
            (2, 10, _ts("2024-01-01T12:00:00"), 6.0),
            (3, 20, _ts("2024-01-01T09:00:00"), 7.0),  # before any right
            (4, 30, _ts("2024-01-01T09:00:00"), 8.0),  # user with no right
        ],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:30:00"), 1.0),
            (10, _ts("2024-01-01T10:00:00"), 2.0),  # ties left row 1 exactly
            (10, _ts("2024-01-01T11:00:00"), 3.0),
            (20, _ts("2024-01-01T09:30:00"), 4.0),
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    return left, right


def _by_id(rows):
    return {r["event_id"]: r for r in rows}


def test_asof_backward_inclusive_and_left_outer(spark, frames):
    left, right = frames
    got = _by_id(
        asof_join(left, right, on=["user_id"], payload=["value"]).collect()
    )
    assert len(got) == 4  # every left row survives
    # equality is inclusive: row 1 matches the 10:00:00 right row
    assert got[1]["value_r"] == 2.0
    assert got[1]["ts_r"] == _ts("2024-01-01T10:00:00")
    # latest prior (11:00), not just any prior
    assert got[2]["value_r"] == 3.0
    # left rows before any right / with no right partner keep nulls
    assert got[3]["value_r"] is None and got[3]["ts_r"] is None
    assert got[4]["value_r"] is None
    # left's own columns untouched
    assert got[1]["value"] == 5.0


def test_asof_forward(spark, frames):
    left, right = frames
    got = _by_id(
        asof_join(
            left, right, on=["user_id"], payload=["value"], direction="forward"
        ).collect()
    )
    # earliest at-or-after: row 1 → 10:00 (inclusive), row 3 → 09:30
    assert got[1]["value_r"] == 2.0
    assert got[3]["value_r"] == 4.0
    # row 2 (12:00) has nothing after it
    assert got[2]["value_r"] is None


def test_asof_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    got = _by_id(
        asof_join(
            left,
            right,
            on=["user_id"],
            payload=["value"],
            tolerance_s=3600,
        ).collect()
    )
    assert got[1]["value_r"] == 2.0  # 0 s gap: kept
    assert got[2]["value_r"] == 3.0  # 3600 s gap: kept (inclusive bound)
    assert got[3]["value_r"] is None
    got2 = _by_id(
        asof_join(
            left,
            right,
            on=["user_id"],
            payload=["value"],
            tolerance_s=3599,
        ).collect()
    )
    assert got2[2]["value_r"] is None  # 3600 s gap > 3599 s: nulled
    assert got2[2]["ts_r"] is None


def test_asof_tied_right_rows_deterministic(spark):
    """Two right rows at the SAME (key, ts): the md5-payload tiebreak
    must pick the same survivor on every run/partitioning."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00:00"))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:00:00"), 111.0),
            (10, _ts("2024-01-01T09:00:00"), 222.0),
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    vals = {
        # left has no `value` column, so the payload keeps its bare name
        asof_join(
            left.repartition(n), right, on=["user_id"], payload=["value"]
        ).collect()[0]["value"]
        for n in (1, 2, 5)
    }
    assert len(vals) == 1  # same survivor regardless of partitioning


def test_asof_join_is_single_shuffle(spark, frames):
    """The 100 TB contract: union + keyed window = ONE exchange on the
    join key — the same lower bound a plain keyed join pays."""
    left, right = frames
    out = asof_join(left, right, on=["user_id"], payload=["value"])
    assert shuffle_count(out) == 1


def test_range_join_bounds_inclusive(spark, frames):
    left, right = frames
    got = range_join(
        left, right, on=["user_id"], lower_s=-1800, upper_s=0
    ).collect()
    # row 1 (10:00): right 09:30 (-1800 s, inclusive) and 10:00 (0 s)
    pairs = {
        (r["event_id"], r["value_r"]) for r in got
    }
    assert (1, 1.0) in pairs and (1, 2.0) in pairs
    assert (2, 3.0) not in pairs  # 11:00 is 3600 s before 12:00: outside
    assert not any(e == 4 for e, _ in pairs)  # inner join drops no-match


def test_range_join_bucketed_equals_plain(spark):
    """The bucketed scale path must produce exactly the plain path's
    pairs — for bucket widths smaller, equal to, and larger than the
    window, including negative-epoch-robust cells."""
    import random

    rng = random.Random(7)
    base = _ts("2024-01-01T00:00:00")
    left = spark.createDataFrame(
        [
            (i, rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(86400)))
            for i in range(120)
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(86400)), float(i))
            for i in range(200)
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    plain = {
        (r["event_id"], r["value"])
        for r in range_join(
            left, right, on=["user_id"], lower_s=-900, upper_s=900
        ).collect()
    }
    assert plain  # non-degenerate fixture
    for bucket in (450, 1800, 7200):
        bucketed = {
            (r["event_id"], r["value"])
            for r in range_join(
                left,
                right,
                on=["user_id"],
                lower_s=-900,
                upper_s=900,
                bucket_s=bucket,
            ).collect()
        }
        assert bucketed == plain, f"bucket_s={bucket}"


def test_range_join_bucketed_is_pure_equi_join(spark, frames):
    """Plan contract for the scale path: the bucketed range join must
    be a hash join on (key, cell) — never a nested-loop/cartesian
    product, which is what a bare band predicate degenerates to
    without an equi-key."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.plans.inspect import (
        physical_plan,
    )

    left, right = frames
    out = range_join(
        left, right, on=["user_id"], lower_s=-1800, upper_s=0, bucket_s=1800
    )
    plan = physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_randomized_against_python_reference(spark):
    """200 seeded random left/right rows over few keys (dense ties,
    unmatched keys, equal timestamps): asof_join must agree row for
    row with a transparent per-row Python evaluator, in backward and
    forward directions, with and without tolerance."""
    import random

    rng = random.Random(42)
    base = _ts("2024-01-01T00:00:00")

    # left may repeat timestamps (and tie right rows exactly); right
    # timestamps are unique so the per-row reference is well-defined
    # (tied right rows resolve by an md5 tiebreak the transparent
    # reference can't reproduce — tie determinism has its own test)
    lrows = [
        (
            i,
            rng.randrange(6),
            base + dt.timedelta(seconds=rng.randrange(0, 36000, 60)),
            float(i),
        )
        for i in range(200)
    ]
    rrows = [
        (rng.randrange(6), base + dt.timedelta(seconds=s), float(i))
        for i, s in enumerate(rng.sample(range(0, 36000, 60), 200))
    ]
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp_ntz, lval double"
    )
    right = spark.createDataFrame(
        rrows, "user_id long, ts timestamp_ntz, value double"
    )

    def ref(direction, tol):
        out = {}
        for eid, u, t, _ in lrows:
            if direction == "backward":
                cands = [(rt, rv) for ru, rt, rv in rrows if ru == u and rt <= t]
                best = max(cands, default=None)
            else:
                cands = [(rt, rv) for ru, rt, rv in rrows if ru == u and rt >= t]
                best = min(cands, default=None)
            if best is not None and tol is not None:
                if abs((t - best[0]).total_seconds()) > tol:
                    best = None
            out[eid] = best
        return out

    for direction in ("backward", "forward"):
        for tol in (None, 1800):
            got = {
                r["event_id"]: (
                    (r["ts_r"], r["value"]) if r["ts_r"] is not None else None
                )
                for r in asof_join(
                    left,
                    right,
                    on=["user_id"],
                    payload=["value"],
                    direction=direction,
                    tolerance_s=tol,
                ).collect()
            }
            expected = ref(direction, tol)
            assert got == expected, f"direction={direction} tol={tol}"


def test_asof_null_keys_never_match(spark):
    """SQL join equality is NULL-hostile: a NULL-key right row matches
    nothing, and a NULL-key left row survives unmatched (left-outer) —
    matching DuckDB ASOF semantics, not window-partition NULL grouping."""
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-01T10:00:00")), (2, 10, _ts("2024-01-01T10:00:00"))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(None, _ts("2024-01-01T09:00:00"), 111.0), (10, _ts("2024-01-01T09:00:00"), 7.0)],
        "user_id long, ts timestamp_ntz, value double",
    )
    got = _by_id(asof_join(left, right, on=["user_id"], payload=["value"]).collect())
    assert len(got) == 2
    assert got[1]["value"] is None and got[1]["ts_r"] is None
    assert got[2]["value"] == 7.0


def test_asof_reserved_names_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="reserved column"):
        asof_join(left.withColumn("__tag", F.lit(1)), right, on=["user_id"])


def test_asof_null_payload_comes_from_matched_row_only(spark):
    """Regression: a NULL payload value in the MATCHED right row must
    stay NULL — per-column last(ignorenulls) used to back-fill it from
    an OLDER right row, emitting a mixed row that never existed.
    Repro from the round-4 advice: right rows (10:00, x=5, y=1) and
    (11:00, x=NULL, y=2); a 12:00 left row must see (11:00, NULL, 2),
    never (11:00, 5.0, 2)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T12:00:00"))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 5.0, 1.0),
            (10, _ts("2024-01-01T11:00:00"), None, 2.0),
        ],
        "user_id long, ts timestamp_ntz, x double, y double",
    )
    row = asof_join(
        left, right, on=["user_id"], payload=["x", "y"]
    ).collect()[0]
    assert row["ts_r"] == _ts("2024-01-01T11:00:00")
    assert row["x"] is None  # NOT back-filled to 5.0
    assert row["y"] == 2.0


def test_asof_all_null_payload_row_still_matches(spark):
    """A right row whose payload is entirely NULL is still a real
    match (ts_r set, payload NULL) — not skipped in favor of an older
    row. The packed-struct form guarantees this; bare per-column
    lasts would skip it."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T12:00:00"))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 5.0),
            (10, _ts("2024-01-01T11:00:00"), None),
        ],
        "user_id long, ts timestamp_ntz, x double",
    )
    row = asof_join(left, right, on=["user_id"], payload=["x"]).collect()[0]
    assert row["ts_r"] == _ts("2024-01-01T11:00:00")
    assert row["x"] is None


def test_asof_bucketed_randomized_hot_key(spark):
    """The skew-safe path on a HOT-KEY corpus (two keys, one carrying
    ~90% of rows): bucketed as-of must agree row for row with the
    per-row Python reference, in both directions, with and without
    tolerance, at bucket widths that do and don't divide the data's
    time step (uneven boundaries exercise the carry-forward across
    empty buckets)."""
    import random

    rng = random.Random(7)
    base = _ts("2024-01-01T00:00:00")
    lrows = [
        (
            i,
            0 if rng.random() < 0.9 else 1,
            base + dt.timedelta(seconds=rng.randrange(0, 36000, 60)),
            float(i),
        )
        for i in range(300)
    ]
    rrows = [
        (0 if i < 180 else 1, base + dt.timedelta(seconds=s), float(i))
        for i, s in enumerate(rng.sample(range(0, 36000, 60), 200))
    ]
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp_ntz, lval double"
    )
    right = spark.createDataFrame(
        rrows, "user_id long, ts timestamp_ntz, value double"
    )

    def ref(direction, tol):
        out = {}
        for eid, u, t, _ in lrows:
            if direction == "backward":
                cands = [(rt, rv) for ru, rt, rv in rrows if ru == u and rt <= t]
                best = max(cands, default=None)
            else:
                cands = [(rt, rv) for ru, rt, rv in rrows if ru == u and rt >= t]
                best = min(cands, default=None)
            if best is not None and tol is not None:
                if abs((t - best[0]).total_seconds()) > tol:
                    best = None
            out[eid] = best
        return out

    for direction in ("backward", "forward"):
        for tol, bucket in ((None, 613.0), (1800, 3600.0)):
            got = {
                r["event_id"]: (
                    (r["ts_r"], r["value"]) if r["ts_r"] is not None else None
                )
                for r in asof_join(
                    left,
                    right,
                    on=["user_id"],
                    payload=["value"],
                    direction=direction,
                    tolerance_s=tol,
                    bucket_s=bucket,
                ).collect()
            }
            assert got == ref(direction, tol), (
                f"direction={direction} tol={tol} bucket={bucket}"
            )


def test_asof_bucketed_equals_single_window(spark, frames):
    """Full-row equality of the bucketed and default paths on the
    fixture corpus (ties, unmatched keys, left-outer rows) — the
    bucketed assembly is an implementation change, not a semantics
    change."""
    left, right = frames
    base = asof_join(left, right, on=["user_id"], payload=["value"])
    for bucket in (900.0, 3600.0, 360000.0):
        b = asof_join(
            left, right, on=["user_id"], payload=["value"], bucket_s=bucket
        )
        assert sorted(map(tuple, b.collect())) == sorted(
            map(tuple, base.collect())
        )


def test_asof_bucketed_mixed_null_payload(spark):
    """The packed-struct single-right-row contract holds on the
    bucketed path too (regression twin of
    test_asof_null_payload_comes_from_matched_row_only), including
    when match and left row land in different buckets."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T12:00:00"))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 5.0, 1.0),
            (10, _ts("2024-01-01T11:00:00"), None, 2.0),
        ],
        "user_id long, ts timestamp_ntz, x double, y double",
    )
    for bucket in (600.0, 86400.0):  # cross-bucket and same-bucket
        row = asof_join(
            left, right, on=["user_id"], payload=["x", "y"], bucket_s=bucket
        ).collect()[0]
        assert row["ts_r"] == _ts("2024-01-01T11:00:00")
        assert row["x"] is None and row["y"] == 2.0


# ---------------- interval_join (SCD2 enrichment) ----------------


def _scd_frames(spark):
    dim = spark.createDataFrame(
        [
            # user 10: v1 [09:00,10:00), v2 [10:00,11:00), gap, v3 [12:00, open)
            (10, _ts("2024-01-01T09:00:00"), _ts("2024-01-01T10:00:00"), "v1"),
            (10, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"), "v2"),
            (10, _ts("2024-01-01T12:00:00"), None, "v3"),
            # user 20: single closed version
            (20, _ts("2024-01-01T09:00:00"), _ts("2024-01-01T09:30:00"), "w1"),
        ],
        "user_id long, valid_from timestamp_ntz, valid_to timestamp_ntz, ver string",
    )
    facts = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T08:59:00")),  # before first version
            (2, 10, _ts("2024-01-01T09:00:00")),  # inclusive at valid_from
            (3, 10, _ts("2024-01-01T10:00:00")),  # boundary: v2, not v1
            (4, 10, _ts("2024-01-01T11:30:00")),  # in the gap
            (5, 10, _ts("2024-01-01T23:00:00")),  # open current version
            (6, 20, _ts("2024-01-01T09:30:00")),  # exactly at expiry: no match
            (7, 30, _ts("2024-01-01T09:00:00")),  # key with no dim rows
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    return facts, dim


def test_interval_join_scd2_semantics(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.temporal import (
        interval_join,
    )

    facts, dim = _scd_frames(spark)
    out = {
        r["event_id"]: r["ver"]
        for r in interval_join(facts, dim, on=["user_id"]).collect()
    }
    assert out == {1: None, 2: "v1", 3: "v2", 4: None, 5: "v3", 6: None, 7: None}


def test_interval_join_equals_between_join_randomized(spark):
    """Property: on a random non-overlapping SCD2 dimension, the
    window-based interval_join equals the naive BETWEEN join."""
    import random

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.temporal import (
        interval_join,
    )

    rng = random.Random(42)
    dim_rows, fact_rows = [], []
    for u in range(8):
        t = 0
        versions = []
        for v in range(rng.randint(0, 5)):
            start = t + rng.randint(0, 3) * 60  # gaps allowed
            end = start + rng.randint(1, 4) * 60
            versions.append((start, end, f"u{u}v{v}"))
            t = end
        if versions and rng.random() < 0.5:  # open current version
            s, _, name = versions[-1]
            versions[-1] = (s, None, name)
        for s, e, name in versions:
            dim_rows.append(
                (u, _ts("2024-01-01T00:00:00") + dt.timedelta(seconds=s),
                 None if e is None else _ts("2024-01-01T00:00:00") + dt.timedelta(seconds=e),
                 name)
            )
        for i in range(30):
            fact_rows.append(
                (u * 100 + i, u,
                 _ts("2024-01-01T00:00:00")
                 + dt.timedelta(seconds=rng.randint(-60, t + 240)))
            )
    dim = spark.createDataFrame(
        dim_rows,
        "user_id long, valid_from timestamp_ntz, valid_to timestamp_ntz, ver string",
    )
    facts = spark.createDataFrame(
        fact_rows, "event_id long, user_id long, ts timestamp_ntz"
    )
    got = {
        (r["event_id"], r["ver"], r["valid_from"], r["valid_to"])
        for r in interval_join(facts, dim, on=["user_id"]).collect()
    }
    naive = (
        facts.join(
            dim,
            (facts.user_id == dim.user_id)
            & (dim.valid_from <= facts.ts)
            & (dim.valid_to.isNull() | (facts.ts < dim.valid_to)),
            "left",
        )
        .select("event_id", "ver", "valid_from", "valid_to")
    )
    want = {
        (r["event_id"], r["ver"], r["valid_from"], r["valid_to"])
        for r in naive.collect()
    }
    assert got == want


def test_interval_join_bucketed_parity(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.temporal import (
        interval_join,
    )

    facts, dim = _scd_frames(spark)
    plain = sorted(
        map(tuple, interval_join(facts, dim, on=["user_id"]).collect())
    )
    bucketed = sorted(
        map(tuple, interval_join(facts, dim, on=["user_id"], bucket_s=1800).collect())
    )
    assert plain == bucketed


def test_interval_overlaps_audit(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.temporal import (
        interval_overlaps,
    )

    facts, dim = _scd_frames(spark)
    assert interval_overlaps(dim, on=["user_id"]).count() == 0
    bad = dim.unionByName(
        spark.createDataFrame(
            [(10, _ts("2024-01-01T10:30:00"), _ts("2024-01-01T10:45:00"), "vX")],
            "user_id long, valid_from timestamp_ntz, valid_to timestamp_ntz, ver string",
        )
    )
    flagged = interval_overlaps(bad, on=["user_id"]).collect()
    assert [r["ver"] for r in flagged] == ["vX"]
