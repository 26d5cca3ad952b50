"""streaming/joins.py: watermarked stream-stream range join — parity
with the batch range_join, incremental drains, restart idempotence,
and left-outer null emission."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.temporal import (
    range_join,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    load,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.joins import (
    start_attribution_join_stream,
    stream_range_join,
)

SF_DIR = "/root/testdata/sf0.001"
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _drain(q):
    q.awaitTermination()


@pytest.fixture(scope="module")
def split_events(spark):
    ev = load(spark, SF_DIR, "events").select(*COLS)
    # TIMESTAMP (LTZ) file drops: the file-source schema in the
    # starter reads plain timestamp
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    return purchases, clicks


def _batch_expected(purchases, clicks):
    j = range_join(
        purchases,
        clicks.select("user_id", "ts", "value"),
        on=["user_id"],
        lower_s=-3600.0,
        upper_s=0.0,
    )
    return {
        (r["event_id"], r["user_id"], r["ts_r"], r["value_r"])
        for r in j.collect()
    }


def test_stream_stream_join_matches_batch_range_join(spark, tmp_path, split_events):
    purchases, clicks = split_events
    ldir, rdir = tmp_path / "purchases", tmp_path / "clicks"
    purchases.coalesce(1).write.parquet(str(ldir / "d1"))
    clicks.coalesce(1).write.parquet(str(rdir / "d1"))
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    _drain(
        start_attribution_join_stream(
            spark, str(ldir) + "/*", str(rdir) + "/*", sink, ckpt,
            watermark="720 hours",  # fixture spans a month: drop nothing
        )
    )
    got = {
        (r["event_id"], r["user_id"], r["ts_r"], r["value_r"])
        for r in spark.read.parquet(sink)
        .select("event_id", "user_id", "ts_r", "value_r")
        .collect()
    }
    want = _batch_expected(
        purchases, clicks.select("user_id", "ts", "value")
    )
    want = {
        (r[0], r[1], r[2], r[3]) for r in want
    }
    assert got == want
    assert len(got) > 0


def test_stream_stream_join_incremental_and_replay_safe(spark, tmp_path, split_events):
    """Clicks arrive in a LATER drop than their purchases: the join
    state must hold purchase rows across micro-batches and emit the
    pair when the click lands; a no-new-data re-drain adds nothing."""
    purchases, clicks = split_events
    ldir, rdir = tmp_path / "p", tmp_path / "c"
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    purchases.coalesce(1).write.parquet(str(ldir / "d1"))
    # first drop: empty click directory (schema-only file)
    clicks.limit(0).coalesce(1).write.parquet(str(rdir / "d1"))
    _drain(
        start_attribution_join_stream(
            spark, str(ldir) + "/*", str(rdir) + "/*", sink, ckpt,
            watermark="720 hours",
        )
    )
    n1 = spark.read.parquet(sink).count()

    clicks.coalesce(1).write.parquet(str(rdir / "d2"))
    _drain(
        start_attribution_join_stream(
            spark, str(ldir) + "/*", str(rdir) + "/*", sink, ckpt,
            watermark="720 hours",
        )
    )
    out = spark.read.parquet(sink)
    want = _batch_expected(purchases, clicks.select("user_id", "ts", "value"))
    got = {
        (r["event_id"], r["user_id"], r["ts_r"], r["value_r"])
        for r in out.select("event_id", "user_id", "ts_r", "value_r").collect()
    }
    assert n1 == 0 and got == want

    # replay with no new files: exactly-once, nothing appended
    _drain(
        start_attribution_join_stream(
            spark, str(ldir) + "/*", str(rdir) + "/*", sink, ckpt,
            watermark="720 hours",
        )
    )
    assert spark.read.parquet(sink).count() == len(want)


def test_stream_range_join_batch_mode_and_validation(spark, split_events):
    purchases, clicks = split_events
    out = stream_range_join(
        purchases, clicks.select("user_id", "ts", "value"), on=["user_id"]
    )
    # batch mode: same band semantics as range_join
    want = _batch_expected(purchases, clicks.select("user_id", "ts", "value"))
    got = {
        (r["event_id"], r["user_id"], r["ts_r"], r["value_r"])
        for r in out.select("event_id", "user_id", "ts_r", "value_r").collect()
    }
    assert got == want
    with pytest.raises(ValueError):
        stream_range_join(purchases, clicks, on=["user_id"], lower_s=1, upper_s=0)
    with pytest.raises(ValueError):
        stream_range_join(purchases, clicks, on=["user_id"], join_type="fullOuter")


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path, split_events):
    """leftOuter: purchases with no click in their band emit
    null-padded — but only once the watermark proves no match can
    arrive. Tight watermark + full drain → every purchase appears
    exactly once, matched or null."""
    purchases, clicks = split_events
    ldir, rdir = tmp_path / "p", tmp_path / "c"
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    purchases.coalesce(1).write.parquet(str(ldir / "d1"))
    clicks.coalesce(1).write.parquet(str(rdir / "d1"))

    _drain(
        start_attribution_join_stream(
            spark, str(ldir) + "/*", str(rdir) + "/*", sink, ckpt,
            watermark="1 hour", join_type="leftOuter",
        )
    )
    # advance both watermarks far past every band: a final empty drop
    # whose max ts pushes the watermark to the end of the fixture
    bump = purchases.orderBy(F.col("ts").desc()).limit(1).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1000 HOURS")
    ).withColumn("event_id", F.lit(-999))
    bump.coalesce(1).write.parquet(str(ldir / "d2"))
    bump.withColumn("event_type", F.lit("click")).coalesce(1).write.parquet(
        str(rdir / "d2")
    )
    _drain(
        start_attribution_join_stream(
            spark, str(ldir) + "/*", str(rdir) + "/*", sink, ckpt,
            watermark="1 hour", join_type="leftOuter",
        )
    )
    out = spark.read.parquet(sink).filter(F.col("event_id") != -999)
    matched = _batch_expected(purchases, clicks.select("user_id", "ts", "value"))
    matched_ids = {m[0] for m in matched}
    all_ids = {r["event_id"] for r in purchases.select("event_id").collect()}

    got_matched = {
        (r["event_id"], r["user_id"], r["ts_r"], r["value_r"])
        for r in out.filter(F.col("ts_r").isNotNull())
        .select("event_id", "user_id", "ts_r", "value_r")
        .collect()
    }
    got_null_ids = {
        r["event_id"] for r in out.filter(F.col("ts_r").isNull()).collect()
    }
    assert got_matched == matched
    assert got_null_ids == all_ids - matched_ids
