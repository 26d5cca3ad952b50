"""Streaming PII scrub (streaming/scrub.py): stream output is
row-identical to the batch operator over the same rows, the raw text
column never reaches the sink, re-draining the same landing dir is a
no-op (checkpoint exactly-once), and new files are picked up on
restart."""

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pii import (
    scrub_documents,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.scrub import (
    SCRUB_STREAM_SCHEMA,
    start_scrub_stream,
)

_DOCS = [
    (0, "a", "mail jane@example.com now"),
    (1, "b", "ssn 123-45-6789 and ip 10.0.0.1"),
    (2, "c", "nothing sensitive"),
]
_MORE = [
    (3, "d", "call 415-555-0134"),
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_matches_batch_and_is_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    docs = spark.createDataFrame(_DOCS, SCRUB_STREAM_SCHEMA)
    docs.write.parquet(landing)

    start_scrub_stream(spark, landing, sink, ckpt).awaitTermination(120)
    got = spark.read.parquet(sink)
    assert "text" not in got.columns  # raw bytes never persist
    want = scrub_documents(docs, keep_text=False).select(*got.columns)
    assert _rows(got) == _rows(want)

    # re-drain: same checkpoint, no new files -> no new rows
    start_scrub_stream(spark, landing, sink, ckpt).awaitTermination(120)
    assert _rows(spark.read.parquet(sink)) == _rows(want)

    # late-arriving file picked up on restart, exactly once
    spark.createDataFrame(_MORE, SCRUB_STREAM_SCHEMA).write.mode("append").parquet(
        landing
    )
    start_scrub_stream(spark, landing, sink, ckpt).awaitTermination(120)
    all_docs = spark.createDataFrame(_DOCS + _MORE, SCRUB_STREAM_SCHEMA)
    want_all = scrub_documents(all_docs, keep_text=False).select(*got.columns)
    assert _rows(spark.read.parquet(sink)) == _rows(want_all)


def test_streaming_plan_adds_no_exchange(spark, tmp_path):
    landing = str(tmp_path / "in")
    spark.createDataFrame(_DOCS, SCRUB_STREAM_SCHEMA).write.parquet(landing)
    stream = spark.readStream.schema(SCRUB_STREAM_SCHEMA).parquet(landing)
    scrubbed = scrub_documents(stream, keep_text=False)
    # stateless narrow map: the streaming logical plan has no
    # aggregation/exchange-inducing operator
    plan = scrubbed._jdf.queryExecution().logical().toString()
    assert "Aggregate" not in plan and "Repartition" not in plan
