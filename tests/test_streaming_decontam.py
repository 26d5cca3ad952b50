"""Streaming decontamination: stream == batch parity, partition
routing (clean ∪ flagged == input), replay idempotence."""

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
    eval_overlap,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.decontam import (
    build_eval_shingle_table,
    decontam_batch,
    start_decontam_stream,
)

SCHEMA = "doc_id long, text string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_decontam_batch_routes_and_counts(spark, tmp_path):
    evalset = _docs(spark, [(100, "held out benchmark question text", "ev")])
    path = str(tmp_path / "ev_sh")
    build_eval_shingle_table(evalset, path, n=3)
    ev = spark.read.parquet(path)

    batch = _docs(
        spark,
        [
            (1, "contains the held out benchmark question text inline", "s"),
            (2, "totally unrelated content here", "s"),
        ],
    )
    clean, flagged = decontam_batch(batch, ev, n=3)
    assert [r.doc_id for r in clean.collect()] == [2]
    f = flagged.collect()
    assert len(f) == 1 and f[0].doc_id == 1
    assert f[0].n_overlapping_ngrams >= 1
    # clean ∪ flagged == input
    assert clean.count() + flagged.count() == batch.count()


def test_decontam_stream_matches_batch_operator(spark, tmp_path):
    evalset = _docs(
        spark,
        [
            (900, "alpha beta gamma delta epsilon zeta", "ev"),
            (901, "one two three four five six", "ev"),
        ],
    )
    ev_path = str(tmp_path / "ev")
    build_eval_shingle_table(evalset, ev_path, n=4)

    docs1 = [
        (1, "alpha beta gamma delta something", "a"),  # contaminated
        (2, "clean words with no overlap at all", "a"),
    ]
    docs2 = [
        (3, "prefix one two three four five suffix", "b"),  # contaminated
        (4, "another clean unrelated document", "b"),
    ]

    landing = tmp_path / "dc_landing"
    landing.mkdir()
    clean_sink = str(tmp_path / "dc_clean")
    flagged_sink = str(tmp_path / "dc_flagged")
    ckpt = str(tmp_path / "dc_ckpt")

    def drop(docs, name):
        _docs(spark, docs).write.parquet(str(landing / name))

    def drain():
        q = start_decontam_stream(
            spark, str(landing) + "/*", ev_path, clean_sink, flagged_sink,
            ckpt, n=4,
        )
        q.awaitTermination(120)

    drop(docs1, "b1")
    drain()
    drop(docs2, "b2")
    drain()

    flagged = {
        (r.doc_id, r.n_overlapping_ngrams)
        for r in spark.read.parquet(flagged_sink).collect()
    }
    offline = {
        (r.doc_id, r.n_overlapping_ngrams)
        for r in eval_overlap(
            _docs(spark, docs1 + docs2), evalset, n=4
        ).collect()
    }
    assert flagged == offline and flagged
    clean_ids = {r.doc_id for r in spark.read.parquet(clean_sink).collect()}
    assert clean_ids == {2, 4}

    # re-drain with no new files: checkpoint replay adds nothing
    drain()
    assert {
        (r.doc_id, r.n_overlapping_ngrams)
        for r in spark.read.parquet(flagged_sink).collect()
    } == offline
    assert {r.doc_id for r in spark.read.parquet(clean_sink).collect()} == {2, 4}


def test_decontam_stream_probe_is_broadcast(spark, tmp_path):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.plans.inspect import (
        broadcast_join_count,
    )

    evalset = _docs(spark, [(9, "a b c d", "ev")])
    path = str(tmp_path / "ev_b")
    build_eval_shingle_table(evalset, path, n=3)
    ev = spark.read.parquet(path)
    batch = _docs(spark, [(1, "a b c d e", "s")])
    _, flagged = decontam_batch(batch, ev, n=3)
    assert broadcast_join_count(flagged) >= 1
