"""Streaming common-line boilerplate scrub (streaming/boilerplate.py):
the blocklist grows with the corpus, scrubbing is as-of-arrival, and
crash replays converge."""

import shutil

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.boilerplate import (
    line_blocklist,
    read_line_occurrences,
    read_scrubbed,
    start_boilerplate_stream,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _drain(spark, tmp_path, min_count=3):
    q = start_boilerplate_stream(
        spark,
        str(tmp_path / "landing"),
        f"{tmp_path}/out",
        f"{tmp_path}/counts",
        f"{tmp_path}/ckpt",
        min_count=min_count,
    )
    q.awaitTermination(120)


def test_blocklist_grows_and_scrub_is_as_of_arrival(spark, tmp_path):
    # batch 1: BANNER appears in 3 of 3 docs -> crosses K=3 WITHIN the
    # batch, so even the first batch is scrubbed; CRUMB appears twice
    _docs(
        spark,
        [
            (0, "BANNER\nalpha zero"),
            (1, "BANNER\nCRUMB\nalpha one"),
            (2, "BANNER\nCRUMB\nalpha two"),
        ],
    ).write.parquet(f"{tmp_path}/landing")
    _drain(spark, tmp_path)
    got = {
        r["doc_id"]: r["text"] for r in read_scrubbed(spark, f"{tmp_path}/out").collect()
    }
    assert got == {0: "alpha zero", 1: "CRUMB\nalpha one", 2: "CRUMB\nalpha two"}

    # batch 2: one more CRUMB pushes it to 3 -> scrubbed from batch 2
    # docs, but batch 1's outputs stay as written (as-of-arrival)
    _docs(spark, [(3, "CRUMB\nbeta three")]).write.mode("append").parquet(
        f"{tmp_path}/landing"
    )
    _drain(spark, tmp_path)
    got = {
        r["doc_id"]: r["text"] for r in read_scrubbed(spark, f"{tmp_path}/out").collect()
    }
    assert got[3] == "beta three"
    assert got[1] == "CRUMB\nalpha one"  # history untouched
    bl = {
        r["line"]: r["n_docs"]
        for r in line_blocklist(
            read_line_occurrences(spark, f"{tmp_path}/counts"), 3
        ).collect()
    }
    assert bl == {"BANNER": 3, "CRUMB": 3}

    # crash replay: lose the checkpoint, re-drain everything. The
    # replay RE-BATCHES both landing files into one batch whose dir
    # overlaps the old ones — occurrence rows are idempotent by key,
    # so the DISTINCT state converges (additive count partials would
    # double-count here; that is why the state is (line, doc_id) rows)
    before = sorted(
        set(map(tuple, read_line_occurrences(spark, f"{tmp_path}/counts").collect()))
    )
    shutil.rmtree(f"{tmp_path}/ckpt")
    _drain(spark, tmp_path)
    assert sorted(
        set(map(tuple, read_line_occurrences(spark, f"{tmp_path}/counts").collect()))
    ) == before
    bl2 = {
        r["line"]: r["n_docs"]
        for r in line_blocklist(
            read_line_occurrences(spark, f"{tmp_path}/counts"), 3
        ).collect()
    }
    assert bl2 == {"BANNER": 3, "CRUMB": 3}
    rows2 = read_scrubbed(spark, f"{tmp_path}/out").collect()
    got2 = {r["doc_id"]: r["text"] for r in rows2}
    # NOTE: a full replay may re-batch both files into ONE batch, in
    # which case doc 1/2's CRUMB is scrubbed under the bigger combined
    # blocklist — as-of-arrival semantics over the REPLAYED arrival
    # order. The invariants: every doc present exactly once, BANNER
    # gone everywhere, audit counts consistent.
    # exactly-once as ROWS, not just as dict keys: the re-batched
    # replay leaves doc 3 in both the old batch_id=1 dir and the
    # rewritten batch_id=0 dir — read_scrubbed must dedup (r14 advice)
    assert len(rows2) == 4
    assert set(got2) == {0, 1, 2, 3}
    assert all("BANNER" not in t for t in got2.values())
    audits = {
        r["doc_id"]: (r["n_lines_before"], r["n_lines_after"])
        for r in read_scrubbed(spark, f"{tmp_path}/out").collect()
    }
    original_lines = {0: 2, 1: 3, 2: 3, 3: 2}
    for did, (b, a) in audits.items():
        assert b == original_lines[did]
        assert a == (len(got2[did].split("\n")) if got2[did] else 0)


def test_line_occurrence_takedown(spark, tmp_path):
    """Forgetting a doc purges its (line, doc_id) rows and the
    blocklist shrinks when a line drops below K — counts reflect only
    retained documents; idempotent."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.takedown import (
        layout_hooks,
    )

    _docs(
        spark,
        [
            (0, "BANNER\nalpha"),
            (1, "BANNER\nbeta"),
            (2, "BANNER\ngamma"),
        ],
    ).write.parquet(f"{tmp_path}/landing")
    _drain(spark, tmp_path)
    cdir = f"{tmp_path}/counts"
    assert {
        r["line"] for r in line_blocklist(read_line_occurrences(spark, cdir), 3).collect()
    } == {"BANNER"}
    hooks = dict(layout_hooks(line_occurrence_dir=cdir))
    req = spark.createDataFrame([(2,)], "doc_id long")
    res = hooks["boilerplate_line_occurrences"](spark, req)
    assert res["n_deleted"] == 2  # BANNER + gamma rows for doc 2
    assert line_blocklist(read_line_occurrences(spark, cdir), 3).count() == 0
    # idempotent
    assert hooks["boilerplate_line_occurrences"](spark, req)["n_deleted"] == 0
