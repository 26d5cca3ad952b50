"""Curation-stage operators: decontamination, bigram LM scoring,
sequence packing, BPE-ish token counting."""

import math

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
    bpe_token_count,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
    eval_overlap,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
    bigram_nll_scores,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------- eval_overlap ----------


def test_eval_overlap_flags_shared_ngrams(spark):
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 3-grams with eval
            (2, "totally different words here now"),
            (3, "alpha beta gamma something else"),  # shares one 3-gram
        ],
    )
    evalset = _docs(spark, [(100, "alpha beta gamma delta zeta")])
    out = {
        r.doc_id: r.n_overlapping_ngrams
        for r in eval_overlap(corpus, evalset, n=3).collect()
    }
    # doc 1 shares "alpha beta gamma" and "beta gamma delta"; doc 3 one
    assert out == {1: 2, 3: 1}


def test_eval_overlap_clean_corpus_empty(spark):
    corpus = _docs(spark, [(1, "nothing in common at all")])
    evalset = _docs(spark, [(2, "held out benchmark question text")])
    assert eval_overlap(corpus, evalset, n=3).count() == 0


def test_eval_overlap_counts_distinct_not_occurrences(spark):
    # shingle repeated inside one corpus doc counts once
    corpus = _docs(spark, [(1, "a b c x a b c y a b c")])
    evalset = _docs(spark, [(9, "a b c")])
    rows = eval_overlap(corpus, evalset, n=3).collect()
    assert len(rows) == 1 and rows[0].n_overlapping_ngrams == 1


def test_eval_overlap_shuffle_join_path_matches_broadcast(spark):
    corpus = _docs(
        spark, [(i, f"w{i} common phrase here w{i + 1}") for i in range(20)]
    )
    evalset = _docs(spark, [(99, "common phrase here")])
    a = sorted(
        eval_overlap(corpus, evalset, n=3, broadcast_eval=True).collect()
    )
    b = sorted(
        eval_overlap(corpus, evalset, n=3, broadcast_eval=False).collect()
    )
    assert a == b and len(a) == 20


def test_eval_overlap_rejects_bad_n(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="n must be positive"):
        eval_overlap(d, d, n=0)


# ---------- bigram LM ----------


def test_bigram_nll_hand_computed(spark):
    # corpus: one doc "a b a b"; bigrams: ab, ba, ab
    # c(a,b)=2 c(b,a)=1; history c(a)=2 c(b)=1; V=2; alpha=0.5
    # P(b|a) = 2.5/3 ; P(a|b) = 1.5/2
    docs = _docs(spark, [(1, "a b a b")])
    row = bigram_nll_scores(docs).collect()[0]
    exp = [
        round(-math.log(2.5 / 3.0), 6),
        round(-math.log(1.5 / 2.0), 6),
        round(-math.log(2.5 / 3.0), 6),
    ]
    assert row.n_bigrams == 3
    assert row.sum_nll == pytest.approx(sum(exp), abs=1e-9)
    assert row.avg_nll == pytest.approx(round(sum(exp) / 3, 6), abs=1e-9)


def test_bigram_nll_short_docs_score_null(spark):
    docs = _docs(spark, [(1, "single"), (2, ""), (3, "two tokens")])
    out = {r.doc_id: r for r in bigram_nll_scores(docs).collect()}
    assert out[1].n_bigrams == 0 and out[1].sum_nll is None
    assert out[2].n_bigrams == 0
    assert out[3].n_bigrams == 1 and out[3].sum_nll is not None


def test_bigram_nll_heldout_model_unseen_fallback(spark):
    # model corpus never saw "q r": falls back to alpha-smoothed
    # uniform over the MODEL vocab: P = 0.5 / (0 + 0.5 * V), V=3
    model = _docs(spark, [(10, "a b c")])
    scored = _docs(spark, [(1, "q r")])
    row = bigram_nll_scores(scored, model=model).collect()[0]
    assert row.n_bigrams == 1
    assert row.sum_nll == pytest.approx(round(-math.log(0.5 / 1.5), 6), abs=1e-9)


def test_bigram_nll_model_vs_self_scoring_differ(spark):
    boiler = [(i, "the same line again and again") for i in range(5)]
    fresh = [(100, "completely novel unusual wording")]
    corpus = _docs(spark, boiler + fresh)
    out = {r.doc_id: r.avg_nll for r in bigram_nll_scores(corpus).collect()}
    # boilerplate bigrams are high-probability -> low nll; novel doc high
    assert out[0] < out[100]


def test_bigram_nll_rejects_bad_alpha(spark):
    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="alpha must be positive"):
        bigram_nll_scores(d, alpha=0.0)


# ---------- sequence packing ----------


def _sizes(spark, sizes, shards=1):
    rows = [(i, s) for i, s in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_next_fit_semantics(spark):
    # budget 10, sizes in id order: 4,5,3,9,2 -> seqs [0,0,1,2,3? ]
    # 4+5=9 fits; +3 overflows -> seq1 fill3; +9 overflows -> seq2 fill9;
    # +2 overflows -> seq3
    df = _sizes(spark, [4, 5, 3, 9, 2])
    out = {
        r.doc_id: (r.seq, r.offset)
        for r in pack_sequences(df, budget=10, shards=1).collect()
    }
    assert out == {0: (0, 0), 1: (0, 4), 2: (1, 0), 3: (2, 0), 4: (3, 0)}


def test_pack_oversized_doc_gets_own_sequence(spark):
    df = _sizes(spark, [3, 25, 3])
    out = {
        r.doc_id: r.seq for r in pack_sequences(df, budget=10, shards=1).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2}


def test_pack_sharding_partitions_by_id_mod(spark):
    df = _sizes(spark, [1] * 10)
    out = pack_sequences(df, budget=100, shards=3).collect()
    for r in out:
        assert r.shard == r.doc_id % 3
    # within shard 0: ids 0,3,6,9 pack into one seq at offsets 0..3
    s0 = sorted((r.doc_id, r.offset) for r in out if r.shard == 0)
    assert s0 == [(0, 0), (3, 1), (6, 2), (9, 3)]


def test_pack_null_sizes_excluded_negative_raises(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None)], "doc_id long, n_tokens long"
    )
    assert pack_sequences(df, budget=10, shards=1).count() == 1
    bad = spark.createDataFrame([(1, -2)], "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="negative size"):
        pack_sequences(bad, budget=10, shards=1).collect()


def test_pack_rejects_bad_params(spark):
    df = _sizes(spark, [1])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError, match="shards"):
        pack_sequences(df, shards=0)


def test_packing_stats_fill_rate(spark):
    df = _sizes(spark, [4, 5, 3])  # seq0: 4+5=9, seq1: 3
    stats = packing_stats(
        pack_sequences(df, budget=10, shards=1), budget=10
    ).collect()[0]
    assert stats.n_docs == 3 and stats.n_seqs == 2
    assert stats.total_tokens == 12
    assert stats.fill_rate == pytest.approx(12 / 20.0, abs=1e-9)


# ---------- training-shard export ----------


def test_training_shards_one_file_ordered_with_manifest(spark, tmp_path):
    import glob
    import json
    import os

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
        read_training_shard,
        write_training_shards,
    )

    rows = [(i, (i * 7) % 30 + 1, f"text-{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, text string")
    packed = pack_sequences(df, budget=64, shards=4).join(
        df.select("doc_id", "text"), "doc_id"
    )
    path = str(tmp_path / "shards")
    write_training_shards(packed, path, budget=64)

    # one parquet file per shard dir
    for s in range(4):
        files = glob.glob(os.path.join(path, f"shard={s}", "*.parquet"))
        assert len(files) == 1, f"shard {s}: {files}"
    manifest = json.load(open(os.path.join(path, "_manifest.json")))
    assert manifest["budget"] == 64 and manifest["n_shards"] == 4
    assert sum(m["n_docs"] for m in manifest["shards"].values()) == 50

    # readback of a shard is in exact (seq, offset) training order and
    # matches the packer's assignment for that shard
    got = read_training_shard(spark, path, 2).collect()
    keys = [(r.seq, r.offset) for r in got]
    assert keys == sorted(keys)
    assert {r.doc_id for r in got} == {i for i, _, _ in rows if i % 4 == 2}


def test_read_training_shard_refuses_uncommitted_layout(spark, tmp_path):
    import os

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
        read_training_shard,
        write_training_shards,
    )

    df = spark.createDataFrame([(1, 5, "t")], "doc_id long, n_tokens long, text string")
    packed = pack_sequences(df, budget=10, shards=1).join(
        df.select("doc_id", "text"), "doc_id"
    )
    path = str(tmp_path / "torn_shards")
    write_training_shards(packed, path, budget=10)
    os.remove(os.path.join(path, "_manifest.json"))
    with pytest.raises(RuntimeError, match="did not commit"):
        read_training_shard(spark, path, 0)


# ---------- persisted LM model layout ----------


def test_lm_layout_probe_equals_rebuild(spark, tmp_path):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
        load_bigram_model,
        save_bigram_model,
    )

    docs = _docs(spark, [(i, f"w{i % 3} x{i % 5} common tail words") for i in range(20)])
    path = str(tmp_path / "lm")
    save_bigram_model(docs, path)
    stored = sorted(
        bigram_nll_scores(
            docs, model_tables=load_bigram_model(spark, path)
        ).collect()
    )
    rebuilt = sorted(bigram_nll_scores(docs).collect())
    assert stored == rebuilt


def test_lm_layout_update_equals_rebuild_from_union(spark, tmp_path):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
        load_bigram_model,
        save_bigram_model,
        update_bigram_model,
    )

    first = _docs(spark, [(i, f"alpha beta w{i % 4} gamma") for i in range(10)])
    second = _docs(spark, [(i, f"beta delta w{i % 3} zeta") for i in range(10, 18)])
    inc = str(tmp_path / "inc")
    save_bigram_model(first, inc)
    update_bigram_model(second, inc)
    full = str(tmp_path / "full")
    save_bigram_model(first.unionByName(second), full)

    c12_i, c1_i, v_i = load_bigram_model(spark, inc)
    c12_f, c1_f, v_f = load_bigram_model(spark, full)
    assert sorted(c12_i.collect()) == sorted(c12_f.collect())
    assert sorted(c1_i.collect()) == sorted(c1_f.collect())
    assert v_i.collect() == v_f.collect()


def test_lm_layout_torn_swap_detected(spark, tmp_path):
    import json
    import os

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
        load_bigram_model,
        save_bigram_model,
    )

    path = str(tmp_path / "torn")
    save_bigram_model(_docs(spark, [(1, "a b c")]), path)
    with open(os.path.join(path, "_swap_inprogress.json"), "w") as f:
        json.dump({"partitions": ["c12", "vocab"]}, f)
    with pytest.raises(RuntimeError, match="torn"):
        load_bigram_model(spark, path)


def test_lm_rejects_model_and_tables_together(spark, tmp_path):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
        load_bigram_model,
        save_bigram_model,
    )

    docs = _docs(spark, [(1, "a b c")])
    path = str(tmp_path / "both")
    save_bigram_model(docs, path)
    with pytest.raises(ValueError, match="not both"):
        bigram_nll_scores(
            docs, model=docs, model_tables=load_bigram_model(spark, path)
        )


# ---------- plan contracts ----------


def test_eval_overlap_broadcasts_eval_side(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.plans.inspect import (
        broadcast_join_count,
    )

    corpus = _docs(spark, [(1, "a b c d e")])
    evalset = _docs(spark, [(2, "c d e f g")])
    out = eval_overlap(corpus, evalset, n=3, broadcast_eval=True)
    # the probe is a broadcast join: the corpus shingles never
    # shuffle on the shingle key
    assert broadcast_join_count(out) >= 1


def test_bigram_nll_model_tables_broadcast(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.plans.inspect import (
        broadcast_join_count,
    )

    docs = _docs(spark, [(1, "a b c"), (2, "b c d")])
    out = bigram_nll_scores(docs)
    # c12, c1, and the 1-row vocab all ride broadcast joins — the
    # scored corpus streams through without a model-join shuffle
    assert broadcast_join_count(out) >= 3


# ---------- BPE-ish token count ----------


def test_bpe_token_count_vs_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "I can't stop, won't stop!"), (2, "plain words only"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.n
        for r in df.select("doc_id", bpe_token_count("text").alias("n")).collect()
    }
    # "I"," can","'t"," stop",","," won","'t"," stop","!" = 9
    assert out[1] == 9
    assert out[2] == 3
    assert out[3] == 0


# ---------------- PII redaction ----------------


def test_redact_pii_classes_and_shielding(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.textstats import (
        pii_counts,
        redact_pii,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "write to jane.doe+x@example.co.uk or call +1 555-123 4567 now"),
        (2, "server at 10.0.0.1 and card 4111 1111-1111 1111 leaked"),
        (3, "no pii here, just text with numbers 42 and 3.14"),
        (4, "a@b.io b@c.io 192.168.0.255"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    counts = pii_counts("text")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii("text").alias("red"),
            *[c.alias(k) for k, c in counts.items()],
        ).collect()
    }
    assert out[1]["red"] == "write to <EMAIL> or call <PHONE> now"
    assert (out[1]["email"], out[1]["phone"]) == (1, 1)
    assert out[2]["red"] == "server at <IP> and card <CARD> leaked"
    assert (out[2]["ip"], out[2]["card"], out[2]["phone"]) == (1, 1, 0)
    # untouched text passes through byte-identical, all counts zero
    assert out[3]["red"] == rows[2][1]
    assert all(out[3][k] == 0 for k in ("email", "ip", "card", "phone"))
    assert out[4]["red"] == "<EMAIL> <EMAIL> <IP>"
    assert (out[4]["email"], out[4]["ip"]) == (2, 1)


def test_redact_pii_email_digits_never_rematch_as_phone(spark):
    """Shielding order: an email whose local part is 10 digits must
    become <EMAIL>, not a half-eaten <PHONE> inside an address."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.textstats import (
        redact_pii,
    )

    df = spark.createDataFrame([("5551234567@txt.example.com x",)], "text string")
    assert df.select(redact_pii("text").alias("r")).first()["r"] == "<EMAIL> x"
