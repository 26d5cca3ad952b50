"""Full merge-table BPE (operators.bpe): trainer vs hand-derived
merges, Catalyst fold-encoder vs an independent pure-Python reference
encoder, round-trip losslessness, id assignment, and the budget
contract with the packer."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.bpe import (
    Merge,
    bpe_encode,
    bpe_token_counts,
    corpus_alphabet,
    encode_fold,
    pretoken_counts,
    train_bpe,
    train_bpe_local,
    vocab_ids,
)


def ref_encode(tok: str, merges) -> list[str]:
    """Independent reference encoder: symbol LISTS, apply rules in
    rank order, leftmost-first non-overlapping — no delimited-string
    trick, so it cross-checks the replace() representation."""
    syms = list(tok)
    for m in merges:
        out = []
        for s in syms:
            if out and out[-1] == m.left and s == m.right:
                out[-1] = m.left + m.right
            else:
                out.append(s)
        syms = out
    return syms


def test_trainer_hand_corpus():
    # freqs: (a,b) in "abab"*3 -> pairs ab:6+? hand-derive:
    # vocab: abab x3, bab x2, cc x5
    vocab = [("abab", 3), ("bab", 2), ("cc", 5)]
    merges = train_bpe_local(vocab, num_merges=10, min_pair_freq=2)
    # pair counts r0: (a,b): 3*2 + 2*1 = 8; (b,a): 3+2=5; (c,c): 5
    assert (merges[0].left, merges[0].right, merges[0].pair_freq) == ("a", "b", 8)
    # after merge ab: abab->[ab,ab], bab->[b,ab], cc->[c,c]
    # r1: (ab,ab):3, (b,ab):2, (c,c):5 -> best (c,c)
    assert (merges[1].left, merges[1].right, merges[1].pair_freq) == ("c", "c", 5)
    # r2: (ab,ab):3 beats (b,ab):2
    assert (merges[2].left, merges[2].right) == ("ab", "ab")
    # r3: (b,ab):2 still mergeable
    assert (merges[3].left, merges[3].right) == ("b", "ab")
    # nothing left with freq >= 2
    assert len(merges) == 4


def test_trainer_tiebreak_lexicographic():
    # (a,b) and (b,a) both freq 2 -> (a,b) wins lexicographically
    merges = train_bpe_local([("ab", 2), ("ba", 2)], num_merges=1)
    assert (merges[0].left, merges[0].right) == ("a", "b")


def test_trainer_overlap_run_semantics():
    # "aaaa": leftmost-first non-overlap -> pairs (a,a) counted 3x
    merges = train_bpe_local([("aaaa", 1)], num_merges=2, min_pair_freq=2)
    assert (merges[0].left, merges[0].right, merges[0].pair_freq) == ("a", "a", 3)
    # after: [aa, aa] -> (aa,aa):1 < 2 -> stop
    assert len(merges) == 1


def test_trainer_drops_reserved_delims_by_default():
    """Reserved-delimiter word types are filtered, not fatal: training
    proceeds on the clean remainder (denial-of-training would be worse
    than losing a few markdown-table tokens)."""
    merges = train_bpe_local(
        [("a|b", 100), ("x\x01y", 50), ("cc", 5)], num_merges=2
    )
    assert [(m.left, m.right) for m in merges] == [("c", "c")]


def test_trainer_raise_mode_rejects_reserved_delims():
    with pytest.raises(ValueError, match="reserved delimiter"):
        train_bpe_local([("a|b", 1)], num_merges=1, on_reserved="raise")


def test_split_reserved_pretokens():
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.bpe import (
        split_reserved_pretokens,
    )

    clean, dropped = split_reserved_pretokens(
        [("ab", 3), ("a|b", 2), ("x\x01", 1)]
    )
    assert clean == [("ab", 3)]
    assert dropped == [("a|b", 2), ("x\x01", 1)]


def test_encode_reserved_delim_char_fallback(spark):
    """Pretokens the delimited-string fold cannot carry encode at
    character level — round-trip invariant holds, no silent
    wrong/empty symbols (the pre-guard bug: '|' -> ['',''])."""
    merges = train_bpe_local([("aab", 4)], num_merges=1, min_pair_freq=2)
    assert [(m.left, m.right) for m in merges] == [("a", "a")]
    toks = ["|", "a|b", "aab", "a\x01ab"]
    got = {
        r["tok"]: r["syms"]
        for r in spark.createDataFrame([(t,) for t in toks], "tok string")
        .select("tok", encode_fold(F.col("tok"), merges).alias("syms"))
        .collect()
    }
    assert got["|"] == ["|"]
    assert got["a|b"] == ["a", "|", "b"]
    assert got["a\x01ab"] == ["a", "\x01", "a", "b"]
    assert got["aab"] == ["aa", "b"]  # clean toks still fold-merge
    for t in toks:
        assert "".join(got[t]) == t


def naive_train(vocab, num_merges, min_pair_freq=2):
    """Independent naive trainer (full recount + scan per merge — the
    pre-r7 algorithm): the incremental-pair-count loop must produce
    the IDENTICAL merge table on any input."""
    words = [(list(t), int(f)) for t, f in vocab]
    merges = []
    for rank in range(num_merges):
        counts = {}
        for syms, f in words:
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_freq:
            break
        words = [
            (ref_merge_apply(s, l, r), f) for s, f in words
        ]
        merges.append((rank, l, r, l + r, c))
    return merges


def ref_merge_apply(syms, l, r):
    out = []
    for s in syms:
        if out and out[-1] == l and s == r:
            out[-1] = l + r
        else:
            out.append(s)
    return out


def test_incremental_trainer_equals_naive_random():
    """Randomized corpora (runs, ties, shared prefixes/suffixes) —
    incremental pair maintenance and the lazy-invalidation heap give
    byte-identical merge tables to the naive recount."""
    import random

    rng = random.Random(99)
    for trial in range(25):
        n_types = rng.randint(1, 40)
        vocab = []
        seen = set()
        for _ in range(n_types):
            t = "".join(
                rng.choice("aabbc d")  # skewed alphabet -> many ties/runs
                for _ in range(rng.randint(1, 12))
            ).replace(" ", "e")
            if t in seen:
                continue
            seen.add(t)
            vocab.append((t, rng.randint(1, 9)))
        nm = rng.randint(1, 30)
        mpf = rng.choice([1, 2, 3])
        got = [
            (m.rank, m.left, m.right, m.merged, m.pair_freq)
            for m in train_bpe_local(vocab, num_merges=nm, min_pair_freq=mpf)
        ]
        want = naive_train(vocab, nm, mpf)
        assert got == want, (trial, vocab, nm, mpf)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ate the rat"),
        (2, "a cat and a rat and a mat"),
        (3, ""),
        (4, "the the the cat cat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def trained(spark, docs):
    merges = train_bpe(docs, num_merges=16, min_pair_freq=2)
    alphabet = corpus_alphabet(docs)
    return merges, alphabet


def test_fold_encoder_matches_reference(spark, docs, trained):
    merges, _ = trained
    toks = [
        r["tok"]
        for r in pretoken_counts(docs).select("tok").distinct().collect()
    ]
    got = {
        r["tok"]: r["syms"]
        for r in spark.createDataFrame([(t,) for t in toks], "tok string")
        .select("tok", encode_fold(F.col("tok"), merges).alias("syms"))
        .collect()
    }
    for t in toks:
        assert got[t] == ref_encode(t, merges), t


def test_encode_round_trip(spark, docs, trained):
    """Concatenating each pretoken's emitted tokens reproduces the
    pretoken byte-for-byte — BPE is lossless."""
    merges, alphabet = trained
    enc = bpe_encode(docs, merges, alphabet)
    rebuilt = (
        enc.groupBy("doc_id", "tok_pos")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sym_pos", "token"))),
                    lambda s: s["token"],
                ),
            ).alias("tok")
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tok_pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("text")
        )
    )
    got = {r["doc_id"]: r["text"] for r in rebuilt.collect()}
    for r in docs.collect():
        assert got.get(r["doc_id"], "") == r["text"]


def test_token_ids_deterministic(spark, docs, trained):
    merges, alphabet = trained
    ids = vocab_ids(alphabet, merges)
    # base chars: 0..B-1 in sorted order
    for i, c in enumerate(alphabet):
        assert ids[c] == i
    # merges mint B+rank unless colliding (then keep smaller id)
    for m in merges:
        assert ids[m.merged] <= len(alphabet) + m.rank
    enc = bpe_encode(docs, merges, alphabet)
    for r in enc.collect():
        assert r["token_id"] == ids[r["token"]]
        assert r["token_id"] >= 0  # same-corpus encode has no OOV


def test_vocab_id_collision_min_wins():
    merges = [
        Merge(0, "a", "b", "ab", 9),
        Merge(1, "ab", "c", "abc", 5),
        Merge(2, "a", "bc", "abc", 3),  # same string, later rank
    ]
    ids = vocab_ids(["a", "b", "c"], merges)
    assert ids["abc"] == 3 + 1  # rank-1 id, not rank-2


def test_token_counts_and_pack_budget(spark, docs, trained):
    merges, _ = trained
    cnt = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert set(cnt) == {0, 1, 2, 3, 4}
    assert cnt[3] == 0  # empty doc packs as zero tokens
    # counts agree with the exploded stream
    enc_cnt = {
        r["doc_id"]: r["n"]
        for r in bpe_encode(docs, merges, corpus_alphabet(docs))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for d, n in enc_cnt.items():
        assert cnt[d] == n


def test_empty_merge_table_encodes_chars(spark, docs):
    alphabet = corpus_alphabet(docs)
    enc = bpe_encode(docs.filter("doc_id = 0"), [], alphabet)
    rows = sorted(
        (r["tok_pos"], r["sym_pos"], r["token"]) for r in enc.collect()
    )
    # with no merges every token is a single character
    assert all(len(t) == 1 for _, _, t in rows)


def test_train_bpe_local_rejects_unknown_on_reserved():
    """A typo like on_reserved="error" must not silently mean "drop"."""
    import pytest as _pytest

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.bpe import (
        train_bpe_local,
    )

    with _pytest.raises(ValueError, match="on_reserved"):
        train_bpe_local([("ab", 3)], num_merges=1, on_reserved="error")
