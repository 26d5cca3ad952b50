"""Naive-Bayes classifier (operators.classifier): learns real
class-conditional token distributions above a pinned accuracy floor
under a leakage-safe split, matches an independent pure-Python NB on
predictions, and handles smoothing/OOV/tie determinism."""

import math
import random

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
    nb_classify,
    nb_model,
)

# two genuinely different token distributions
_SPAM = ["buy", "free", "click", "offer", "winner", "cash", "now", "deal"]
_HAM = ["meeting", "report", "quarter", "review", "schedule", "team", "notes", "plan"]
_COMMON = ["the", "a", "and", "to", "of"]


def _corpus():
    rng = random.Random(13)
    rows = []
    for i in range(300):
        label = "spam" if i % 2 == 0 else "ham"
        themed = _SPAM if label == "spam" else _HAM
        # 70% themed, 30% common words -> strong but not trivial signal
        words = [
            rng.choice(themed if rng.random() < 0.7 else _COMMON)
            for _ in range(rng.randint(15, 40))
        ]
        rows.append((i, label, " ".join(words)))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_corpus(), "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def split(corpus):
    # leakage-safe: disjoint by doc id, deterministic
    train = corpus.filter(F.col("doc_id") % 5 != 0)
    test = corpus.filter(F.col("doc_id") % 5 == 0)
    return train, test


def test_accuracy_above_floor(split):
    train, test = split
    out = nb_classify(train, test).collect()
    assert len(out) == test.count()
    acc = sum(r["is_correct"] for r in out) / len(out)
    assert acc >= 0.95, f"accuracy {acc} below pinned floor"


def test_split_is_leakage_safe(split):
    train, test = split
    train_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    test_ids = {r["doc_id"] for r in test.select("doc_id").collect()}
    assert not (train_ids & test_ids)


def py_nb(train_rows, test_rows, alpha=0.5):
    """Independent reference NB (floats, no rounding) — predictions
    must agree with the DECIMAL DataFrame pipeline on a corpus with
    clear margins."""
    tok = lambda t: [w for w in t.lower().split() if w]
    cwk, ck, nk, vocab = {}, {}, {}, set()
    for _, k, t in train_rows:
        nk[k] = nk.get(k, 0) + 1
        for w in tok(t):
            cwk[(w, k)] = cwk.get((w, k), 0) + 1
            ck[k] = ck.get(k, 0) + 1
            vocab.add(w)
    n, v = sum(nk.values()), len(vocab)
    preds = {}
    for i, k_true, t in test_rows:
        best = None
        for k in sorted(nk):
            s = math.log(nk[k] / n)
            for w in tok(t):
                if w in vocab:
                    s += math.log((cwk.get((w, k), 0) + alpha) / (ck[k] + alpha * v))
                else:
                    s += math.log(alpha / (ck[k] + alpha * v))
            if best is None or s > best[0] + 1e-9:
                best = (s, k)
        preds[i] = best[1]
    return preds


def test_matches_reference_implementation(split):
    train, test = split
    got = {r["doc_id"]: r["pred_lang"] for r in nb_classify(train, test).collect()}
    rows = _corpus()
    train_rows = [r for r in rows if r[0] % 5 != 0]
    test_rows = [r for r in rows if r[0] % 5 == 0]
    want = py_nb(train_rows, test_rows)
    assert got == want


def test_oov_and_smoothing_defined(spark):
    train = spark.createDataFrame(
        [(0, "a", "cat cat dog"), (1, "b", "fish fish bird")],
        "doc_id long, lang string, text string",
    )
    test = spark.createDataFrame(
        [(10, "a", "cat unicorn unicorn")],  # OOV-heavy doc still scores
        "doc_id long, lang string, text string",
    )
    out = nb_classify(train, test).collect()
    assert len(out) == 1 and out[0]["pred_lang"] == "a"
    dense, per_class = nb_model(train)
    # dense covers full vocab x classes incl. zero-count combos
    assert dense.count() == 4 * 2
    assert per_class.count() == 2


def test_broadcast_and_join_paths_identical(split):
    """Routing is physical only: the forced-broadcast and the plain
    shuffle equi-join model paths return identical rows (r6 verdict:
    the hard-coded F.broadcast(dense) OOMs at real vocab; the flag
    must not change answers)."""
    train, test = split
    rows_b = sorted(
        map(tuple, nb_classify(train, test, broadcast_model=True).collect())
    )
    rows_j = sorted(
        map(tuple, nb_classify(train, test, broadcast_model=False).collect())
    )
    assert rows_b == rows_j


def test_auto_routing_thresholds(split):
    """broadcast_model=None picks by estimated |vocab|×|classes|: a
    tiny cap forces the equi-join path, a huge cap the broadcast path
    — both still correct (same rows as the forced paths)."""
    train, test = split
    want = sorted(
        map(tuple, nb_classify(train, test, broadcast_model=True).collect())
    )
    got_small = sorted(
        map(
            tuple,
            nb_classify(train, test, broadcast_max_model_rows=1).collect(),
        )
    )
    got_large = sorted(
        map(
            tuple,
            nb_classify(
                train, test, broadcast_max_model_rows=10**9
            ).collect(),
        )
    )
    assert got_small == want
    assert got_large == want


def test_model_layout_update_equals_rebuild(spark, split, tmp_path):
    """Persisted sufficient statistics are exactly additive: saving
    half the labeled corpus then folding in the other half equals
    rebuilding from the union, bit for bit — and classifying from the
    loaded tables equals classifying from raw train."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        load_nb_model,
        save_nb_model,
        update_nb_model,
    )

    train, test = split
    h1 = train.filter(F.col("doc_id") % 2 == 0)
    h2 = train.filter(F.col("doc_id") % 2 == 1)
    pa, pb = str(tmp_path / "nb_inc"), str(tmp_path / "nb_full")
    save_nb_model(h1, pa)
    update_nb_model(h2, pa)
    save_nb_model(train, pb)
    cwk_a, cls_a = load_nb_model(spark, pa)
    cwk_b, cls_b = load_nb_model(spark, pb)
    assert sorted(map(tuple, cwk_a.collect())) == sorted(
        map(tuple, cwk_b.collect())
    )
    assert sorted(map(tuple, cls_a.collect())) == sorted(
        map(tuple, cls_b.collect())
    )
    got = sorted(
        map(
            tuple,
            nb_classify(None, test, model_tables=(cwk_a, cls_a)).collect(),
        )
    )
    want = sorted(map(tuple, nb_classify(train, test).collect()))
    assert got == want


def test_classify_needs_train_or_tables(split):
    _, test = split
    with pytest.raises(ValueError, match="train or model_tables"):
        nb_classify(None, test)


def test_tie_breaks_by_class_name(spark):
    # perfectly symmetric classes -> identical scores -> 'a' wins
    train = spark.createDataFrame(
        [(0, "b", "x y"), (1, "a", "x y")],
        "doc_id long, lang string, text string",
    )
    test = spark.createDataFrame(
        [(10, "a", "x y")], "doc_id long, lang string, text string"
    )
    out = nb_classify(train, test).collect()
    assert out[0]["pred_lang"] == "a"


def test_ovr_auc_hand_derived_with_ties(spark):
    """AUC from first principles on a 6-row class: scores
    pos=[0.9, 0.5], neg=[0.1, 0.5, 0.5, 0.2]. Ascending midranks:
    0.1->1, 0.2->2, 0.5 three-way tie -> (3+4+5)/3 = 4, 0.9->6.
    pos rank sum = 6 + 4 = 10; AUC = (10 - 2*3/2) / (2*4) = 0.875
    (one clean win pair x4, plus two half-credit tie pairs over 8)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        ovr_auc,
    )

    rows = [
        (1, "a", "a", 0.9),
        (2, "a", "a", 0.5),
        (3, "b", "a", 0.1),
        (4, "b", "a", 0.5),
        (5, "b", "a", 0.5),
        (6, "b", "a", 0.2),
    ]
    scores = spark.createDataFrame(
        rows, "doc_id long, lang string, k string, score double"
    )
    got = ovr_auc(scores).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["class"], r["n_pos"], r["n_neg"], r["auc"]) == ("a", 2, 4, 0.875)


def test_ovr_auc_perfect_and_degenerate_classes(spark):
    """A perfectly-separating class scores 1.0; a class with no
    positives (or no negatives) is dropped — AUC undefined."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        ovr_auc,
    )

    rows = (
        [(i, "a", "a", 1.0 + i) for i in range(3)]
        + [(10 + i, "b", "a", 0.1 * i) for i in range(3)]
        + [(20 + i, "b", "zz", 0.5) for i in range(3)]  # no positives for zz
    )
    scores = spark.createDataFrame(
        rows, "doc_id long, lang string, k string, score double"
    )
    got = {r["class"]: r["auc"] for r in ovr_auc(scores).collect()}
    assert got == {"a": 1.0}


def test_threshold_at_precision_hand_derived(spark):
    """Class 'a': scores desc pos=1.0, neg=0.8, pos=0.6, pos=0.5,
    neg=0.4. Cumulative precision: 1/1, 1/2, 2/3, 3/4, 3/5. At floor
    0.75 the qualifying thresholds are 1.0 (1.0) and 0.5 (0.75);
    lowest = 0.5 → precision 0.75, recall 3/3 = 1.0, n_kept 4."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        threshold_at_precision,
    )

    rows = [
        (1, "a", "a", 1.0),
        (2, "b", "a", 0.8),
        (3, "a", "a", 0.6),
        (4, "a", "a", 0.5),
        (5, "b", "a", 0.4),
    ]
    scores = spark.createDataFrame(
        rows, "doc_id long, lang string, k string, score double"
    )
    got = threshold_at_precision(scores, 0.75).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["class"], r["threshold"], r["precision"], r["recall"], r["n_kept"]) == (
        "a", 0.5, 0.75, 1.0, 4,
    )


def test_threshold_ties_share_cumulatives_and_impossible_class_dropped(spark):
    """A tie at the candidate threshold admits the WHOLE tie group
    (RANGE frame): pos=0.9, then neg=0.5 and pos=0.5 tied — at t=0.5
    precision is 2/3, not 2/2. With floor 0.7 only t=0.9 qualifies.
    Class 'z' (all negatives) is dropped."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        threshold_at_precision,
    )

    rows = [
        (1, "a", "a", 0.9),
        (2, "b", "a", 0.5),
        (3, "a", "a", 0.5),
        (10, "b", "z", 0.7),
        (11, "b", "z", 0.2),
    ]
    scores = spark.createDataFrame(
        rows, "doc_id long, lang string, k string, score double"
    )
    got = {r["class"]: r for r in threshold_at_precision(scores, 0.7).collect()}
    assert set(got) == {"a"}
    assert got["a"]["threshold"] == 0.9 and got["a"]["n_kept"] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_precision"):
        threshold_at_precision(scores, 0.0)
