"""operators/hybrid: lexical TF-IDF ranking and RRF fusion semantics
(the end-to-end numbers are oracle-checked in the registry; these pin
the operator-level contracts)."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
    doc_terms,
    lexical_topk,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "spark shuffle partition join"),
            (1, "spark shuffle window"),
            (2, "completely unrelated words here"),
            (3, "join join join spark"),  # repeated terms: binary tf
        ],
        "doc_id long, text string",
    )


def test_doc_terms_distinct_and_nonempty(spark, corpus):
    got = doc_terms(corpus).collect()
    d3 = sorted(r["term"] for r in got if r["id"] == 3)
    assert d3 == ["join", "spark"]  # distinct terms, repeats collapsed
    assert all(r["term"] for r in got)


def test_lexical_topk_prefers_rarer_terms(spark, corpus):
    q = spark.createDataFrame(
        [(100, "shuffle join")], "query_id long, text string"
    )
    got = {
        r["doc_id"]: r["lex_rank"]
        for r in lexical_topk(q, corpus, k=4, df_cap=None).collect()
    }
    # doc 2 shares no term: absent entirely
    assert 2 not in got
    # doc 0 matches both terms → outranks single-term docs 1 and 3
    assert got[0] == 1
    assert set(got) == {0, 1, 3}


def test_rrf_fusion_missing_list_contributes_zero(spark):
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, lex_rank int"
    )
    vec = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, doc_id long, vec_rank int"
    )
    got = {
        r["doc_id"]: (r["lex_rank"], r["vec_rank"], r["fused"], r["rank"])
        for r in rrf_fuse(lex, vec, k=3).collect()
    }
    # doc 11 is in both lists → highest fused score
    assert got[11][3] == 1
    assert got[11][2] == pytest.approx(1 / 62 + 1 / 61)
    # single-list docs carry a null rank on the missing side and only
    # that side's contribution
    assert got[10][1] is None and got[10][2] == pytest.approx(1 / 61)
    assert got[12][0] is None and got[12][2] == pytest.approx(1 / 62)
    # lex rank 1 (1/61) beats vec rank 2 (1/62); tie impossible here
    assert got[10][3] == 2 and got[12][3] == 3


def test_bm25_length_normalization_and_tf(spark):
    """BM25 semantics the boolean-tf path can't express: (a) repeated
    terms raise the score sub-linearly, (b) between two docs with the
    same tf, the shorter one scores higher."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark spark spark"),                  # high tf, short
            (1, "spark"),                              # tf 1, shortest
            (2, "spark " + "filler " * 20),            # tf 1, long
            (3, "unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(9, "spark")], "query_id long, text string")
    got = {
        r["doc_id"]: (float(r["bm25_score"]), r["bm25_rank"])
        for r in bm25_topk(q, docs, k=4, df_cap=None).collect()
    }
    assert 3 not in got  # no shared term
    assert got[0][0] > got[1][0] > got[2][0]  # tf up, length penalized
    # sub-linear tf saturation: tripling tf far from triples the score
    assert got[0][0] < 3 * got[1][0]


def test_df_cap_drops_stopword_and_bounds_join(spark):
    """Skewed corpus: one term in EVERY doc. With the default cap the
    stopword contributes nothing (and, because the query×idf join runs
    before the postings join, its hot key never reaches the corpus);
    uncapped it would pair the query with all 60 docs."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
        bm25_topk,
        lexical_topk,
    )

    docs = spark.createDataFrame(
        [(i, f"the unique{i}") for i in range(60)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "the")], "query_id long, text string")

    for fn, score_col in ((lexical_topk, "lex_score"), (bm25_topk, "bm25_score")):
        capped = fn(q, docs, k=100).collect()
        assert capped == [], f"{fn.__name__}: stopword must be dropped"
        uncapped = fn(q, docs, k=100, df_cap=None).collect()
        assert len(uncapped) == 60, f"{fn.__name__}: uncapped joins all docs"

    # a query mixing stopword + rare term still ranks by the rare term
    q2 = spark.createDataFrame(
        [(1, "the unique7")], "query_id long, text string"
    )
    got = lexical_topk(q2, docs, k=5).collect()
    assert [r["doc_id"] for r in got] == [7]


def test_df_cap_absolute_count(spark):
    """df_cap > 1 is an absolute document count, not a ratio."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
        lexical_topk,
    )

    docs = spark.createDataFrame(
        [(0, "shared a"), (1, "shared b"), (2, "shared c"), (3, "solo d")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "shared")], "query_id long, text string")
    assert lexical_topk(q, docs, k=10, df_cap=2).collect() == []  # df=3 > 2
    assert len(lexical_topk(q, docs, k=10, df_cap=3).collect()) == 3


def test_prf_expansion_terms_hand_computed(spark):
    """Feedback docs nominate NEW terms only, weighted by summed idf
    across the feedback docs containing them."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
        prf_expansion_terms,
    )

    # query hits docs 0,1 (share "query"); "extra" appears in BOTH
    # feedback docs, "rare" in one; "query" is excluded (in the query)
    docs = spark.createDataFrame(
        [
            (0, "query extra rare"),
            (1, "query extra"),
            (2, "unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "query")], "query_id long, text string")
    out = prf_expansion_terms(q, docs, fb_docs=2, fb_terms=2, df_cap=None)
    rows = {r.term: (float(r.weight), r.rn) for r in out.collect()}
    assert set(rows) == {"extra", "rare"}
    # weights: extra = 2 * idf(df=2) = 2*ln(4/3); rare = idf(df=1) = ln(2)
    import math

    assert rows["extra"][0] == pytest.approx(2 * round(math.log(4 / 3), 6), abs=1e-9)
    assert rows["rare"][0] == pytest.approx(round(math.log(2), 6), abs=1e-9)
    # ln(2) > 2*ln(4/3): the rarer term outranks the more recurrent one
    assert rows["rare"][1] == 1 and rows["extra"][1] == 2


def test_prf_expanded_retrieval_lifts_vocabulary_mismatch(spark):
    """A doc sharing NO term with the query becomes reachable through
    expansion terms mined from the feedback docs."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
        lexical_topk,
        lexical_topk_prf,
    )

    docs = spark.createDataFrame(
        [
            (0, "query bridge"),
            (1, "bridge target"),
            (2, "noise one"),
            (3, "noise two"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "query")], "query_id long, text string")
    plain = {r.doc_id for r in lexical_topk(q, docs, k=10, df_cap=None).collect()}
    assert 1 not in plain  # vocabulary mismatch: doc 1 unreachable
    exp = {
        r.doc_id
        for r in lexical_topk_prf(
            q, docs, k=10, fb_docs=1, fb_terms=1, df_cap=None
        ).collect()
    }
    assert 1 in exp  # "bridge" mined from feedback doc 0 reaches it


def test_prf_rejects_bad_params(spark):
    import pytest

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.hybrid import (
        prf_expansion_terms,
    )

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    q = spark.createDataFrame([(0, "a")], "query_id long, text string")
    with pytest.raises(ValueError, match="fb_docs/fb_terms"):
        prf_expansion_terms(q, docs, fb_docs=0)
