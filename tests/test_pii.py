"""PII scrub operator tests (operators.pii)."""

from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pii import (
    PII_PATTERNS,
    pii_scrub,
    scrub_documents,
)

SAMPLES = [
    # (id, text, expected scrubbed, expected n_pii)
    (0, "mail me at jane.doe+x@sub.example.co.uk today", "mail me at [EMAIL] today", 1),
    (1, "ssn 123-45-6789 on file", "ssn [SSN] on file", 1),
    (2, "card 4111-1111-1111-1234 or 4111 1111 1111 1234", "card [CARD] or [CARD]", 2),
    (3, "call 415-555-0134 or 415.555.0134", "call [PHONE] or [PHONE]", 2),
    (4, "host 192.168.0.1 down", "host [IPV4] down", 1),
    (5, "no identifiers here at all", "no identifiers here at all", 0),
    # version strings with 3 dots DO match the ipv4 shape (documented
    # over-capture: \d{1,3} quads); 2-dot versions must not
    (6, "semver 1.2.3 stays", "semver 1.2.3 stays", 0),
    (7, "a@b.io and 10.0.0.7 and 123-45-6789", "[EMAIL] and [IPV4] and [SSN]", 3),
    # round-11 broadened formats (ADVICE r10): contiguous card,
    # parenthesized + space-separated phones, space-separated SSN
    (8, "card 4111111111111111 swiped", "card [CARD] swiped", 1),
    (9, "call (415) 555-0134 or (415)555-0134", "call [PHONE] or [PHONE]", 2),
    (10, "call 415 555 0134 back", "call [PHONE] back", 1),
    (11, "ssn 123 45 6789 on file", "ssn [SSN] on file", 1),
    # 17+-digit runs are NOT cards (trailing \b), bare 9/10-digit runs
    # are NOT ssn/phone (separator required)
    (12, "ref 41111111111111112 and 4155550134 and 123456789", "ref 41111111111111112 and 4155550134 and 123456789", 0),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _, _ in SAMPLES], "doc_id long, text string"
    )


def test_scrub_and_counts(spark):
    out = {
        r["doc_id"]: r
        for r in scrub_documents(_df(spark)).orderBy("doc_id").collect()
    }
    for i, _, want, n in SAMPLES:
        assert out[i]["text_scrubbed"] == want, i
        assert out[i]["n_pii"] == n, i


def test_shielded_counts_match_scrub_emissions(spark):
    # adversarial: a phone-shaped email local part must count as ONE
    # email and ZERO phones — counts equal the placeholders emitted
    df = spark.createDataFrame(
        [
            (0, "reach me at 123-456-7890@example.com now"),
            (1, "10.0.0.7@sub.example.com pinged"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_documents(df).collect()}
    assert rows[0]["n_email"] == 1 and rows[0]["n_phone"] == 0
    assert rows[0]["text_scrubbed"] == "reach me at [EMAIL] now"
    assert rows[1]["n_email"] == 1 and rows[1]["n_ipv4"] == 0
    assert rows[1]["text_scrubbed"] == "[EMAIL] pinged"
    for r in rows.values():
        emitted = sum(r["text_scrubbed"].count(t) for _, _, t in PII_PATTERNS)
        assert r["n_pii"] == emitted


def test_idempotent(spark):
    once = _df(spark).select("doc_id", pii_scrub("text").alias("text"))
    twice = once.select("doc_id", pii_scrub("text").alias("text"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_tokens_never_match_patterns(spark):
    # replacement tokens are fixed points: a frame of bare tokens has
    # zero matches in every category (the idempotence precondition)
    toks = spark.createDataFrame(
        [(i, t) for i, (_, _, t) in enumerate(PII_PATTERNS)],
        "doc_id long, text string",
    )
    assert scrub_documents(toks).agg(F.sum("n_pii")).collect()[0][0] == 0


def test_keep_text_false_drops_raw(spark):
    cols = scrub_documents(_df(spark), keep_text=False).columns
    assert "text" not in cols and "text_scrubbed" in cols


def test_no_shuffle_in_plan(spark):
    # scrub is a narrow map: no Exchange anywhere in the plan
    plan = scrub_documents(_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
