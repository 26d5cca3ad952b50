"""Robots Exclusion Protocol (RFC 9309) — parse + longest-match gate.

Scope contract from ``functions/robots.py``: exact-or-star agent
groups (exact shadows star), ``*``/``$`` pattern matching with
most-octets-wins and allow-on-tie, pre-group rules ignored,
empty-pattern rules dropped, no-rules hosts allowed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
    parse_robots_rules,
    robots_verdicts,
    url_target,
)

BODY = """# policy file
User-Agent: SparkBot
Disallow: /docs/
Allow: /docs/pub/

User-agent: *
User-agent: other-bot
Disallow: /private/
Disallow: /*.json$
Allow: /private/open*
Disallow:
Crawl-delay: 10
"""


@pytest.fixture(scope="module")
def rules(spark):
    pages = spark.createDataFrame(
        [
            ("a.com", BODY),
            ("blocked.com", "Disallow: /stray\nUser-agent: *\nDisallow: /"),
            ("norules.com", "# empty\nSitemap: https://x/s.xml"),
        ],
        "host string, body string",
    )
    return parse_robots_rules(pages)


def test_parse_groups_and_drops(rules):
    got = {
        (r["host"], r["agent"], r["rule"], r["pattern"])
        for r in rules.collect()
    }
    assert got == {
        # exact group, mixed-case field and agent lowercased
        ("a.com", "sparkbot", "disallow", "/docs/"),
        ("a.com", "sparkbot", "allow", "/docs/pub/"),
        # stacked user-agent lines share one group's rules
        ("a.com", "*", "disallow", "/private/"),
        ("a.com", "*", "disallow", "/*.json$"),
        ("a.com", "*", "allow", "/private/open*"),
        ("a.com", "other-bot", "disallow", "/private/"),
        ("a.com", "other-bot", "disallow", "/*.json$"),
        ("a.com", "other-bot", "allow", "/private/open*"),
        # the pre-group stray rule is gone; the real group remains
        ("blocked.com", "*", "disallow", "/"),
    }
    # empty Disallow dropped, Crawl-delay/Sitemap ignored, norules.com empty
    assert rules.filter(F.col("host") == "norules.com").count() == 0


def _verdicts(spark, rules, urls, agent):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = robots_verdicts(df, rules, agent=agent)
    return {
        r["url"]: (r["allowed"], r["matched_rule"], r["matched_pattern"])
        for r in out.collect()
    }


def test_exact_agent_shadows_star(spark, rules):
    v = _verdicts(
        spark,
        rules,
        [
            "https://a.com/docs/x",  # exact group: blocked
            "https://a.com/docs/pub/x",  # longer allow wins
            "https://a.com/private/x",  # star rule does NOT bind sparkbot
        ],
        "SparkBot",
    )
    assert v["https://a.com/docs/x"] == (0, "disallow", "/docs/")
    assert v["https://a.com/docs/pub/x"] == (1, "allow", "/docs/pub/")
    assert v["https://a.com/private/x"] == (1, None, None)


def test_star_group_wildcards_and_anchor(spark, rules):
    v = _verdicts(
        spark,
        rules,
        [
            "https://a.com/private/x",
            "https://a.com/private/open-data",  # allow /private/open* (len 14)
            "https://a.com/d/f.json",  # anchored wildcard
            "https://a.com/d/f.json5",  # anchor must NOT match
            "https://a.com/",  # no rule -> allowed
        ],
        "fetchbot",
    )
    assert v["https://a.com/private/x"] == (0, "disallow", "/private/")
    assert v["https://a.com/private/open-data"] == (
        1,
        "allow",
        "/private/open*",
    )
    assert v["https://a.com/d/f.json"] == (0, "disallow", "/*.json$")
    assert v["https://a.com/d/f.json5"] == (1, None, None)
    assert v["https://a.com/"] == (1, None, None)


def test_default_allow_and_block_all(spark, rules):
    v = _verdicts(
        spark,
        rules,
        ["https://norules.com/any", "https://blocked.com/any"],
        "sparkbot",
    )
    assert v["https://norules.com/any"] == (1, None, None)
    assert v["https://blocked.com/any"] == (0, "disallow", "/")


def test_allow_wins_length_tie(spark):
    pages = spark.createDataFrame(
        [("t.com", "User-agent: *\nDisallow: /ab\nAllow: /ab")],
        "host string, body string",
    )
    v = _verdicts(
        spark, parse_robots_rules(pages), ["https://t.com/abc"], "x"
    )
    assert v["https://t.com/abc"] == (1, "allow", "/ab")


def test_url_target_shapes(spark):
    df = spark.createDataFrame(
        [
            ("https://h.com/a/b?q=1#frag",),
            ("https://h.com",),
            ("https://h.com?q=1",),
        ],
        "url string",
    )
    got = [r["t"] for r in df.select(url_target("url").alias("t")).collect()]
    assert got == ["/a/b?q=1", "/", "/?q=1"]


def test_regex_specials_in_patterns_stay_literal(spark):
    pages = spark.createDataFrame(
        [("t.com", "User-agent: *\nDisallow: /a(b)+c.d")],
        "host string, body string",
    )
    v = _verdicts(
        spark,
        parse_robots_rules(pages),
        ["https://t.com/a(b)+c.d/e", "https://t.com/abbc.d"],
        "x",
    )
    assert v["https://t.com/a(b)+c.d/e"][0] == 0
    assert v["https://t.com/abbc.d"][0] == 1


def test_crawl_delays(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        robots_crawl_delays,
    )

    pages = spark.createDataFrame(
        [
            # exact group's delay shadows the '*' one
            (
                "a.com",
                "User-agent: SparkBot\nCrawl-delay: 2\n\n"
                "User-agent: *\nCrawl-delay: 10",
            ),
            # invalid dropped, max of valid wins
            ("b.com", "User-agent: *\nCrawl-delay: x\nCrawl-delay: 0.5\nCrawl-delay: 0.25"),
            # no delay -> absent
            ("c.com", "User-agent: *\nDisallow: /"),
        ],
        "host string, body string",
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in robots_crawl_delays(pages, agent="sparkbot").collect()
    }
    assert got == {"a.com": 2.0, "b.com": 0.5}


def test_group_assembly_ignores_uninterpreted_lines(spark):
    """A group whose only non-UA line is a Crawl-delay must NOT merge
    with the following group (r12 review regression): agent a's group
    has no rules, so the '*' disallow does not bind it."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        robots_crawl_delays,
    )

    pages = spark.createDataFrame(
        [("m.com", "User-agent: a\nCrawl-delay: 1\n\nUser-agent: *\nDisallow: /")],
        "host string, body string",
    )
    rules = parse_robots_rules(pages)
    got = {
        (r["agent"], r["rule"], r["pattern"]) for r in rules.collect()
    }
    assert got == {("a", None, None), ("*", "disallow", "/")}
    v = _verdicts(spark, rules, ["https://m.com/x"], "a")
    assert v["https://m.com/x"] == (1, None, None)
    v = _verdicts(spark, rules, ["https://m.com/x"], "b")
    assert v["https://m.com/x"] == (0, "disallow", "/")
    # mirror for delays: a's group has no delay; the '*' delay must
    # not leak to it through group merging either
    pages2 = spark.createDataFrame(
        [("m.com", "User-agent: a\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 10")],
        "host string, body string",
    )
    assert robots_crawl_delays(pages2, agent="a").count() == 0
    got2 = {
        r["host"]: r["crawl_delay"]
        for r in robots_crawl_delays(pages2, agent="other").collect()
    }
    assert got2 == {"m.com": 10.0}


def test_empty_exact_group_shadows_star(spark):
    """An exact-agent group with NO rules still shadows '*': the agent
    gets allow-all, not the '*' rules (r12 review regression). Note
    the empty group must be DELIMITED (here: trailing at EOF) — per
    RFC 9309 blank lines have no meaning, so UA lines separated only
    by blanks stack into one group (covered below)."""
    pages = spark.createDataFrame(
        [("e.com", "User-agent: *\nDisallow: /\n\nUser-agent: mybot\n")],
        "host string, body string",
    )
    rules = parse_robots_rules(pages)
    v = _verdicts(spark, rules, ["https://e.com/anything"], "mybot")
    assert v["https://e.com/anything"] == (1, None, None)
    v = _verdicts(spark, rules, ["https://e.com/anything"], "otherbot")
    assert v["https://e.com/anything"] == (0, "disallow", "/")


def test_ua_lines_stack_across_blank_lines(spark):
    """RFC 9309: blank lines carry no meaning — UA lines separated
    only by blanks head ONE group, so its rules bind both agents."""
    pages = spark.createDataFrame(
        [("s.com", "User-agent: mybot\n\nUser-agent: *\nDisallow: /")],
        "host string, body string",
    )
    rules = parse_robots_rules(pages)
    for agent in ("mybot", "anyone"):
        v = _verdicts(spark, rules, ["https://s.com/x"], agent)
        assert v["https://s.com/x"] == (0, "disallow", "/")


def test_longest_match_counts_octets_not_characters(spark):
    """RFC 9309 §2.2.2 precedence is most OCTETS: '/café' (5 chars,
    6 UTF-8 octets) must beat '/caf*' (5 chars, 5 octets) — a
    character count would call this a tie and hand the verdict to
    allow-wins-tie."""
    pages = spark.createDataFrame(
        [("t.com", "User-agent: *\nDisallow: /café\nAllow: /caf*")],
        "host string, body string",
    )
    v = _verdicts(
        spark, parse_robots_rules(pages), ["https://t.com/café"], "x"
    )
    assert v["https://t.com/café"] == (0, "disallow", "/café")


def test_verdicts_scratch_column_collision_raises(spark, rules):
    df = spark.createDataFrame([("https://a.com/x", 1)], "url string, _rs int")
    with pytest.raises(ValueError, match="_rs"):
        robots_verdicts(df, rules, agent="x")


def test_url_target_strips_newline_fragment(spark):
    df = spark.createDataFrame([("https://h.com/a#f\nrag",)], "url string")
    assert df.select(url_target("url").alias("t")).first()["t"] == "/a"


def test_fetch_schedule_waves_and_default_delay(spark):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        fetch_schedule,
    )

    frontier = spark.createDataFrame(
        [(u,) for u in [
            "https://s.com/a", "https://s.com/b", "https://s.com/c",
            "https://nodelay.com/x", "https://nodelay.com/y",
        ]],
        "url string",
    )
    delays = spark.createDataFrame([("s.com", 2.5)], "host string, crawl_delay double")
    got = {
        r["url"]: (r["wave"], r["fetch_at"])
        for r in fetch_schedule(frontier, delays, default_delay=1.0).collect()
    }
    assert got == {
        "https://s.com/a": (0, 0.0),
        "https://s.com/b": (1, 2.5),
        "https://s.com/c": (2, 5.0),
        "https://nodelay.com/x": (0, 0.0),
        "https://nodelay.com/y": (1, 1.0),
    }
    with pytest.raises(ValueError, match="crawl_delay"):
        fetch_schedule(frontier, frontier)


def test_fetch_schedule_priority_duplicate_keys_and_collision(spark):
    """A priority table with duplicate url rows must not multiply
    frontier rows through the join (duplicate (url, wave) schedule
    entries = double fetches) — per-url MAX wins, the delays table's
    defense (r14 advice). A frontier already carrying a 'priority'
    column raises instead of silently ranking on the wrong one."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        fetch_schedule,
    )

    frontier = spark.createDataFrame(
        [("https://p.com/a",), ("https://p.com/b",)], "url string"
    )
    delays = spark.createDataFrame([], "host string, crawl_delay double")
    prio = spark.createDataFrame(
        [("https://p.com/a", 0.2), ("https://p.com/a", 0.7), ("https://p.com/b", 0.5)],
        "url string, priority double",
    )
    rows = fetch_schedule(frontier, delays, priority=prio).collect()
    got = {r["url"]: (r["priority"], r["wave"]) for r in rows}
    assert len(rows) == 2  # no row multiplication
    # /a's max(0.2, 0.7) beats /b's 0.5: /a is wave 0
    assert got == {"https://p.com/a": (0.7, 0), "https://p.com/b": (0.5, 1)}

    clashing = frontier.withColumn("priority", F.lit(1.0))
    with pytest.raises(ValueError, match="priority"):
        fetch_schedule(clashing, delays, priority=prio)


def test_seed_to_schedule_composition(spark):
    """The crawl front end composes end to end on the seed side:
    sitemap discovery -> robots gate -> frontier anti-join (already
    crawled pages drop) -> politeness schedule. The surviving seeds
    are exactly the fetchable set, waved per host."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        fetch_schedule,
        robots_crawl_delays,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.sitemap import (
        sitemap_seed_table,
    )

    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /private/\nCrawl-delay: 3\n"
                "Sitemap: https://a.com/sitemap.xml\n",
            )
        ],
        "host string, body string",
    )
    bodies = spark.createDataFrame(
        [
            (
                "https://a.com/sitemap.xml",
                "<urlset>"
                "<url><loc>https://a.com/p/1</loc></url>"
                "<url><loc>https://a.com/p/2</loc></url>"
                "<url><loc>https://a.com/p/3</loc></url>"
                "<url><loc>https://a.com/private/x</loc></url>"
                "</urlset>",
            )
        ],
        "url string, body string",
    )
    seeds = sitemap_seed_table(
        robots, bodies, robots_rules=parse_robots_rules(robots), agent="bot"
    )
    # p/2 was already crawled: it's in the frontier
    frontier = spark.createDataFrame(
        [("https://a.com/p/2", "a.com")], "canonical_url string, host string"
    )
    fetchable = seeds.join(
        frontier.select(F.col("canonical_url").alias("url")), "url", "left_anti"
    )
    sched = fetch_schedule(
        fetchable.select("url"), robots_crawl_delays(robots, agent="bot")
    )
    got = {r["url"]: (r["wave"], r["fetch_at"]) for r in sched.collect()}
    # private/x robots-gated, p/2 frontier-deduped; p/1 and p/3 waved
    assert got == {
        "https://a.com/p/1": (0, 0.0),
        "https://a.com/p/3": (1, 3.0),
    }


def _all_verdicts(fn, spark, rules, urls, agent):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = fn(df, rules, agent=agent)
    return sorted(
        (r["url"], r["allowed"], r["matched_rule"], r["matched_pattern"])
        for r in out.collect()
    )


def test_kernel_verdicts_match_expression_path(spark, rules):
    """The Arrow-kernel matcher is bit-identical to the expression
    path across the whole fixture grid: exact-agent shadowing,
    wildcards, anchors, length races, allow-on-tie, octet precedence,
    rule-free hosts, unknown hosts."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        robots_verdicts_kernel,
    )

    urls = [
        "https://a.com/docs/x",
        "https://a.com/docs/pub/x",
        "https://a.com/private/x",
        "https://a.com/private/open-data",
        "https://a.com/d/f.json",
        "https://a.com/d/f.json5",
        "https://a.com/",
        "https://blocked.com/any",
        "https://norules.com/any",
        "https://unknown-host.com/q?x=1#frag",
    ]
    for agent in ("SparkBot", "fetchbot"):
        expr = _all_verdicts(robots_verdicts, spark, rules, urls, agent)
        kern = _all_verdicts(robots_verdicts_kernel, spark, rules, urls, agent)
        assert kern == expr, f"agent={agent}"


def test_kernel_parity_fuzz_many_rules_per_host(spark):
    """Parity on a dense synthetic host (60 rules, interleaved
    allow/disallow, wildcards and anchors at many lengths) — the
    rule-set shape the kernel exists for."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        robots_verdicts_kernel,
    )

    lines = ["User-agent: *"]
    for i in range(20):
        lines.append(f"Disallow: /p{i}/")
        lines.append(f"Allow: /p{i}/pub")
        lines.append(f"Disallow: /*.t{i}$")
    pages = spark.createDataFrame(
        [("dense.com", "\n".join(lines))], "host string, body string"
    )
    rr = parse_robots_rules(pages)
    urls = (
        [f"https://dense.com/p{i}/x" for i in range(20)]
        + [f"https://dense.com/p{i}/pubx" for i in range(20)]
        + [f"https://dense.com/f.t{i}" for i in range(20)]
        + ["https://dense.com/clean"]
    )
    expr = _all_verdicts(robots_verdicts, spark, rr, urls, "anybot")
    kern = _all_verdicts(robots_verdicts_kernel, spark, rr, urls, "anybot")
    assert kern == expr
    # sanity: the fixture actually bites
    assert sum(1 for _, a, _, _ in expr if a == 0) == 40


def test_auto_dispatch_picks_by_max_density(spark, rules, monkeypatch):
    """robots_verdicts_auto routes sparse tables to the expression
    path and dense ones to the kernel, and both give the contract
    output either way."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions import robots as R

    picked = []
    real_expr, real_kern = R.robots_verdicts, R.robots_verdicts_kernel
    monkeypatch.setattr(
        R, "robots_verdicts", lambda *a, **k: picked.append("expr") or real_expr(*a, **k)
    )
    monkeypatch.setattr(
        R,
        "robots_verdicts_kernel",
        lambda *a, **k: picked.append("kernel") or real_kern(*a, **k),
    )
    urls = spark.createDataFrame([("https://a.com/docs/x",)], "url string")
    out = R.robots_verdicts_auto(urls, rules, agent="sparkbot")
    assert out.first()["allowed"] == 0  # sparse fixture, real verdict
    dense = spark.createDataFrame(
        [
            ("dense.com", "\n".join(["User-agent: *"] + [f"Disallow: /p{i}/" for i in range(20)]))
        ],
        "host string, body string",
    )
    out2 = R.robots_verdicts_auto(
        spark.createDataFrame([("https://dense.com/p3/x",)], "url string"),
        parse_robots_rules(dense),
        agent="any",
    )
    assert out2.first()["allowed"] == 0
    assert picked == ["expr", "kernel"]


def test_robots_gate_parity_and_one_time_prepare(spark, rules):
    """RobotsGate (the stream's prepared applier, r13 advice): same
    dispatch rule and bit-identical verdicts as the one-shot paths,
    with the density probe / collect / broadcast done ONCE at
    construction and reused by every apply."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        KERNEL_RULES_PER_HOST,
        RobotsGate,
        robots_verdicts,
        robots_verdicts_kernel,
    )

    urls = [
        "https://a.com/docs/x",
        "https://a.com/private/open-data",
        "https://blocked.com/any",
        "https://unknown-host.com/q?x=1#frag",
        None,
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")

    # sparse fixture -> expression path
    gate = RobotsGate(rules, agent="SparkBot")
    assert not gate.use_kernel
    assert gate.max_rules_per_host < KERNEL_RULES_PER_HOST
    snap = lambda frame: sorted(repr(tuple(r)) for r in frame.collect())
    assert snap(gate(df)) == snap(robots_verdicts(df, rules, agent="SparkBot"))

    # dense fixture -> kernel path, verdicts identical to both one-shots
    dense = parse_robots_rules(
        spark.createDataFrame(
            [("dense.com", "\n".join(["User-agent: *"] + [f"Disallow: /p{i}/" for i in range(20)]))],
            "host string, body string",
        )
    )
    durls = spark.createDataFrame(
        [(f"https://dense.com/p{i}/x",) for i in range(20)] + [("https://dense.com/ok",)],
        "url string",
    )
    kgate = RobotsGate(dense, agent="any")
    assert kgate.use_kernel
    got = snap(kgate(durls))
    assert got == snap(robots_verdicts_kernel(durls, dense, agent="any"))
    assert got == snap(robots_verdicts(durls, dense, agent="any"))


def test_kernel_null_url_parity(spark, rules):
    """A null URL row: both paths emit allowed=1 with null matched_*
    (r13 review — the kernel previously crashed on rx.match(None))."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        robots_verdicts_kernel,
    )

    df = spark.createDataFrame(
        [("https://a.com/docs/x",), (None,)], "url string"
    )
    for fn in (robots_verdicts, robots_verdicts_kernel):
        got = {
            r["url"]: (r["allowed"], r["matched_rule"])
            for r in fn(df, rules, agent="sparkbot").collect()
        }
        assert got[None] == (1, None), fn.__name__
        assert got["https://a.com/docs/x"] == (0, "disallow"), fn.__name__
