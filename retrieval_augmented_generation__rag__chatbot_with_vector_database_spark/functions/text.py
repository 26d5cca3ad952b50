"""Scalar text functions (SURVEY.md §2h) — all pure SQL expressions.

Reference counterparts:
- chunk id       ``scripts/ingest_documents.py:93-105`` (F1)
- context line   ``app/rag/retriever.py:75-95``        (F2)
- history rewrite ``app/rag/chain.py:144-151``          (F3)
- truncation     ``app/rag/chain.py:113-120``           (F4/P3)

Plus the text-analysis primitives a training-data pipeline needs
(token counting, quality features) — these stay JVM-side (regexp /
length / split), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def chunk_id(chunk_index: Column | str, text: Column | str) -> Column:
    """``f"doc_{index}_{md5(text).hexdigest()[:8]}"`` — content-addressed,
    idempotent under re-ingestion (scripts/ingest_documents.py:93-105)."""
    return F.concat(
        F.lit("doc_"),
        _c(chunk_index).cast("string"),
        F.lit("_"),
        F.substring(F.md5(_c(text).cast("binary")), 1, 8),
    )


def truncate_ellipsis(text: Column | str, n: int = 200) -> Column:
    """``text[:n] + "..."`` (app/rag/chain.py:115). Note the reference
    appends "..." unconditionally; we preserve that exactly."""
    return F.concat(F.substring(_c(text), 1, n), F.lit("..."))


def format_context_line(
    rank: Column | str,
    source: Column | str,
    score: Column | str,
    text: Column | str,
) -> Column:
    """One retrieved-doc context block
    (``app/rag/retriever.py:86-93``):
    ``[Document {i}] (Source: {source}, Relevance: {score:.3f})\\n{text}\\n``
    """
    return F.format_string(
        "[Document %d] (Source: %s, Relevance: %.3f)\n%s\n",
        _c(rank).cast("int"),
        _c(source),
        _c(score).cast("double"),
        _c(text),
    )


SYSTEM_PROMPT_PREFIX = """You are a helpful financial assistant that answers questions based on provided context.

Your responsibilities:
1. Answer questions accurately using ONLY the information from the provided context
2. If the context doesn't contain enough information, say so clearly
3. Cite the document sources when relevant
4. Provide clear, concise, and professional responses
5. Focus on financial accuracy and clarity

Context:
"""  # exact text: app/rag/chain.py:47-58


def format_prompt(context: Column | str, question: Column | str) -> Column:
    """F5: the reference's ChatPromptTemplate rendered as data
    (``app/rag/chain.py:47-60``): a struct of the system message
    (template with ``{context}`` interpolated) and the human message
    (``{question}``). The LLM call itself stays ⊘ (network boundary);
    this closes the deterministic string-assembly half of §2h."""
    return F.struct(
        F.concat(F.lit(SYSTEM_PROMPT_PREFIX), _c(context)).alias("system"),
        _c(question).alias("human"),
    )


def rewrite_with_history(question: Column | str, history: Column | str) -> Column:
    """History-contextualized question (``app/rag/chain.py:144-151``).

    ``history`` is ``array<struct<question:string, answer:string>>``;
    only the last 3 pairs are used; empty history passes the question
    through unchanged. The rewritten string is what gets embedded —
    retrieval intentionally reflects conversation context.
    """
    q, h = _c(question), _c(history)
    last3 = F.slice(h, F.greatest(F.size(h) - F.lit(2), F.lit(1)), 3)
    joined = F.array_join(
        F.transform(
            last3,
            lambda p: F.concat(F.lit("Q: "), p["question"], F.lit("\nA: "), p["answer"]),
        ),
        "\n",
    )
    rewritten = F.concat(
        F.lit("Previous conversation:\n"), joined, F.lit("\n\nCurrent question: "), q
    )
    return F.when((h.isNull()) | (F.size(h) == 0), q).otherwise(rewritten)


def token_count(text: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


# GPT-2-style pre-tokenizer pattern, simplified to the lookahead-free
# subset shared by Java regex (Spark) and RE2 (DuckDB): contraction
# suffixes, space-prefixed letter runs, space-prefixed digit runs,
# space-prefixed punctuation runs, residual whitespace. The real GPT-2
# pattern's `\s+(?!\S)` needs negative lookahead (absent from RE2);
# dropping it only re-buckets multi-space runs, which a token COUNT
# barely sees. Counting matches of this pattern tracks BPE token
# counts far better than whitespace splitting (punctuation and
# contractions become their own tokens), with zero tokenizer model.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column | str) -> Column:
    """Pre-tokenizer match count under :data:`BPE_ISH_PATTERN` — the
    cheap SQL-only estimator for "how many BPE tokens is this doc"
    (sequence-budget planning, token-level corpus accounting). A real
    subword vocab refines each pre-token into >= 1 tokens, so this is
    a lower bound with the right shape; it stays JVM-side codegen."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Cheap quality-scoring features for corpus filtering:
    length, token count, mean token length, punctuation ratio,
    digit ratio, uppercase ratio, stopword ratio (English function
    words). All codegen'd SQL — run them over 100 TB without Python.
    """
    t = _c(text)
    n = F.length(t)
    toks = token_count(t)
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))

    def _ratio(pattern: str) -> Column:
        # pattern removes everything EXCEPT the class of interest, so
        # the remaining length is the class count
        kept = F.length(F.regexp_replace(t, pattern, ""))
        return F.when(nonspace > 0, kept / nonspace).otherwise(F.lit(0.0))

    stop = (
        r"(?i)\b(the|a|an|and|or|of|to|in|is|are|was|were|it|that|this|for|on|with|as|at|by|be)\b"
    )
    stop_hits = (
        F.size(F.split(F.concat(F.lit(" "), t, F.lit(" ")), stop)) - 1
    )
    return {
        "n_chars": n,
        "n_tokens": toks,
        "mean_token_len": F.when(toks > 0, nonspace / toks).otherwise(F.lit(0.0)),
        "punct_ratio": _ratio(r"[^\p{Punct}]"),
        "digit_ratio": _ratio(r"[^0-9]"),
        "upper_ratio": _ratio(r"[^A-Z]"),
        "stopword_ratio": F.when(toks > 0, stop_hits / toks).otherwise(F.lit(0.0)),
    }


#: HTML → text strip steps, ordered; every pattern is valid and
#: equivalent in BOTH Java (Spark) and RE2 (DuckDB) — flags are
#: inline ((?is)), no lookaround/backrefs — so the oracle replays the
#: identical automaton (the ``operators.pii.PII_PATTERNS`` discipline).
#: Scope: the tag/entity strip a WARC ingest needs (boilerplate
#: removal — readability-style main-content extraction — is a
#: downstream curation concern, not this primitive's).
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    # non-content containers go first, with their contents
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # every remaining tag becomes a separator (never concatenates
    # adjacent text nodes)
    (r"(?is)<[a-z!/][^>]*>", " "),
    # minimal entity decode (the high-frequency named set + nbsp)
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),  # last: &amp;lt; must NOT become <
    # collapse whitespace
    (r"\s+", " "),
]


def html_to_text(html: Column | str) -> Column:
    """Visible text of an HTML payload as ONE codegen'd
    regexp_replace fold (no Python in the hot path — at 100 TB the
    WARC→text stage is scan-bandwidth-bound like the PII scrub)."""
    out = _c(html)
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_strip_sql(expr: str) -> str:
    """The DuckDB twin of :func:`html_to_text` over a SQL expression,
    generated from the same step list."""
    for pat, rep in HTML_STRIP_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"


# ---------------------------------------------------------------------------
# Boilerplate-aware main-content extraction (jusText/trafilatura-style
# link-density gating, expressed as a shared-constant expression tree
# so the DuckDB oracle replays the identical automaton).
#
# Method: after removing script/style/comments, the page is segmented
# into BLOCKS at block-level tag boundaries; each block's visible text
# and anchor-text length are measured, and a block survives iff it has
# at least MIN_BLOCK_CHARS visible characters AND its link density
# (anchor chars / visible chars) is at most MAX_LINK_DENSITY. Nav
# bars, sidebars, breadcrumbs, and footer link farms are ~all-anchor
# (density ~1.0) and die; prose paragraphs with occasional links
# survive. This is the public jusText recipe's core gate (its stopword
# density refinement is language-bound and out of scope). Scope: a
# heuristic — short link-free boilerplate ("All rights reserved")
# below MIN_BLOCK_CHARS drops, longer link-free boilerplate survives.

#: tags that terminate a text block (jusText's segmentation set)
_BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|caption"
    "|section|article|header|footer|nav|aside|main|figure|figcaption"
    "|blockquote|pre|form|fieldset|select|option|br|hr|title"
)
BLOCK_TAG_PATTERN = rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>"
#: anchor inner HTML (group 1); \b keeps <abbr>/<article> out
ANCHOR_PATTERN = r"(?is)<a\b[^>]*>(.*?)</a>"
#: U+001E RECORD SEPARATOR — never appears in real page text
BLOCK_SEP = "\x1e"
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33

#: the per-block visible-text fold = HTML_STRIP_STEPS minus the
#: script/style/comment removals (those run page-level, before
#: segmentation, so their contents can't straddle block boundaries)
_PAGE_PRE_STEPS = HTML_STRIP_STEPS[:3]
_INLINE_STEPS = HTML_STRIP_STEPS[3:]


def _visible(col: Column) -> Column:
    for pat, rep in _INLINE_STEPS:
        col = F.regexp_replace(col, pat, rep)
    return F.trim(col)


def html_main_content(html: Column | str) -> Column:
    """Main-content text of an HTML payload — the block-segmented,
    link-density-gated variant of :func:`html_to_text` (module
    commentary above). One codegen'd expression tree (regexp folds +
    array lambdas), zero Python, zero shuffles — runs at scan
    bandwidth next to the WARC record parse."""
    out = _c(html)
    for pat, rep in _PAGE_PRE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    blocks = F.split(F.regexp_replace(out, BLOCK_TAG_PATTERN, BLOCK_SEP), BLOCK_SEP)
    measured = F.transform(
        blocks,
        lambda b: F.struct(
            _visible(b).alias("vis"),
            F.aggregate(
                F.transform(
                    F.regexp_extract_all(b, F.lit(ANCHOR_PATTERN), F.lit(1)),
                    lambda a: F.length(_visible(a)),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("alen"),
        ),
    )
    kept = F.filter(
        measured,
        lambda s: (F.length(s["vis"]) >= MIN_BLOCK_CHARS)
        & (s["alen"] <= MAX_LINK_DENSITY * F.length(s["vis"])),
    )
    joined = F.array_join(F.transform(kept, lambda s: s["vis"]), " ")
    return F.trim(F.regexp_replace(joined, r"\s+", " "))


def _visible_sql(expr: str) -> str:
    for pat, rep in _INLINE_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"


def html_main_content_sql(expr: str) -> str:
    """The DuckDB twin of :func:`html_main_content`, generated from
    the same constants (pattern lists, thresholds) so both engines
    gate identical blocks."""
    for pat, rep in _PAGE_PRE_STEPS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{rep}', 'g')"
    block_pat = BLOCK_TAG_PATTERN.replace("'", "''")
    anchor_pat = ANCHOR_PATTERN.replace("'", "''")
    blocks = f"string_split(regexp_replace({expr}, '{block_pat}', chr(30), 'g'), chr(30))"
    alen = (
        "coalesce(list_sum(list_transform("
        f"regexp_extract_all(b, '{anchor_pat}', 1), "
        f"a -> length({_visible_sql('a')}))), 0)"
    )
    measured = (
        f"list_transform({blocks}, "
        f"b -> struct_pack(vis := {_visible_sql('b')}, alen := {alen}))"
    )
    kept = (
        f"list_filter({measured}, s -> "
        f"length(struct_extract(s, 'vis')) >= {MIN_BLOCK_CHARS} "
        f"AND struct_extract(s, 'alen') "
        f"<= {MAX_LINK_DENSITY} * length(struct_extract(s, 'vis')))"
    )
    joined = (
        "coalesce(array_to_string("
        f"list_transform({kept}, s -> struct_extract(s, 'vis')), ' '), '')"
    )
    return f"trim(regexp_replace({joined}, '\\s+', ' ', 'g'))"
