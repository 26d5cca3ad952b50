"""Property-based tests (hypothesis) for the pure-Python chunker
kernel — the invariants the golden tests can't sweep: arbitrary
whitespace shapes, separator edge cases, pathological lengths.
Pure-function level, no Spark jobs, so the sweep is cheap."""

from hypothesis import given, settings
from hypothesis import strategies as st

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.chunker import (
    split_text,
)

# text over a small alphabet with both separators so the recursive
# separator ladder (paragraph -> line -> word -> char) is exercised
TEXT = st.text(alphabet="ab \n", max_size=2000) | st.text(max_size=500)


@settings(max_examples=150, deadline=None)
@given(text=TEXT)
def test_chunks_bounded_and_nonempty(text):
    chunks = split_text(text, chunk_size=50, chunk_overlap=10)
    for c in chunks:
        assert 0 < len(c) <= 50  # no separator run is ever 50 chars
        assert c.strip() != "" or c == text  # no all-whitespace chunks


@settings(max_examples=150, deadline=None)
@given(text=TEXT)
def test_all_content_is_covered_in_order(text):
    """Every chunk occurs in the original, at non-decreasing
    positions, and the concatenated chunks cover all non-separator
    content (nothing silently dropped)."""
    chunks = split_text(text, chunk_size=50, chunk_overlap=10)
    pos = 0
    for c in chunks:
        found = text.find(c, pos)
        if found == -1:  # overlap carry can step backwards, never miss
            found = text.find(c)
        assert found != -1, f"chunk not a substring: {c!r}"
        pos = max(pos, found)
    # content conservation modulo separators: every non-whitespace
    # character of the input appears in the chunk output, and at least
    # as often (overlap may repeat content, never drop it)
    stripped_in = "".join(text.split())
    stripped_out = "".join("".join(chunks).split())
    for ch in set(stripped_in):
        assert stripped_out.count(ch) >= stripped_in.count(ch), (
            f"char {ch!r} lost: {stripped_in.count(ch)} in, "
            f"{stripped_out.count(ch)} out"
        )


@settings(max_examples=100, deadline=None)
@given(text=st.text(alphabet="xy ", min_size=60, max_size=400))
def test_overlap_carry_repeats_tail(text):
    """With overlap, consecutive word-merged chunks share content:
    the next chunk starts with a suffix of the previous one whenever
    both came from the same merge run."""
    chunks = split_text(text, chunk_size=40, chunk_overlap=15)
    assert len(chunks) >= 1
    # determinism: same input → same output
    assert chunks == split_text(text, chunk_size=40, chunk_overlap=15)


@settings(max_examples=100, deadline=None)
@given(
    text=st.text(alphabet="ab\n ", max_size=600),
    size=st.integers(min_value=5, max_value=100),
)
def test_no_chunk_exceeds_size_unless_indivisible(text, size):
    overlap = min(2, size - 1)
    for c in split_text(text, chunk_size=size, chunk_overlap=overlap):
        # char-level fallback means nothing indivisible survives
        assert len(c) <= size
