"""Property-based tests (hypothesis) for the pure next-fit packing
kernel — the invariants the example tests can't sweep: arbitrary size
streams, oversized docs, zero-size docs, arbitrary split points for
the streaming continuation. Pure-function level, no Spark jobs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
    next_fit,
)

BUDGET = 64
SIZES = st.lists(st.integers(min_value=0, max_value=200), max_size=200)


def _bins(sizes, seqs):
    out: dict[int, list[int]] = {}
    for s, q in zip(sizes, seqs):
        out.setdefault(q, []).append(s)
    return out


@settings(max_examples=200, deadline=None)
@given(sizes=SIZES)
def test_bins_bounded_or_single_oversized(sizes):
    seqs, offs, _, _ = next_fit(sizes, BUDGET)
    for members in _bins(sizes, seqs).values():
        assert sum(members) <= BUDGET or len(members) == 1


@settings(max_examples=200, deadline=None)
@given(sizes=SIZES)
def test_offsets_are_in_bin_prefix_sums(sizes):
    seqs, offs, _, _ = next_fit(sizes, BUDGET)
    running: dict[int, int] = {}
    for s, q, o in zip(sizes, seqs, offs):
        assert o == running.get(q, 0)
        running[q] = running.get(q, 0) + s


@settings(max_examples=200, deadline=None)
@given(sizes=SIZES)
def test_seq_ids_contiguous_nondecreasing(sizes):
    seqs, _, final_seq, _ = next_fit(sizes, BUDGET)
    prev = 0
    for q in seqs:
        assert q in (prev, prev + 1)
        prev = q
    if seqs:
        assert final_seq == seqs[-1]


@settings(max_examples=200, deadline=None)
@given(sizes=SIZES, cut=st.integers(min_value=0, max_value=200))
def test_streaming_continuation_equals_one_shot(sizes, cut):
    """THE append-stability property: packing a prefix, then resuming
    from the returned open-bin state, equals packing the whole stream
    in one call — for every stream and every split point."""
    cut = min(cut, len(sizes))
    one_seqs, one_offs, one_seq, one_fill = next_fit(sizes, BUDGET)

    a_seqs, a_offs, a_seq, a_fill = next_fit(sizes[:cut], BUDGET)
    b_seqs, b_offs, b_seq, b_fill = next_fit(
        sizes[cut:], BUDGET,
        start_seq=a_seq, start_fill=a_fill,
        continue_open_bin=cut > 0,
    )
    assert a_seqs + b_seqs == one_seqs
    assert a_offs + b_offs == one_offs
    assert (b_seq, b_fill) == (one_seq, one_fill)


@settings(max_examples=100, deadline=None)
@given(sizes=SIZES)
def test_empty_and_total_conservation(sizes):
    seqs, offs, _, _ = next_fit(sizes, BUDGET)
    assert len(seqs) == len(offs) == len(sizes)
    # every element is assigned exactly once; bin totals sum to total
    assert sum(sum(m) for m in _bins(sizes, seqs).values()) == sum(sizes)
