"""BPE trainer scale check (round 7): incremental pair maintenance vs
the naive full-recount loop at production merge counts.

The distributed half of training (one vocabulary-bounded hash
aggregate) is unchanged; this times the DRIVER merge loop over a
synthetic Zipf-ish word-type table shaped like a real capped
vocabulary (default 50k types), comparing:

- naive: full pair recount + linear scan per merge (the pre-r7
  algorithm), timed at a small merge count and linearly extrapolated
  (its per-merge cost is ~flat: every merge rescans every word type);
- incremental: Sennrich pair maintenance + lazy-invalidation heap
  (operators/bpe.train_bpe_local), timed at the full merge count.

Equivalence is asserted on the overlapping merge prefix, not assumed.

Usage: python tools/scale_check_bpe.py [n_types] [merges] [naive_merges]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.bpe import (  # noqa: E402
    train_bpe_local,
)


def naive_train(vocab, num_merges, min_pair_freq=2):
    """The pre-r7 loop: full recount + min-scan per merge."""
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
        merged = l + r
        nw = []
        for syms, f in words:
            out = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw.append((out, f))
        words = nw
        merges.append((rank, l, r, merged, c))
    return merges


def make_vocab(n_types: int, seed: int = 7) -> list[tuple[str, int]]:
    """Zipf-ish (freq ~ 1/rank) word types over a 26-letter alphabet
    with Zipf-ish letter skew — runs, ties, shared affixes, like a
    real capped pretoken table."""
    rng = random.Random(seed)
    letters = "abcdefghijklmnopqrstuvwxyz"
    weights = [1.0 / (i + 1) for i in range(len(letters))]
    vocab, seen = [], set()
    rank = 1
    while len(vocab) < n_types:
        ln = rng.randint(2, 12)
        t = "".join(rng.choices(letters, weights=weights, k=ln))
        if t in seen:
            continue
        seen.add(t)
        vocab.append((t, max(1, int(1_000_000 / rank))))
        rank += 1
    return vocab


def main():
    n_types = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    merges = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000
    naive_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    vocab = make_vocab(n_types)
    print(f"vocab: {n_types} word types, target {merges} merges")

    t0 = time.perf_counter()
    inc = train_bpe_local(vocab, num_merges=merges, min_pair_freq=2)
    t_inc = time.perf_counter() - t0
    print(
        f"incremental: {len(inc)} merges in {t_inc:.2f}s "
        f"({t_inc / max(len(inc), 1) * 1000:.2f} ms/merge)"
    )

    t0 = time.perf_counter()
    nai = naive_train(vocab, naive_merges)
    t_nai = time.perf_counter() - t0
    per = t_nai / max(len(nai), 1)
    print(
        f"naive: {len(nai)} merges in {t_nai:.2f}s ({per * 1000:.2f} ms/merge)"
        f" -> extrapolated {per * merges:.0f}s for {merges} merges"
    )
    got = [(m.rank, m.left, m.right, m.merged, m.pair_freq) for m in inc]
    assert got[: len(nai)] == nai, "merge tables diverge on shared prefix"
    print(
        f"equivalent on first {len(nai)} merges; "
        f"speedup at {merges} merges ~= {per * merges / t_inc:.0f}x"
    )


if __name__ == "__main__":
    main()
