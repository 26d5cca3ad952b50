"""Seeded epoch shuffle (operators.packing.epoch_shuffle /
epoch_pack_assignment): complete permutation, epoch-to-epoch
difference, reproducibility, shard balance, and composition with
write_training_shards."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
    epoch_pack_assignment,
    epoch_shuffle,
    pack_sequences,
    read_training_shard,
    write_training_shards,
)


@pytest.fixture(scope="module")
def packed(spark):
    rows = [(i, 10 + (i * 7) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    return pack_sequences(df, budget=64, shards=4)


def _perm(df):
    return {
        (r["shard"], r["seq"]): (r["epoch_shard"], r["epoch_pos"])
        for r in df.collect()
    }


def test_complete_permutation(spark, packed):
    n_seqs = packed.select("shard", "seq").distinct().count()
    out = epoch_shuffle(packed, seed=7, epoch=0, out_shards=4)
    rows = out.collect()
    assert len(rows) == n_seqs
    # every sequence exactly once, every (epoch_shard, epoch_pos) unique
    assert len({(r["shard"], r["seq"]) for r in rows}) == n_seqs
    slots = {(r["epoch_shard"], r["epoch_pos"]) for r in rows}
    assert len(slots) == n_seqs
    # positions are 0..n-1 contiguous within each epoch shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["epoch_shard"], []).append(r["epoch_pos"])
    for ps in by_shard.values():
        assert sorted(ps) == list(range(len(ps)))


def test_epochs_differ_and_reproduce(spark, packed):
    e0 = _perm(epoch_shuffle(packed, seed=7, epoch=0, out_shards=4))
    e1 = _perm(epoch_shuffle(packed, seed=7, epoch=1, out_shards=4))
    e0b = _perm(epoch_shuffle(packed, seed=7, epoch=0, out_shards=4))
    assert e0 == e0b  # pure function of (seed, epoch)
    assert e0 != e1  # epochs permute differently
    assert set(e0) == set(e1)  # over the same sequences
    # a different seed also changes the permutation
    s2 = _perm(epoch_shuffle(packed, seed=8, epoch=0, out_shards=4))
    assert s2 != e0


def test_shard_balance(spark, packed):
    out = epoch_shuffle(packed, seed=7, epoch=0, out_shards=4)
    sizes = [
        r["n"]
        for r in out.groupBy("epoch_shard").agg(F.count("*").alias("n")).collect()
    ]
    assert len(sizes) == 4
    # md5 spreads uniformly; allow generous slack on a small fixture
    assert max(sizes) <= 3 * min(sizes)


def test_assignment_feeds_training_shards(spark, packed, tmp_path):
    """epoch_pack_assignment output is write_training_shards-shaped:
    (shard, seq, offset, size) with every doc kept exactly once."""
    ep = epoch_pack_assignment(packed, seed=7, epoch=2, out_shards=4)
    assert ep.count() == packed.count()
    assert {"doc_id", "shard", "seq", "offset", "size"} <= set(ep.columns)
    # every doc kept exactly once, identity preserved
    packed_rows = packed.collect()
    ep_rows = ep.collect()
    assert sorted(r["doc_id"] for r in ep_rows) == sorted(
        r["doc_id"] for r in packed_rows
    )
    # docs of one original sequence stay together: each original
    # (shard, seq) group lands on a single epoch (shard, seq) slot,
    # with every member's offset/size intact
    orig_group = {
        r["doc_id"]: (r["shard"], r["seq"], r["offset"], r["size"])
        for r in packed_rows
    }
    dest: dict[tuple, set] = {}
    for r in ep_rows:
        os_, oq, ooff, osz = orig_group[r["doc_id"]]
        assert (r["offset"], r["size"]) == (ooff, osz), r["doc_id"]
        dest.setdefault((os_, oq), set()).add((r["shard"], r["seq"]))
    assert all(len(slots) == 1 for slots in dest.values())
    # and distinct original sequences land on distinct epoch slots
    all_slots = [next(iter(s)) for s in dest.values()]
    assert len(set(all_slots)) == len(all_slots)
    path = str(tmp_path / "epoch2")
    write_training_shards(ep, path, budget=64)
    shard0 = read_training_shard(spark, path, 0)
    rows = shard0.select("seq", "offset").collect()
    # loader order is (seq, offset) nondecreasing
    keys = [(r["seq"], r["offset"]) for r in rows]
    assert keys == sorted(keys)
