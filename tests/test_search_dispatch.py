"""Search-path dispatcher (operators.search): route() picks the right
strategy per scenario, search() results match the direct-path calls,
and contradictions fail loudly."""

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
    ann,
    pq,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.search import (
    route,
    search,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.topk import (
    topk_search,
    topk_search_gemm,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["vec_id"], round(r["score"], 6), r["rank"])
        for r in df.collect()
    )


# -- route() decisions --------------------------------------------------


def test_route_small_index_is_hof():
    assert route(n_rows=1000)["path"] == "exact_hof"


def test_route_large_index_is_gemm():
    assert route(n_rows=10_000_000)["path"] == "exact_gemm"


def test_route_unknown_size_defaults_gemm():
    assert route()["path"] == "exact_gemm"


def test_route_parity_forces_hof():
    assert route(n_rows=10_000_000, parity=True)["path"] == "exact_hof"


def test_route_ivf_layout(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    cents = ann.seed_centroids(emb, 8)
    ann.write_ivf_index(emb, path, cents)
    assert route(layout_path=path)["path"] == "ivf"
    # layout presence beats any row-count argument
    assert route(layout_path=path, n_rows=10)["path"] == "ivf"


def test_route_ivfpq_layout_and_metric_guard(spark, emb, tmp_path):
    path = str(tmp_path / "ivfpq")
    books = pq.train_pq_codebooks(emb, m=8, k=16)
    cents = ann.seed_centroids(emb, 8)
    pq.write_ivfpq_index(emb, path, cents, books)
    assert route(layout_path=path, metric="euclidean")["path"] == "ivfpq"
    # a transformed layout serves exactly its own metric — raw serves
    # euclidean only
    with pytest.raises(ValueError, match="serves exactly its own metric"):
        route(layout_path=path, metric="cosine")
    with pytest.raises(ValueError, match="serves exactly its own metric"):
        route(layout_path=path, metric="dotproduct")


def _normalized_ivfpq(spark, emb, path, n_cents=8):
    """Build a normalize=True IVFPQ layout with quantizers trained in
    the unit-sphere space (the layout's own space)."""
    emb_n = pq._unit_normalized(emb, "embedding")
    books = pq.train_pq_codebooks(emb_n, m=8, k=16)
    cents = ann.seed_centroids(emb_n, n_cents)
    pq.write_ivfpq_index(emb, path, cents, books, normalize=True)
    return cents, books


def test_route_normalized_ivfpq_serves_cosine(spark, emb, tmp_path):
    path = str(tmp_path / "ivfpq_n")
    _normalized_ivfpq(spark, emb, path)
    r = route(layout_path=path, metric="cosine")
    assert r["path"] == "ivfpq"
    assert "normalized" in r["reason"]
    # normalized codes live on the unit sphere: euclidean against RAW
    # geometry would rank by a different space — rejected
    with pytest.raises(ValueError, match="serves exactly its own metric"):
        route(layout_path=path, metric="euclidean")
    with pytest.raises(ValueError, match="serves exactly its own metric"):
        route(layout_path=path, metric="dotproduct")


def _mips_ivfpq(spark, emb, path, n_cents=8):
    """Build a mips=True IVFPQ layout: quantizers trained in the
    augmented space (dim 64 -> 72 = 9 subspaces x 8); residual
    codebooks — the shipped MIPS default (residual=None → True)."""
    M = pq.mips_max_norm(emb, "embedding")
    aug = pq.mips_augmented(emb, "embedding", M, 72)
    cents = ann.seed_centroids(aug, n_cents)
    books = pq.train_pq_codebooks_residual(aug, cents, m=9, k=16)
    pq.write_ivfpq_index(emb, path, cents, books, mips=True)
    return cents, books


def test_route_mips_ivfpq_serves_dotproduct(spark, emb, tmp_path):
    path = str(tmp_path / "ivfpq_m")
    _mips_ivfpq(spark, emb, path)
    r = route(layout_path=path, metric="dotproduct")
    assert r["path"] == "ivfpq"
    assert "MIPS" in r["reason"]
    with pytest.raises(ValueError, match="serves exactly its own metric"):
        route(layout_path=path, metric="euclidean")
    with pytest.raises(ValueError, match="serves exactly its own metric"):
        route(layout_path=path, metric="cosine")


def test_search_ivfpq_dotproduct_hash_equals_exact(spark, emb):
    """MIPS reduction end to end: with all buckets probed and
    fetch_k >= |index| the dispatched dotproduct result must
    hash-equal the exact dot-product top-k (augmented euclidean
    candidate order ≡ dot-product order; rerank scores exact dot
    product on the raw vectors)."""
    import tempfile

    n = emb.count()
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ivfpq_mips"
        _mips_ivfpq(spark, emb, path)
        got = _rows(
            search(
                _queries(emb),
                emb,
                k=5,
                metric="dotproduct",
                layout_path=path,
                nprobe=8,
                fetch_k=n,
            )
        )
    want = _rows(topk_search(_queries(emb), emb, k=5, metric="dotproduct"))
    assert got == want


def test_write_ivfpq_normalize_mips_exclusive(spark, emb, tmp_path):
    books = pq.train_pq_codebooks(emb, m=8, k=16)
    cents = ann.seed_centroids(emb, 8)
    with pytest.raises(ValueError, match="mutually exclusive"):
        pq.write_ivfpq_index(
            emb, str(tmp_path / "x"), cents, books,
            normalize=True, mips=True,
        )


def test_write_ivfpq_mips_defaults_residual(spark, emb, tmp_path):
    """residual=None resolves to True under mips=True (SCALE.md: raw
    codes recall@10 0.037 vs 0.54 residual on the 500k hard case) —
    the sidecar must persist residual=true without the caller asking."""
    path = str(tmp_path / "ivfpq_m")
    _mips_ivfpq(spark, emb, path)
    meta = pq.load_ivfpq_meta(path)
    assert meta["mips"] is True
    assert meta["residual"] is True


def test_write_ivfpq_mips_refuses_raw_codes(spark, emb, tmp_path):
    """Explicit residual=False with mips=True is a recall trap with no
    downstream error — the build must refuse loudly."""
    M = pq.mips_max_norm(emb, "embedding")
    aug = pq.mips_augmented(emb, "embedding", M, 72)
    books = pq.train_pq_codebooks(aug, m=9, k=16)
    cents = ann.seed_centroids(aug, 8)
    with pytest.raises(ValueError, match="residual"):
        pq.write_ivfpq_index(
            emb, str(tmp_path / "x"), cents, books, mips=True, residual=False
        )


def test_write_ivfpq_mips_rejects_undersized_codebooks(spark, emb, tmp_path):
    """Codebooks trained on the RAW frame (m*sub == input dim < dim+1)
    would silently truncate the sqrt augmentation coordinate — ADC
    order would stop being dot-product order with no error anywhere.
    The build must raise instead (ADVICE r7)."""
    cents = ann.seed_centroids(emb, 8)
    books = pq.train_pq_codebooks_residual(emb, cents, m=8, k=16)  # dim 64
    with pytest.raises(ValueError, match="augmented"):
        pq.write_ivfpq_index(emb, str(tmp_path / "x"), cents, books, mips=True)


def test_route_rejects_non_layout_dir(tmp_path):
    with pytest.raises(ValueError, match="not a persisted vector layout"):
        route(layout_path=str(tmp_path))


# -- search() dispatch equals the direct path ----------------------------


def test_search_small_equals_hof(spark, emb):
    got = search(_queries(emb), emb, k=5, n_rows=emb.count())
    want = topk_search(_queries(emb), emb, k=5)
    assert _rows(got) == _rows(want)


def test_search_forced_gemm_equals_gemm(spark, emb):
    got = search(_queries(emb), emb, k=5)  # unknown size -> gemm
    want = topk_search_gemm(_queries(emb), emb, k=5)
    assert _rows(got) == _rows(want)


def test_search_ivf_layout_equals_direct_probe(spark, emb, tmp_path):
    path = str(tmp_path / "ivf2")
    cents = ann.seed_centroids(emb, 8)
    ann.write_ivf_index(emb, path, cents)
    got = search(_queries(emb), k=5, metric="cosine", layout_path=path, nprobe=3)
    want = ann.ivf_topk_gemm(
        _queries(emb), ann.read_ivf_index(spark, path), cents, k=5, nprobe=3
    )
    assert _rows(got) == _rows(want)


def test_search_ivfpq_layout_equals_direct_rerank(spark, emb, tmp_path):
    path = str(tmp_path / "ivfpq2")
    books = pq.train_pq_codebooks(emb, m=8, k=16)
    cents = ann.seed_centroids(emb, 8)
    pq.write_ivfpq_index(emb, path, cents, books)
    got = search(
        _queries(emb),
        emb,
        k=5,
        metric="euclidean",
        layout_path=path,
        nprobe=4,
        fetch_k=25,
    )
    want = pq.ivfpq_topk_rerank(
        _queries(emb),
        spark.read.parquet(path),
        emb,
        cents,
        books,
        k=5,
        nprobe=4,
        fetch_k=25,
    )
    assert _rows(got) == _rows(want)


def test_search_ivfpq_cosine_hash_equals_exact(spark, emb):
    """The r6-verdict gap closed: cosine over a NORMALIZED IVFPQ
    layout. With nprobe = all buckets and fetch_k >= |index| the
    rerank set is the whole corpus, so the dispatched result must
    hash-equal the exact cosine top-k — not approximately, exactly
    (squared-L2 order ≡ cosine order on unit vectors; rerank scores
    are the scale-invariant exact cosine of the RAW vectors)."""
    import tempfile

    n = emb.count()
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ivfpq_cos"
        _normalized_ivfpq(spark, emb, path)
        got = _rows(
            search(
                _queries(emb),
                emb,
                k=5,
                metric="cosine",
                layout_path=path,
                nprobe=8,
                fetch_k=n,
            )
        )
    want = _rows(topk_search(_queries(emb), emb, k=5, metric="cosine"))
    assert got == want


def test_search_ivfpq_cosine_raw_layout_raises(spark, emb, tmp_path):
    path = str(tmp_path / "ivfpq_raw")
    books = pq.train_pq_codebooks(emb, m=8, k=16)
    cents = ann.seed_centroids(emb, 8)
    pq.write_ivfpq_index(emb, path, cents, books)
    with pytest.raises(ValueError, match="serves exactly its own metric"):
        search(_queries(emb), emb, k=5, metric="cosine", layout_path=path)


def test_search_exact_needs_index(spark, emb):
    with pytest.raises(ValueError, match="needs an index frame"):
        search(_queries(emb), None, k=5)


# -- size-aware crossover + self-contained layouts (round 9) -------------


def _euclid_ivfpq(spark, emb, path, **kw):
    cents = ann.seed_centroids(emb, 8)
    books = pq.train_pq_codebooks(emb, m=8, k=16)
    pq.write_ivfpq_index(emb, path, cents, books, **kw)


def test_route_prefer_exact_below_crossover(spark, emb, tmp_path):
    """Both sides of the threshold: a present layout whose sidecar
    rows_at_build is under prefer_exact_below routes to the exact GEMM
    scan (SCALE.md: brute force beats any probe's fixed overhead below
    the crossover); above it (or with the override off) the layout is
    served."""
    path = str(tmp_path / "ivfpq")
    _euclid_ivfpq(spark, emb, path)
    built = int(pq.load_ivfpq_meta(path)["rows_at_build"])
    assert built > 0
    under = route(layout_path=path, metric="euclidean",
                  prefer_exact_below=built + 1)
    assert under["path"] == "exact_gemm"
    assert "crossover" in under["reason"]
    over = route(layout_path=path, metric="euclidean",
                 prefer_exact_below=built)
    assert over["path"] == "ivfpq"
    off = route(layout_path=path, metric="euclidean")
    assert off["path"] == "ivfpq"


def test_route_prefer_exact_below_ivf(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    cents = ann.seed_centroids(emb, 8)
    ann.write_ivf_index(emb, path, cents)
    built = int(ann.ivf_meta(path)["rows_at_build"])
    assert route(layout_path=path, prefer_exact_below=built + 1)[
        "path"
    ] == "exact_gemm"
    assert route(layout_path=path, prefer_exact_below=built)["path"] == "ivf"


def test_search_crossover_matches_exact(spark, emb, tmp_path):
    """search() with the crossover active returns the exact GEMM rows."""
    path = str(tmp_path / "ivfpq")
    _euclid_ivfpq(spark, emb, path)
    q = _queries(emb)
    got = _rows(
        search(q, emb, k=5, metric="euclidean", layout_path=path,
               prefer_exact_below=10**9)
    )
    want = _rows(topk_search_gemm(q, emb, k=5, metric="euclidean"))
    assert got == want


def test_search_self_contained_layout_serves_without_index(spark, emb, tmp_path):
    """store_vectors=True layouts carry the raw floats: the probe's
    fused in-kernel rerank needs no side full-precision table — the
    100 TB serving shape (only probed bucket dirs are read)."""
    path = str(tmp_path / "ivfpq")
    _euclid_ivfpq(spark, emb, path)
    assert pq.load_ivfpq_meta(path)["stores_vectors"] is True
    q = _queries(emb)
    got = _rows(
        search(q, None, k=5, metric="euclidean", layout_path=path,
               nprobe=8, fetch_k=10**6)
    )
    want = _rows(topk_search_gemm(q, emb, k=5, metric="euclidean"))
    assert got == want


def test_codes_only_layout_requires_index(spark, emb, tmp_path):
    path = str(tmp_path / "ivfpq")
    _euclid_ivfpq(spark, emb, path, store_vectors=False)
    assert pq.load_ivfpq_meta(path)["stores_vectors"] is False
    q = _queries(emb)
    with pytest.raises(ValueError, match="full-precision index frame"):
        search(q, None, k=5, metric="euclidean", layout_path=path).collect()


def test_fused_rerank_hash_equals_join_rerank(spark, emb, tmp_path):
    """Same quantizers, both layout shapes, full-coverage fetch: the
    fused in-kernel rescore (sequential float64 folds mirroring
    similarity_expr) and the join-rerank path return IDENTICAL rows
    including 6-decimal scores — for every metric."""
    cents_r = ann.seed_centroids(emb, 8)
    books_r = pq.train_pq_codebooks(emb, m=8, k=16)
    q = _queries(emb)
    for metric, build in (
        ("euclidean", dict(centroids=cents_r, codebooks=books_r)),
        ("cosine", None),
        ("dotproduct", None),
    ):
        if metric == "cosine":
            src = pq._unit_normalized(emb, "embedding")
            cents = ann.seed_centroids(src, 8)
            books = pq.train_pq_codebooks(src, m=8, k=16)
            kw = dict(normalize=True)
        elif metric == "dotproduct":
            M = pq.mips_max_norm(emb, "embedding")
            aug = pq.mips_augmented(emb, "embedding", M, 72)
            cents = ann.seed_centroids(aug, 8)
            books = pq.train_pq_codebooks_residual(aug, cents, m=9, k=16)
            kw = dict(mips=True)
        else:
            cents, books, kw = cents_r, books_r, {}
        p_f = str(tmp_path / f"f_{metric}")
        p_j = str(tmp_path / f"j_{metric}")
        pq.write_ivfpq_index(emb, p_f, cents, books, **kw)
        pq.write_ivfpq_index(emb, p_j, cents, books, store_vectors=False, **kw)
        fused = _rows(
            search(q, None, k=5, metric=metric, layout_path=p_f,
                   nprobe=8, fetch_k=10**6, mips_fetch_floor=0)
        )
        joined = _rows(
            search(q, emb, k=5, metric=metric, layout_path=p_j,
                   nprobe=8, fetch_k=10**6, mips_fetch_floor=0)
        )
        assert fused == joined, metric


def test_mips_fetch_floor_only_raises_fetch(spark, emb, tmp_path):
    """The dotproduct over-fetch floor (fraction of rows_at_build)
    can only ADD candidates: at full coverage the results equal the
    floor-disabled call."""
    M = pq.mips_max_norm(emb, "embedding")
    aug = pq.mips_augmented(emb, "embedding", M, 72)
    cents = ann.seed_centroids(aug, 8)
    books = pq.train_pq_codebooks_residual(aug, cents, m=9, k=16)
    path = str(tmp_path / "mips")
    pq.write_ivfpq_index(emb, path, cents, books, mips=True)
    q = _queries(emb)
    with_floor = _rows(
        search(q, None, k=5, metric="dotproduct", layout_path=path,
               nprobe=8, fetch_k=10**6, mips_fetch_floor=1.0)
    )
    no_floor = _rows(
        search(q, None, k=5, metric="dotproduct", layout_path=path,
               nprobe=8, fetch_k=10**6, mips_fetch_floor=0)
    )
    assert with_floor == no_floor
