"""Second-stage cross-encoder reranking — the precision stage of a
production retrieval stack: a cheap first stage (vector top-k, BM25,
RRF fusion) nominates a small candidate set, and an expensive
pairwise scorer (a cross-encoder transformer in deployment) re-orders
only those candidates.

The reference ranks by bi-encoder cosine only
(`app/services/pinecone_service.py:108-146`); reranking is a
north-star extension, but the SEAM discipline is the reference's own
(`embed/providers.py`): the scorer is a pluggable Python callable run
over Arrow batches via ``mapInPandas`` — swap in an ONNX/torch
cross-encoder in deployment with no plan change, exactly how the LLM
and embedding calls are seamed. CI and the oracle queries use
:func:`hash_crossencoder`, a deterministic fake whose scores DuckDB
reproduces digit for digit (``('0x' || substr(md5(qid:docid),1,8))
::UBIGINT / 2^32``), so the *plumbing* — batching, per-query
re-ranking, ties, top-k slice, composition with stage 1 — is
verified full-value even though the real model can't run here.

Scale shape: the expensive scorer touches ONLY stage-1 survivors —
|queries| × k' rows, thousands at serving time, never the corpus.
Candidates arrive already bounded, so the rerank is one Arrow pass
plus one per-query window (partial WindowGroupLimit below the
exchange, same as stage 1).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# scorer contract: pdf with the candidate columns -> one float per row
Scorer = Callable[[pd.DataFrame], "pd.Series"]


def hash_crossencoder(query_col: str = "query_id", id_col: str = "vec_id") -> Scorer:
    """Deterministic fake cross-encoder: uniform-ish score in [0, 1)
    from md5 of ``"{query}:{doc}"`` — a pure function of the pair, so
    re-runs, partitionings, and the SQL oracle agree exactly. Stands
    in for the real model in CI; carries zero semantic signal (that is
    the point — it pins the plumbing, not the model)."""

    def score(pdf: pd.DataFrame) -> pd.Series:
        # zip over the columns, NOT pdf.apply(axis=1): row-wise apply
        # coerces mixed dtypes to float64, turning id 220 into "220.0"
        # and silently changing every hash
        vals = [
            int(hashlib.md5(f"{q}:{d}".encode()).hexdigest()[:8], 16)
            / 4294967296.0
            for q, d in zip(pdf[query_col], pdf[id_col])
        ]
        return pd.Series(vals, index=pdf.index)

    return score


def crossencoder_rerank(
    candidates: DataFrame,
    scorer: Scorer,
    k: int = 5,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Re-score the (bounded) stage-1 ``candidates`` with ``scorer``
    and keep the top ``k`` per query by (ce_score desc, id asc).

    Output: all candidate columns plus ``ce_score`` (rounded to 6 dp
    for cross-engine determinism) and ``ce_rank``. The scorer runs in
    Arrow batches over whatever partitioning the candidates already
    have — no shuffle before scoring; the only exchange is the final
    per-query top-k window.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cols = candidates.columns
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", ce_score double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf["ce_score"] = [round(s, 6) for s in scorer(pdf)]
            yield pdf

    scored = candidates.mapInPandas(kernel, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("ce_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("ce_rank", F.row_number().over(w))
        .filter(F.col("ce_rank") <= k)
        .select(*cols, "ce_score", "ce_rank")
    )


__all__ = ["crossencoder_rerank", "hash_crossencoder", "Scorer"]
