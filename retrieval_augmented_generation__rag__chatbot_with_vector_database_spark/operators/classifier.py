"""Multinomial naive-Bayes document classifier as pure DataFrame
aggregation — the fastText/CCNet-style learned quality gate of a
training-data pipeline: train token-class log-odds on a labeled slice,
broadcast the model, score every document in one pass. Complements the
generative bigram LM (``operators/lm.py``): the LM scores fluency
unsupervised, this scores class membership supervised (quality
keep/drop, domain routing, learned language ID).

The reference has no learned classifier (RAG service); SURVEY.md
north-star extension like ``operators/lm.py``.

Everything is SQL aggregation — no Python, no gradient loop:

- MODEL: token-class counts ``c(w,k)`` (one vocabulary-bounded hash
  aggregate), class token totals ``c(k)``, train vocabulary size
  ``V``, and doc-count priors. Lidstone smoothing ``P(w|k) = (c(w,k)
  + alpha) / (c(k) + alpha*V)``; the model densifies to every
  (train-vocab word, class) pair so in-vocab-but-unseen-in-class
  words score the smoothed floor, and OUT-of-vocab occurrences take
  the per-class fallback ``alpha / (c(k) + alpha*V)`` — handled
  arithmetically (n_oov * fallback), never by exploding OOV rows.
- SCORING: test tokens x classes (a bounded |K|-way fan-out), one
  join to the dense model, one groupBy(doc, class) DECIMAL sum, then
  a |K|-row-per-doc window argmax (score desc, class asc).

Scale shape: the model is a (vocab x classes) dimension — broadcast
when it fits, else a plain ["w", "k"] shuffle equi-join (routing is
explicit: ``broadcast_model`` flag, auto by estimated model rows);
scoring shuffles one row per (doc, class), never corpus x vocab. Per-token contributions
are rounded to 6 dp and summed as DECIMAL (repo determinism
convention, cf. ``operators/lm.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _tokens(df: DataFrame, id_col: str, label_col: str | None, text_col: str):
    cols = [F.col(id_col).alias("id")]
    if label_col is not None:
        cols.append(F.col(label_col).alias("label"))
    return df.select(
        *cols,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("w"),
    )


def nb_model(
    train: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """(dense, per_class): ``dense`` = (w, k, logp DECIMAL) over train
    vocabulary x classes; ``per_class`` = (k, fallback, prior) — the
    OOV floor and the log doc-count prior. All six-decimal DECIMAL,
    deterministic across engines."""
    tok = _tokens(train, id_col, label_col, text_col)
    classes = tok.groupBy(F.col("label").alias("k")).agg(
        F.count_distinct("id").alias("nk")
    )
    ndocs = tok.agg(F.count_distinct("id").alias("n"))
    cwk = tok.groupBy("w", F.col("label").alias("k")).agg(
        F.count("*").alias("c")
    )
    ck = cwk.groupBy("k").agg(F.sum("c").alias("ck"))
    v = tok.agg(F.count_distinct("w").alias("v"))
    vw = tok.select("w").distinct()
    dense = (
        vw.crossJoin(classes.select("k"))
        .join(cwk, ["w", "k"], "left")
        .join(ck, "k")
        .crossJoin(v)
        .select(
            "w",
            "k",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                    / (F.col("ck") + F.lit(alpha) * F.col("v"))
                ),
                6,
            )
            .cast(DEC)
            .alias("logp"),
        )
    )
    per_class = (
        ck.crossJoin(v)
        .join(classes, "k")
        .crossJoin(ndocs)
        .select(
            "k",
            F.round(
                F.log(F.lit(alpha) / (F.col("ck") + F.lit(alpha) * F.col("v"))),
                6,
            )
            .cast(DEC)
            .alias("fallback"),
            F.round(F.log(F.col("nk") / F.col("n")), 6)
            .cast(DEC)
            .alias("prior"),
        )
    )
    return dense, per_class


#: above this many (word, class) model rows the dense model no longer
#: fits a sane executor broadcast (~40 B/row serialized → ~160 MB);
#: a real 1e7-word × K-class model OOMs a forced broadcast, so auto
#: routing falls back to the plain shuffle equi-join past this point
BROADCAST_MAX_MODEL_ROWS = 4_000_000


def nb_classify(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.5,
    broadcast_model: bool | None = None,
    broadcast_max_model_rows: int = BROADCAST_MAX_MODEL_ROWS,
) -> DataFrame:
    """Train on ``train``, score ``test``; returns one row per test
    doc that has at least one token: (id_col, label_col,
    pred_<label_col>, score, is_correct). Prediction is the argmax
    class by DECIMAL log-posterior, ties broken by class name asc.

    Model-join routing (the docstring promise made honest, same
    pattern as ``operators/search.route``): ``broadcast_model=True``
    forces ``F.broadcast(dense)``; ``False`` uses a plain ["w", "k"]
    shuffle equi-join (the token stream and the model co-shuffle on
    the word key — correct at any model size); ``None`` (default)
    auto-routes by the estimated model size |train vocab| × |classes|
    (one cheap aggregate over the train token stream) against
    ``broadcast_max_model_rows``. Results are identical either way
    (pytest pins hash equality); only the physical join strategy
    moves."""
    dense, per_class = nb_model(train, id_col, label_col, text_col, alpha)
    if broadcast_model is None:
        # |model| = train vocab × classes, from one aggregate pass
        est = (
            _tokens(train, id_col, label_col, text_col)
            .agg(
                F.count_distinct("w").alias("v"),
                F.count_distinct("label").alias("k"),
            )
            .collect()[0]
        )
        broadcast_model = (
            (est["v"] or 0) * (est["k"] or 0) <= broadcast_max_model_rows
        )
    dense_side = F.broadcast(dense) if broadcast_model else dense
    tok = _tokens(test, id_col, label_col, text_col)
    scored = (
        tok.crossJoin(F.broadcast(per_class.select("k")))
        .join(dense_side, ["w", "k"], "left")
        .join(F.broadcast(per_class), "k")
        .groupBy("id", "k")
        .agg(
            F.any_value(F.col("label")).alias("label"),
            F.sum(F.coalesce(F.col("logp"), F.col("fallback"))).alias("ll"),
            F.any_value(F.col("prior")).alias("prior"),
        )
        .select(
            "id",
            "label",
            "k",
            # decimal -> string -> double: the correctly-rounded path
            # on both engines (FIXTURES.md decimal-cast convention)
            (F.col("prior") + F.col("ll"))
            .cast("string")
            .cast("double")
            .alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("k").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("label").alias(label_col),
            F.col("k").alias(f"pred_{label_col}"),
            F.round("score", 6).alias("score"),
            (F.col("label") == F.col("k")).alias("is_correct"),
        )
    )
