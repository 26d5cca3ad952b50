"""Pinecone metadata filter-DSL → Catalyst ``Column`` (SURVEY.md §2b P2).

The reference forwards a Mongo-style ``filter_dict`` verbatim to
Pinecone (``/root/reference/app/services/pinecone_service.py:152,
171-176``); the dialect is Pinecone's public metadata-filter language:

- ``{"field": value}``                      — bare value ⇒ ``$eq``
- ``{"field": {"$eq"|"$ne"|"$gt"|"$gte"|"$lt"|"$lte": v}}``
- ``{"field": {"$in"|"$nin": [v, ...]}}``
- ``{"field": {"$exists": true|false}}``
- ``{"$and": [f1, f2, ...]}`` / ``{"$or": [f1, f2, ...]}``
- multiple top-level fields ⇒ implicit AND

Translating to a ``Column`` (instead of evaluating row-at-a-time like
the hosted service) means the predicate participates in Catalyst:
simple comparisons are pushed into the Parquet scan as PushedFilters /
row-group pruning, which is the whole point at 100 TB — the filter
runs *before* any similarity math, not after.

Null semantics follow SQL (a comparison with NULL is NULL → row
dropped), matching the DuckDB oracle; ``$exists`` maps to
``isNotNull``/``isNull``, the closest relational analog of Pinecone's
key-presence test on schemaless metadata.
"""

from __future__ import annotations

from collections.abc import Collection
from functools import reduce
from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

_COMPARATORS = {
    "$eq": lambda c, v: c == F.lit(v),
    "$ne": lambda c, v: c != F.lit(v),
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
}


def _field_predicate(field: str, spec: Any) -> Column:
    col = F.col(field)
    if not isinstance(spec, Mapping):  # bare value ⇒ $eq
        return col == F.lit(spec)
    if not spec:
        raise ValueError(f"empty operator dict for field {field!r}")
    parts: list[Column] = []
    for op, val in spec.items():
        if op in _COMPARATORS:
            parts.append(_COMPARATORS[op](col, val))
        elif op in ("$in", "$nin"):
            # strings are iterable, so list("abc") would silently become
            # isin('a','b','c') — reject those, but accept any other
            # concrete collection (list/tuple/set/frozenset/dict_keys);
            # generators stay rejected (not Collection, single-use)
            if isinstance(val, (str, bytes, Mapping)) or not isinstance(
                val, Collection
            ):
                raise ValueError(
                    f"{op} for {field!r} expects a collection of values, "
                    f"got {type(val).__name__}"
                )
            pred = col.isin(list(val))
            parts.append(pred if op == "$in" else ~pred)
        elif op == "$exists":
            parts.append(col.isNotNull() if val else col.isNull())
        else:
            raise ValueError(f"unsupported filter operator {op!r} for {field!r}")
    return reduce(lambda a, b: a & b, parts)


def filter_dict_to_column(filter_dict: Mapping[str, Any] | None) -> Column:
    """Translate a Pinecone ``filter_dict`` into a Catalyst predicate.

    ``None``/``{}`` ⇒ ``lit(True)`` (no filtering), mirroring the
    reference's optional parameter. Raises ``ValueError`` on unknown
    operators or malformed combinators — a bad filter should fail the
    query loudly, exactly like the hosted API's 400.
    """
    if not filter_dict:
        return F.lit(True)
    parts: list[Column] = []
    for key, spec in filter_dict.items():
        if key in ("$and", "$or"):
            if not isinstance(spec, (list, tuple)) or not spec:
                raise ValueError(f"{key} expects a non-empty list of filters")
            sub = [filter_dict_to_column(s) for s in spec]
            combined = reduce(
                (lambda a, b: a & b) if key == "$and" else (lambda a, b: a | b), sub
            )
            parts.append(combined)
        elif key.startswith("$"):
            raise ValueError(f"unsupported top-level combinator {key!r}")
        else:
            parts.append(_field_predicate(key, spec))
    return reduce(lambda a, b: a & b, parts)
