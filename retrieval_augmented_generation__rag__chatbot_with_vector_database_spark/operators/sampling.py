"""Deterministic stratified sampling — the corpus-mixing stage of a
training-data pipeline (keep X% of stratum A, Y% of B, ...).

Spark's ``sampleBy`` is seeded-random; a 100 TB curation run wants the
keep/drop decision to be a PURE FUNCTION of the row key so that
re-runs, partial backfills, and the DuckDB oracle all agree row for
row. The keep rule is modular arithmetic on the key:
``key % den < num`` keeps num/den of the stratum — a plain filter
(no shuffle, no window, pushes down to the scan when the key is a
stored column).

On dense integer keys (the fixtures) the mod is used directly; for
arbitrary / clustered keys pass ``hashed=True`` to mod over
``xxhash64(key)`` instead (uniform, still deterministic — but not
SQL-oracle-mirrorable, so the oracle queries use the raw-key form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stratified_mod_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, tuple[int, int]],
    default: tuple[int, int] = (1, 1),
    hashed: bool = False,
) -> DataFrame:
    """Keep ``num/den`` of each stratum (``rates[stratum] = (num,
    den)``); strata not listed use ``default``. Decision =
    ``key % den < num`` per stratum."""
    for num, den in list(rates.values()) + [default]:
        if den <= 0 or num < 0 or num > den:
            raise ValueError(f"invalid rate {num}/{den}")
    key: Column = F.col(key_col).cast("long")
    if hashed:
        key = F.xxhash64(F.col(key_col))
    listed: Column | None = None  # rows whose stratum has an explicit rate
    kept: Column | None = None  # rows kept by an explicit rate
    for stratum, (num, den) in rates.items():
        in_stratum = F.col(strata_col) == stratum
        this = in_stratum & (F.pmod(key, F.lit(den)) < num)
        listed = in_stratum if listed is None else listed | in_stratum
        kept = this if kept is None else kept | this
    dnum, dden = default
    default_keep = F.pmod(key, F.lit(dden)) < dnum
    if listed is None:
        return df.filter(default_keep)
    return df.filter(kept | (~listed & default_keep))
