"""Deterministic stratified sampling for training-data mixing.

A web-scale corpus is never consumed whole: the mixing stage keeps a
per-stratum fraction (by language, source, quality band, ...) of the
documents. Doing that with ``rand()`` makes runs irreproducible and
resume-unsafe; doing it with a driver-side shuffle doesn't distribute.
This module samples by CONTENT-DETERMINISTIC hash: a row is kept iff

    poly_hash(str(id)) mod denom < rate[stratum]

so membership is a pure function of the row's own id — the same rows
are kept on every run, at every parallelism, across resumes and
engines (the polynomial hash is the repo-wide shared family,
functions/hashing.py, expressible verbatim in DuckDB — which is what
makes this operator exactly oracle-checkable, unlike engine-native
``rand()`` / ``TABLESAMPLE``).

Scale shape: the predicate is a narrow JVM column expression — the
whole operator is a map-side filter inside whole-stage codegen, no
shuffle, no UDF, no driver collect; raising ``denom`` gives finer
rates at zero cost. Sampled fractions are exact in expectation and
concentrate tightly for large strata (binomial over ids).

The reference repo has no sampling; graft-extension infrastructure
(training-data pipeline ops are first-class per the build brief).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zh_ner_tf_spark.functions.hashing import poly_hash


def stratified_keep_expr(
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    denom: int = 100,
    default_rate: int = 0,
) -> Column:
    """Boolean keep-predicate column (exposed separately so callers can
    compose it — e.g. tag rows instead of filtering). ``rates`` maps a
    stratum value to the number of hash buckets (of ``denom``) kept;
    a stratum absent from ``rates`` — including NULL — falls through to
    ``default_rate``. All comparisons are integer.

    A NULL id has no hash bucket, so its membership is undefined and
    the predicate is NULL — ``filter`` DROPS such rows at every rate,
    including rate = denom. That is deliberate: a row without an
    identity cannot be sampled reproducibly (it would flip membership
    whenever an id backfill lands). Assign ids upstream if NULL-id rows
    must be sampleable."""
    if not 0 < denom:
        raise ValueError(f"denom must be positive, got {denom}")
    for s, r in rates.items():
        if not 0 <= r <= denom:
            raise ValueError(f"rate for {s!r} outside [0, {denom}]: {r}")
    bucket = F.pmod(poly_hash(F.col(id_col).cast("string")), F.lit(denom))
    rate: Column = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    return bucket < rate


def hash_stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    denom: int = 100,
    default_rate: int = 0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of ``df`` (see module
    docstring). ``rates={"zh": 50, "en": 30}`` with ``denom=100`` keeps
    ~50% of zh rows, ~30% of en rows, ``default_rate``% of the rest —
    the SAME rows every run."""
    return df.filter(
        stratified_keep_expr(id_col, strata_col, rates, denom, default_rate)
    )
