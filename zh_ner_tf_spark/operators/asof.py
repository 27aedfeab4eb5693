"""As-of join — the time-series join Spark lacks as a built-in (graft
brief: "when the reference has an operator Spark lacks (e.g., as-of
join), implement it as a composition of existing DataFrame ops").

Semantics (= DuckDB/kdb ASOF JOIN, inner variant): for every left row,
attach the right row with the greatest right.ts <= left.ts within the
same key; left rows with no such right row are dropped (inner) or kept
with nulls (left outer).

Spark shape — the UNION + WINDOW composition, not a per-key loop:
tag both sides, union them, and take ``last(right_payload,
ignorenulls=True)`` over a window ordered by (ts, side) with right rows
sorted first at equal timestamps (so a right row AT the left timestamp
matches). ONE shuffle on the join key; no range self-join, no per-key
Python. Right rows must be unique per (key, ts) for determinism —
callers dedupe (e.g. max payload per key+ts) first; the operator
asserts nothing and composes with any upstream aggregation.

Row-atomicity: ALL right payload columns (plus the matched timestamp)
are packed into ONE struct before the window fill, so a right row whose
payload value is legitimately NULL still wins the as-of match as a unit
— the output never stitches columns from different right rows, matching
native ASOF semantics even with nullable right payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampType
from pyspark.sql.window import Window

# reserved struct-field name for the matched right timestamp; prefixed
# so it cannot collide with ordinary payload columns (and guarded below)
_RT_FIELD = "__asof_rt"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> DataFrame:
    """left (key, left_ts, ...) ⟕asof right (key, right_ts, ...) ->
    left columns + right payload columns of the most recent right row
    with right_ts <= left_ts per key. ``how``: 'inner' or 'left'."""
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}")
    l_payload = [c for c in left.columns if c != key]
    r_payload = [c for c in right.columns if c not in (key, right_ts)]
    if _RT_FIELD in r_payload:
        raise ValueError(
            f"right payload column {_RT_FIELD!r} collides with the "
            "as-of join's matched-timestamp field; rename it"
        )
    # One struct carries the whole right row (payload + matched ts):
    # last(struct, ignorenulls) fills rows atomically, never per-column.
    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in r_payload]
        + [StructField(_RT_FIELD, TimestampType())]
    )
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),  # left rows sort AFTER right rows at ties
        *[F.col(c).alias(f"_l_{c}") for c in l_payload],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in l_payload],
        F.struct(
            *[F.col(c).alias(c) for c in r_payload],
            F.col(right_ts).cast("timestamp").alias(_RT_FIELD),
        ).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tag.unionByName(r_tag).select(
        "_k", "_t", "_side",
        *[F.col(f"_l_{c}") for c in l_payload],
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    out = filled.filter(F.col("_side") == 1).select(
        F.col("_k").alias(key),
        F.col("_t").alias(left_ts),
        *[F.col(f"_l_{c}").alias(c) for c in l_payload if c != left_ts],
        *[F.col("_r")[c].alias(c) for c in r_payload],
        F.col("_r")[_RT_FIELD].alias(f"{right_ts}_matched"),
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_ts}_matched").isNotNull())
    return out
