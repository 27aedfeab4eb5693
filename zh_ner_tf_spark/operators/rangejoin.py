"""Bucketed range join — point-in-interval joins without the
BroadcastNestedLoopJoin Spark plans for a bare inequality condition.

Catalyst turns ``p.x >= i.lo AND p.x < i.hi`` (no equi key) into a
nested-loop join: O(points x intervals) comparisons and a broadcast of
one whole side. The standard scalable composition instead quantizes the
domain into fixed-width buckets: each interval explodes into the
buckets it covers, each point owns exactly one bucket, and the match
becomes an EQUI join on bucket id followed by the exact containment
filter. Work drops to O(points + intervals x avg_span/width + matches),
shuffles hash-partition on bucket id, and AQE/salting handle hot
buckets like any other key. Choose ``width`` near the median interval
length (each interval then covers ~2 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    width: int,
) -> DataFrame:
    """points (…, point_col numeric) ⋈ intervals (…, [start, end))
    -> matched rows with all columns of both sides.

    ``width`` is the bucket size in the column's units. Interval
    semantics: closed-open [start, end); empty/negative intervals match
    nothing. Column names must not collide across the two inputs
    (callers alias; keeps the operator composition-friendly).
    """
    p = points.withColumn(
        "_b", F.floor(F.col(point_col).cast("double") / width).cast("bigint")
    )
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / width).cast("bigint"),
                # end is exclusive: a point at exactly `end` never matches,
                # so the last covered bucket is the one containing end-ulp;
                # floor(end/width) is a safe (at most +1 bucket) cover.
                F.floor(F.col(end_col).cast("double") / width).cast("bigint"),
            )
        ),
    ).filter(F.col(start_col) < F.col(end_col))
    return (
        p.join(i, "_b")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_b")
    )
