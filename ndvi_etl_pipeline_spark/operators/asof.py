"""As-of join — Spark has no native one; this is the scalable idiom.

Semantics: for each left row, attach the right row with the greatest
right_ts ≤ left_ts within the same key (ties broken by `tie_break`
descending), or NULLs if none precedes.

Implementation ("union trick", the standard distributed as-of shape —
cf. pandas merge_asof semantics, Flink temporal joins): interleave
both inputs into one stream sorted by (key, time, side), then carry
the latest right payload forward with last(ignorenulls) over an
unbounded-preceding window. Cost: ONE shuffle on the key + ONE sorted
window pass. The naive alternative — join on key with ts predicate +
rank — explodes to |left|·|orders per key| intermediate rows; this
stays linear, which is what makes it usable against 100 TB of events.

Right rows sort BEFORE left rows at equal timestamps (side flag 0 < 1),
so a right row exactly at left_ts matches (≤, not <).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join; output = left columns + right_cols (nullable)."""
    left_cols = [c for c in left.columns]
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload")

    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
        *[F.col(c) for c in left_cols if c != key],
    )

    order = [F.col("_asof_ts").asc(), F.col("_asof_side").asc()]
    if tie_break is not None:
        # among right rows at the same (ts, side), sort tie_break ascending
        # so last() picks the max; left rows (null payload) are unaffected
        # because they are alone in their side group.
        order.append(F.col("_asof_payload")[tie_break].asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = r.unionByName(l).withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_asof_side") == 1).select(
        key,
        *[c for c in left_cols if c != key],
        *[F.col("_asof_match")[c].alias(c) for c in right_cols],
    )
    return out
