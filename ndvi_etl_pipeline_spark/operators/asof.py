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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join; output = left columns + right_cols (nullable).

    ``direction='backward'`` (default): greatest right_ts ≤ left_ts.
    ``direction='forward'``: smallest right_ts ≥ left_ts (the stream
    sorts time-descending instead — same one-shuffle cost).
    ``direction='nearest'``: whichever of the two is closer in time,
    backward preferred on exact distance ties (pandas merge_asof
    parity) — BOTH candidates come from the SAME ascending sorted
    stream (backward = last-ignorenulls over preceding, forward =
    first-ignorenulls over following), so nearest still costs one
    shuffle + one window pass, not two joins.
    ``tolerance_seconds``: matches farther than this from left_ts are
    nulled out (pandas merge_asof's `tolerance`) — applied AFTER the
    window pass as a plain column predicate, so it costs nothing.
    `'_ts'` is reserved in right_cols (carries the matched timestamp).

    Equal-timestamp tie_break detail for ``nearest``: the backward
    candidate takes the MAX tie_break among same-ts right rows, the
    forward candidate the MIN (first-in-sort) — each side keeps its
    own direction's natural pick.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    left_cols = [c for c in left.columns]
    payload = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("_ts")
    ).alias("_asof_payload")

    # pandas-merge_asof parity on NULL timestamps: a right row with a
    # NULL right_ts never matches anything (unfiltered, it sorts FIRST
    # in the ascending window — nulls first — and its non-null payload
    # struct would become the fallback match for every left row).
    right = right.filter(F.col(right_ts).isNotNull())
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

    ts_order = (
        F.col("_asof_ts").desc() if direction == "forward" else F.col("_asof_ts").asc()
    )
    order = [ts_order, F.col("_asof_side").asc()]
    if tie_break is not None:
        # among right rows at the same (ts, side), sort tie_break ascending
        # so last() picks the max; left rows (null payload) are unaffected
        # because they are alone in their side group.
        order.append(F.col("_asof_payload")[tie_break].asc_nulls_first())
    w_base = Window.partitionBy(key).orderBy(*order)
    w = w_base.rowsBetween(Window.unboundedPreceding, 0)
    merged = r.unionByName(l).withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )

    def _gap(m, sign: int):
        # cast handles TIMESTAMP_NTZ / DATE ts columns; session tz is UTC
        g = F.unix_micros(F.col("_asof_ts").cast("timestamp")) - F.unix_micros(
            m["_ts"].cast("timestamp")
        )
        return g if sign > 0 else -g

    if direction == "nearest":
        # forward candidate from the SAME ascending stream: rows strictly
        # after this one. A right row at the exact left_ts sorts before
        # the left row (side 0 < 1) — missed here, but it is the
        # backward candidate with gap 0, which nearest prefers anyway.
        w_fwd = w_base.rowsBetween(1, Window.unboundedFollowing)
        merged = merged.withColumn(
            "_asof_fwd", F.first("_asof_payload", ignorenulls=True).over(w_fwd)
        )
        b, f = F.col("_asof_match"), F.col("_asof_fwd")
        match = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(_gap(b, 1) <= _gap(f, -1), b)  # ties → backward (pandas)
            .otherwise(f)
        )
        if tolerance_seconds is not None:
            gap_us = F.abs(
                F.unix_micros(F.col("_asof_ts").cast("timestamp"))
                - F.unix_micros(match["_ts"].cast("timestamp"))
            )
            match = F.when(gap_us <= tolerance_seconds * 1_000_000, match)
    else:
        match = F.col("_asof_match")
        if tolerance_seconds is not None:
            gap_us = _gap(match, 1 if direction == "backward" else -1)
            match = F.when(gap_us <= tolerance_seconds * 1_000_000, match)
    # a NULL left_ts matches nothing (under 'forward' it sorts LAST in
    # the descending stream and would otherwise pick up the global
    # minimum right_ts as a bogus match)
    match = F.when(F.col("_asof_ts").isNotNull(), match)
    out = merged.filter(F.col("_asof_side") == 1).select(
        key,
        *[c for c in left_cols if c != key],
        *[match[c].alias(c) for c in right_cols],
    )
    return out
