"""Property tests for the part-12/13 operators: randomized inputs
against pure-Python references (the test_properties.py discipline,
smaller example counts since each example drives a Spark job)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ndvi_etl_pipeline_spark.operators.scale import with_hilbert_key
from ndvi_etl_pipeline_spark.operators.trees import variance_splits


def test_hilbert_consecutive_positions_are_grid_neighbors(spark):
    """The locality property the layout census banks on: consecutive
    curve positions differ by exactly one grid step (|dx|+|dy| = 1)
    — true for Hilbert, false for Z-order at every seam."""
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    rows = with_hilbert_key(df, "x", "y", bits=5).collect()
    by_d = {r.hilbert: (r.x, r.y) for r in rows}
    for d in range(1023):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 1000)),
        min_size=2,
        max_size=30,
    )
)
def test_countmin_overestimates_any_multiset(spark, kv):
    """est >= true for every key, on arbitrary integer multisets —
    the one-sided CM guarantee, via the same affine hash family as
    catalog part12."""
    from ndvi_etl_pipeline_spark.plans.catalog.part12_recsys_trees import (
        _CM_HASHES,
        _CM_P,
        _CM_W,
    )

    freq = spark.createDataFrame(
        [(k, c) for k, c in kv], "k BIGINT, c BIGINT"
    ).groupBy("k").agg(F.sum("c").alias("c"))
    hs = spark.createDataFrame(list(_CM_HASHES), "r INT, a BIGINT, b BIGINT")
    cells = freq.crossJoin(F.broadcast(hs)).select(
        "k", "c", "r",
        (((F.col("a") * F.col("k") + F.col("b")) % _CM_P) % _CM_W).alias("col"),
    )
    counters = cells.groupBy("r", "col").agg(F.sum("c").alias("cnt"))
    est = (
        cells.join(counters, ["r", "col"]).groupBy("k").agg(F.min("cnt").alias("est"))
    )
    out = {r.k: r.est for r in est.collect()}
    true = {}
    for k, c in kv:
        true[k] = true.get(k, 0) + c
    for k, t in true.items():
        assert out[k] >= t


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 9),
            st.floats(-100, 100, allow_nan=False, allow_infinity=False),
        ),
        min_size=4,
        max_size=40,
    )
)
def test_variance_splits_equal_bruteforce(spark, pts):
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x DOUBLE, y DOUBLE"
    )
    got = {
        r.threshold: r.gain
        for r in variance_splits(df, F.col("x"), F.col("y"), 1.0).collect()
    }

    def sse(ys):
        if not ys:
            return 0.0
        m = sum(ys) / len(ys)
        return sum((v - m) ** 2 for v in ys)

    ys = [y for _, y in pts]
    for t in got:
        left = [y for x, y in pts if x < t]
        right = [y for x, y in pts if x >= t]
        assert left and right  # splits with an empty side are excluded
        expect = (sse(ys) - sse(left) - sse(right)) / len(ys)
        assert math.isclose(got[t], expect, rel_tol=1e-6, abs_tol=1e-6)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 5)),
        min_size=4,
        max_size=40,
    ).filter(lambda v: len({y for y, _ in v}) == 2)
)
def test_auc_rank_formula_equals_pairwise(spark, data):
    """Mann-Whitney with average-rank ties == the brute-force pairwise
    P(score_pos > score_neg) + 0.5 P(=), on arbitrary tied integer
    scores."""
    import itertools

    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, y, float(s)) for i, (y, s) in enumerate(data)],
        "vec_id INT, y INT, score DOUBLE",
    )
    rk = df.select(
        "y",
        F.rank().over(Window.orderBy("score")).alias("r"),
        F.count("*").over(Window.partitionBy("score")).alias("c"),
    )
    u = rk.agg(
        F.sum(
            F.when(F.col("y") == 1, F.col("r") + (F.col("c") - 1) / 2.0)
        ).alias("rsum"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("np"),
        F.count("*").alias("nn"),
    ).collect()[0]
    auc = (u.rsum - u.np * (u.np + 1) / 2.0) / (u.np * (u.nn - u.np))

    pos = [s for y, s in data if y == 1]
    neg = [s for y, s in data if y == 0]
    expect = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    ) / (len(pos) * len(neg))
    assert math.isclose(auc, expect, rel_tol=1e-12, abs_tol=1e-12)
