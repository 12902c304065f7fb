"""Distributed exact-rank mode (operators/rank.py): the two-pass
repartitionByRange + per-range-offset form must be BIT-IDENTICAL to
the single-partition global Window on every supported analytic, and
its plan must contain zero unpartitioned Window nodes and zero
SinglePartition exchanges (the ranged rows are pinned once by a lazy
localCheckpoint, so every branch reads the same partition ids)."""

import pyspark.sql.functions as F
import pytest

from ndvi_etl_pipeline_spark.operators.rank import (
    RANK_MODE_CONF,
    global_ranked,
)


def _rows(df):
    cols = sorted(df.columns)
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731 None-safe
    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=key)


def _plan(df) -> str:
    df.collect()  # materialize so AQE's final plan is the real one
    return df._jdf.queryExecution().executedPlan().toString()


def _mk(spark, n=500, ties=True):
    """Skewed keys with heavy ties (k % 7) so rank ties WOULD straddle
    range boundaries if RangePartitioning didn't co-locate equal keys."""
    return spark.range(n).select(
        (F.col("id") % 7).alias("k") if ties else F.col("id").alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") % 13).cast("long").alias("v"),
    )


ALL = dict(
    row_number="rn",
    rank="rk",
    dense_rank="dr",
    ntile={"nt5": 5, "nt3": 3},
    cume_dist="cd",
    percent_rank="pr",
    running_sums=None,  # filled per-call (Column objects)
    total_count="n_all",
)


def _both(spark, df, order, **kw):
    a = global_ranked(df, order, mode="single", **kw)
    b = global_ranked(df, order, mode="distributed", **kw)
    return a, b


def test_all_functions_bit_identical_with_ties(spark):
    df = _mk(spark, 500)
    kw = dict(ALL, running_sums={"rsum": F.col("v")})
    a, b = _both(spark, df, [("k", "desc"), "uid"], **kw)
    assert _rows(a) == _rows(b)


def test_lag_lead_total_sums_bit_identical(spark):
    """lag/lead handoff across range boundaries + global sums: a
    TOTAL order (uid is unique) so the previous/next row is uniquely
    defined; many partitions over few rows forces boundary rows (and
    empty ranges) to be the common case, not the corner."""
    df = _mk(spark, 97, ties=False)
    kw = dict(
        lag={"pv": F.col("v"), "pk": F.col("k")},
        lead={"nv": F.col("v")},
        total_sums={"tv": F.col("v"), "tn": F.lit(1)},
    )
    a = global_ranked(df, ["k"], mode="single", **kw)
    b = global_ranked(df, ["k"], mode="distributed", num_partitions=16, **kw)
    assert _rows(a) == _rows(b)
    # descending order flips which boundary is the handoff
    a = global_ranked(df, [("k", "desc")], mode="single", **kw)
    b = global_ranked(
        df, [("k", "desc")], mode="distributed", num_partitions=16, **kw
    )
    assert _rows(a) == _rows(b)


def test_running_max_excl_bit_identical(spark):
    """The dominance-sweep primitive (Pareto skyline): running max
    over all PRECEDING rows, excluding the current one — NULL on the
    global first row, and the cross-range combine must prefer the
    prefix max even when the local prefix is NULL (range-first rows)."""
    def rows(df):
        cols = sorted(df.columns)
        key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
        return sorted(
            (tuple(r[c] for c in cols) for r in df.collect()), key=key
        )

    df = _mk(spark, 200, ties=False)
    kw = dict(running_max_excl={"bm": F.col("v"), "bk": F.col("k")})
    a = global_ranked(df, ["k"], mode="single", **kw)
    b = global_ranked(df, ["k"], mode="distributed", num_partitions=16, **kw)
    assert rows(a) == rows(b)
    assert sum(1 for r in b.collect() if r.bm is None) == 1  # global first


def test_pareto_skyline_partition_invariant_distributed(spark):
    """pareto_skyline_2d routes its global sweep through
    global_ranked: distributed mode must return the identical skyline."""
    from ndvi_etl_pipeline_spark.operators.stats import pareto_skyline_2d

    pts = (
        spark.range(300)
        .select(
            (F.col("id") % 17).cast("double").alias("x"),
            ((F.col("id") * 7) % 23).cast("double").alias("y"),
        )
        .groupBy("x", "y")
        .count()
    )
    ref = _rows(pareto_skyline_2d(pts, "x", "y"))
    spark.conf.set(RANK_MODE_CONF, "distributed")
    try:
        got = pareto_skyline_2d(pts, "x", "y")
        rows = _rows(got)
        plan = _plan(got).split("== Initial Plan ==")[0]
    finally:
        spark.conf.unset(RANK_MODE_CONF)
    assert rows == ref
    for line in plan.splitlines():
        if "Window [" in line and "WindowGroupLimit" not in line:
            assert "__rank_pid" in line or "spark_partition_id" in line, line


def test_lag_lead_null_values_mid_stream(spark):
    """A NULL in the lagged column mid-order must surface as a NULL
    lag on the NEXT row (not be skipped), including when the NULL row
    is the last row of a range partition."""
    df = _mk(spark, 40, ties=False).select(
        "k",
        "uid",
        F.when(F.col("uid") % 3 == 0, None).otherwise(F.col("v")).alias("v"),
    )
    kw = dict(lag={"pv": F.col("v")}, lead={"nv": F.col("v")})
    a = global_ranked(df, ["k"], mode="single", **kw)
    b = global_ranked(df, ["k"], mode="distributed", num_partitions=13, **kw)
    assert _rows(a) == _rows(b)


def test_unique_keys_and_single_partition_input(spark):
    df = _mk(spark, 97, ties=False).coalesce(1)
    kw = dict(ALL, running_sums={"rsum": F.col("v")})
    a, b = _both(spark, df, ["k"], **kw)
    assert _rows(a) == _rows(b)


def test_ntile_more_buckets_than_rows(spark):
    df = _mk(spark, 4, ties=False)
    a, b = _both(spark, df, ["k"], ntile={"nt": 10})
    assert _rows(a) == _rows(b)
    assert {r.nt for r in b.collect()} == {1, 2, 3, 4}


def test_nulls_in_order_key(spark):
    df = _mk(spark, 60).select(
        F.when(F.col("uid") % 5 == 0, None).otherwise(F.col("k")).alias("k"),
        "uid",
        "v",
    )
    a, b = _both(
        spark, df, ["k", "uid"], row_number="rn", rank="rk", cume_dist="cd"
    )
    assert _rows(a) == _rows(b)


def test_running_sum_exact_integer_offsets(spark):
    df = _mk(spark, 300)
    a, b = _both(
        spark,
        df,
        ["k", "uid"],
        running_sums={"rs": F.col("v"), "rcnt": F.lit(1)},
    )
    assert _rows(a) == _rows(b)


def test_session_conf_dispatch(spark):
    df = _mk(spark, 50)
    spark.conf.set(RANK_MODE_CONF, "distributed")
    try:
        got = global_ranked(df, ["k", "uid"], row_number="rn")
        plan = _plan(got)
        assert "Scan ExistingRDD" in plan  # the distributed form ran
    finally:
        spark.conf.unset(RANK_MODE_CONF)
    ref = global_ranked(df, ["k", "uid"], row_number="rn", mode="single")
    assert _rows(ref) == _rows(got)


def test_distributed_plan_shape(spark):
    """The scale contract: no unpartitioned Window, no SinglePartition
    exchange, and the range exchange appears EXACTLY once (reused by
    the stats and offset branches — differing sampled boundaries
    between branches would corrupt the offsets, so this assertion is
    the canary)."""
    df = _mk(spark, 400)
    b = global_ranked(
        df,
        [("k", "desc"), "uid"],
        mode="distributed",
        row_number="rn",
        ntile={"nt": 5},
        running_sums={"rs": F.col("v")},
        total_count="n_all",
    )
    plan = _plan(b)
    final = plan.split("== Initial Plan ==")[0]  # AQE dump appends the
    # pre-adaptive plan too
    assert "SinglePartition" not in final
    # the ranged data is computed ONCE (lazy localCheckpoint): the
    # consumer plan reads the materialized RDD, it never re-samples
    # range boundaries per branch
    assert "Exchange rangepartitioning" not in final
    assert "Scan ExistingRDD" in final
    # every Window node is partition-local (partitionBy __rank_pid)
    for line in final.splitlines():
        if "Window [" in line and "WindowGroupLimit" not in line:
            assert "__rank_pid" in line, f"global window survived: {line}"


def test_default_mode_is_distributed(spark):
    """Round-10 flip: the default (no conf, no kwarg) is the
    distributed two-pass form — no SinglePartition exchange — and
    rankMode=single still selects the classic global window."""
    df = _mk(spark, 50)
    got = global_ranked(df, ["k", "uid"], row_number="rn")
    plan = _plan(got).split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    assert "Scan ExistingRDD" in plan  # the pinned ranged partitions
    spark.conf.set(RANK_MODE_CONF, "single")
    try:
        ref = global_ranked(df, ["k", "uid"], row_number="rn")
        ref_plan = ref._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset(RANK_MODE_CONF)
    assert "SinglePartition" in ref_plan
    assert _rows(ref) == _rows(got)


@pytest.mark.parametrize("n,parts", [(1, 4), (2, 8), (1000, 3)])
def test_partition_count_insensitive(spark, n, parts):
    df = _mk(spark, n)
    a = global_ranked(
        df, ["k", "uid"], mode="single", row_number="rn", ntile={"nt": 4}
    )
    b = global_ranked(
        df,
        ["k", "uid"],
        mode="distributed",
        num_partitions=parts,
        row_number="rn",
        ntile={"nt": 4},
    )
    assert _rows(a) == _rows(b)


from ndvi_etl_pipeline_spark.operators.rank import CLASS3_MEMBERS

CLASS3_PARITY = list(CLASS3_MEMBERS)


@pytest.mark.parametrize("name", CLASS3_PARITY)
def test_class3_catalog_parity_and_plan(spark, sf_dir, name):
    """The five round-7-verdict parity members: distributed rank mode
    must return BIT-IDENTICAL rows to the default single-partition
    form, and its executed plan must contain zero unpartitioned Window
    nodes and zero SinglePartition exchanges outside the final scalar
    aggregate the query itself returns."""
    from ndvi_etl_pipeline_spark.plans.catalog import REGISTRY

    q = REGISTRY[name].builder
    spark.conf.set(RANK_MODE_CONF, "single")
    try:
        ref_rows = _rows(q(spark, sf_dir))
    finally:
        spark.conf.unset(RANK_MODE_CONF)
    spark.conf.set(RANK_MODE_CONF, "distributed")
    try:
        got = q(spark, sf_dir)
        got_rows = _rows(got)
        plan = _plan(got).split("== Initial Plan ==")[0]
    finally:
        spark.conf.unset(RANK_MODE_CONF)
    assert got_rows == ref_rows
    # the audit's precise detector: a Window node with NO partition
    # spec (partitioned windows — __rank_pid locals, per-key windows
    # like count() OVER (PARTITION BY score) — are the scale-safe
    # shape and stay)
    from tools.audit_plans import _global_window_nodes

    assert _global_window_nodes(plan) == 0, f"{name}: global window survived"
