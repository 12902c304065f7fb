"""Operator-level semantics tests for the part-12 tier: item-CF,
rank-1 ALS, decision stumps, count-min, BFS, Hilbert keys.

Each test pins the operator against an independently-computed
expectation (hand-enumerated small cases or a pure-Python reference
implementation), not against the oracle SQL — the oracle equivalence
is the sweep's job; these catch semantic regressions in the operator
itself."""

import math

import pytest
from pyspark.sql import functions as F

from ndvi_etl_pipeline_spark.operators.graph import bfs_distances
from ndvi_etl_pipeline_spark.operators.recsys import (
    item_similarity,
    rank1_als,
    user_item_scores,
)
from ndvi_etl_pipeline_spark.operators.scale import with_hilbert_key
from ndvi_etl_pipeline_spark.operators.trees import gini_splits, variance_splits


def test_item_similarity_hand_case(spark):
    # baskets: {1: a,b,c}, {2: a,b}, {3: a,c}, {4: b}  (items as ints)
    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 1), (3, 3), (4, 2)]
    b = spark.createDataFrame(rows, "basket INT, item INT")
    out = {(r.i, r.j): r for r in item_similarity(b).collect()}
    # co(a,b)=2, n_a=3, n_b=3 → cos = 2/3
    assert out[(1, 2)].co == 2
    assert abs(out[(1, 2)].cos - 2 / 3) < 1e-12
    # co(a,c)=2, n_c=2 → 2/sqrt(6)
    assert abs(out[(1, 3)].cos - 2 / math.sqrt(6)) < 1e-12
    # co(b,c)=1
    assert out[(2, 3)].co == 1


def test_item_similarity_basket_cap_drops_whole_basket(spark):
    rows = [(1, i) for i in range(5)] + [(2, 1), (2, 2)]
    b = spark.createDataFrame(rows, "basket INT, item INT")
    out = item_similarity(b, max_basket=4).collect()
    # only basket 2 survives → single pair (1,2) with co=1
    assert len(out) == 1 and (out[0].i, out[0].j, out[0].co) == (1, 2, 1)


def test_user_item_scores_excludes_owned(spark):
    b = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 2), (20, 3), (30, 1), (30, 3)],
        "user INT, item INT",
    )
    sims = item_similarity(
        b.withColumnRenamed("user", "basket")
    )
    recs = user_item_scores(b, sims).collect()
    owned = {(10, 1), (10, 2), (20, 2), (20, 3), (30, 1), (30, 3)}
    assert recs, "expected at least one recommendation"
    for r in recs:
        assert (r.user, r.cand) not in owned


def test_user_item_scores_exact_values(spark):
    """Pins the symmetrized scoring numerically (the explode-based
    symmetrization must count BOTH orientations of every sim pair,
    exactly once each — a regression here halves or doubles scores).
    Baskets {10: 1,2}, {20: 2,3}, {30: 1,3}: every pair has co=1 and
    n_i=n_j=2, so each sim cos = 0.5; user 10 should get candidate 3
    scored from both history items 1 and 2 → score 1.0, n_common 2."""
    b = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 2), (20, 3), (30, 1), (30, 3)],
        "user INT, item INT",
    )
    sims = item_similarity(b.withColumnRenamed("user", "basket"))
    recs = {(r.user, r.cand): r for r in user_item_scores(b, sims).collect()}
    assert set(recs) == {(10, 3), (20, 1), (30, 2)}
    for r in recs.values():
        assert r.n_common == 2
        assert abs(r.score - 1.0) < 1e-12


def test_basket_pairs_focus_join_guard_drops_disjoint_baskets(spark):
    """The basket-level semi-join guard in the 'join' focus path must
    not change retained-pair counts: baskets disjoint from the focus
    set contribute nothing, baskets containing a focus item keep ALL
    their focus-touching pairs (including pairs whose other endpoint
    is cold)."""
    from ndvi_etl_pipeline_spark.operators.recsys import basket_pairs

    rows = [
        (1, 1), (1, 2), (1, 3),   # contains focus item 1
        (2, 4), (2, 5),           # disjoint from focus — guard drops it
        (3, 1), (3, 5),           # contains focus item 1
    ]
    b = spark.createDataFrame(rows, "basket INT, item INT")
    focus = spark.createDataFrame([(1,)], "item INT")
    got = {
        (r.i, r.j): r.co
        for r in basket_pairs(
            b, min_co=1, max_basket=64, focus_items=focus, focus_strategy="join"
        ).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (1, 5): 1}


def test_rank1_als_rmse_decreases_and_fits_rank1(spark):
    # exactly rank-1 ratings r_ij = u_i * v_j → ALS should fit it
    users = [1.0, 2.0, 3.0]
    items = [2.0, 4.0]
    rows = [
        (i, j, users[i] * items[j]) for i in range(3) for j in range(2)
    ]
    r = spark.createDataFrame(rows, "user INT, item INT, r DOUBLE")
    traj = rank1_als(r, rounds=3, lam=1e-9).orderBy("step").collect()
    assert [t.step for t in traj] == [1, 2, 3]
    # monotone non-increasing RMSE, ending near zero for rank-1 data
    assert traj[0].rmse >= traj[1].rmse >= traj[2].rmse
    assert traj[-1].rmse < 0.01


def test_gini_splits_hand_case(spark):
    # feature buckets of width 1: values 0.5 (y=0 ×4), 1.5 (y=1 ×4)
    rows = [(0.5, 0)] * 4 + [(1.5, 1)] * 4
    df = spark.createDataFrame(rows, "x DOUBLE, y INT")
    out = gini_splits(df, F.col("x"), F.col("y"), 1.0).collect()
    assert len(out) == 1  # only the t=1.0 split has a non-empty right side
    s = out[0]
    # perfect split: root gini 0.5, children pure → gain 0.5
    assert s.threshold == 1.0 and s.n_left == 4 and s.n_right == 4
    assert abs(s.gain - 0.5) < 1e-12


def test_variance_splits_matches_bruteforce(spark):
    import itertools

    rows = [(float(x), float(y)) for x, y in
            [(1, 2), (2, 3), (3, 10), (4, 11), (5, 12), (6, 30)]]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    got = {r.threshold: r.gain for r in variance_splits(df, F.col("x"), F.col("y"), 1.0).collect()}

    def sse(ys):
        m = sum(ys) / len(ys)
        return sum((v - m) ** 2 for v in ys)

    ys = [y for _, y in rows]
    # spark threshold t = (bucket+1)*width puts x in [t-1, t) on the left
    # of split t, i.e. left side is x < t
    for t in (2.0, 3.0, 4.0, 5.0, 6.0):
        xs_l = [y for x, y in rows if x < t]
        xs_r = [y for x, y in rows if x >= t]
        expect = (sse(ys) - sse(xs_l) - sse(xs_r)) / len(ys)
        assert abs(got[t] - expect) < 1e-9, (t, got[t], expect)


def test_bfs_distances_path_graph(spark):
    # path 1-2-3-4-5 plus a shortcut 1-4
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src INT, dst INT"
    )
    d = {r.node: r.dist for r in bfs_distances(e, 1, max_hops=4).collect()}
    assert d == {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}


def test_bfs_hop_bound_truncates(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(6)], "src INT, dst INT")
    d = {r.node: r.dist for r in bfs_distances(e, 0, max_hops=2).collect()}
    assert d == {0: 0, 1: 1, 2: 2}  # nodes beyond 2 hops not reached


def _xy2d_ref(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_and_bijective(spark):
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    out = with_hilbert_key(df, "x", "y", bits=5).collect()
    assert all(r.hilbert == _xy2d_ref(32, r.x, r.y) for r in out)
    assert sorted(r.hilbert for r in out) == list(range(1024))


def test_hilbert_locality_beats_arrival_on_census(spark, sf_dir_oracle):
    """The catalog census's claim, asserted: a 2-D box predicate
    touches a smaller fraction of Hilbert-clustered groups than
    arrival-ordered groups. Runs at sf0.01 — the sf0.001 slice is too
    small for the query box to land any hits."""
    from ndvi_etl_pipeline_spark.plans.catalog.part12_recsys_trees import (
        q_hilbert_layout_census,
    )

    rows = {
        r.layout: r
        for r in q_hilbert_layout_census(spark, sf_dir_oracle).collect()
    }
    assert rows["hilbert"].touch_frac < rows["arrival"].touch_frac


def test_countmin_never_underestimates(spark, sf_dir):
    from ndvi_etl_pipeline_spark.plans.catalog.part12_recsys_trees import (
        q_countmin_frequency_contract,
    )

    rows = q_countmin_frequency_contract(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.est_cnt >= r.true_cnt  # the one-sided CM guarantee


def test_bfs_string_node_ids(spark):
    """The source cast follows the edge id type — string-id graphs
    must work, not silently null out (review finding)."""
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src STRING, dst STRING"
    )
    d = {r.node: r.dist for r in bfs_distances(e, "a", max_hops=3).collect()}
    assert d == {"a": 0, "b": 1, "c": 2}


def test_splits_exclude_null_features(spark):
    """Rows with null features carry no split information and must not
    leak into the left-side prefix sums (NULLS FIRST ordering)."""
    rows = [(0.5, 0)] * 4 + [(1.5, 1)] * 4 + [(None, 1)] * 3
    df = spark.createDataFrame(rows, "x DOUBLE, y INT")
    out = gini_splits(df, F.col("x"), F.col("y"), 1.0).collect()
    assert len(out) == 1
    s = out[0]
    assert s.n_left == 4 and s.n_right == 4  # the 3 null rows excluded
    assert abs(s.gain - 0.5) < 1e-12


def test_boosted_stumps_single_bucket_no_op(spark):
    """With one occupied bucket there is no valid split: the fallback
    keeps the constant model (prediction unchanged, mse reported)
    instead of annihilating the state (review finding)."""
    from ndvi_etl_pipeline_spark.operators.trees import boosted_stumps

    rows = [(0.1, 2.0), (0.2, 4.0), (0.3, 6.0)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    traj = (
        boosted_stumps(df, F.col("x"), F.col("y"), bucket_width=100.0, rounds=2)
        .orderBy("step")
        .collect()
    )
    assert len(traj) == 2
    # constant model: mse = population variance of y = 8/3
    for t in traj:
        assert t.mse is not None
        assert abs(t.mse - round(8 / 3, 4)) < 1e-6
        assert t.mean_left == 0.0 and t.mean_right == 0.0
