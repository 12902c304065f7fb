"""Randomized references for the recsys/graph operators, plus guard
tests for the local correctness checker's canonical form (the gate
all 600+ oracle comparisons run through)."""

import itertools
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ndvi_etl_pipeline_spark.operators.graph import bfs_distances
from ndvi_etl_pipeline_spark.operators.recsys import basket_pairs, rank1_als


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 8)),
        min_size=1,
        max_size=40,
    )
)
def test_basket_pairs_equal_bruteforce(spark, rows):
    df = spark.createDataFrame(rows, "basket INT, item INT")
    got = {
        (r.i, r.j): r.co for r in basket_pairs(df, min_co=1, max_basket=64).collect()
    }
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    expect = {}
    for items in baskets.values():
        for i, j in itertools.combinations(sorted(items), 2):
            expect[(i, j)] = expect.get((i, j), 0) + 1
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 8)),
        min_size=1,
        max_size=40,
    ),
    st.sets(st.integers(0, 8), max_size=4),
)
def test_basket_pairs_focus_strategies_agree(spark, rows, focus):
    """The array-level focus pushdown (pre-explode intersect, each
    retained pair emitted from exactly one endpoint) and the
    post-explode broadcast-join filter must both equal the
    brute-force restriction of the unrestricted pair counts to
    pairs touching the focus set — including both-endpoints-hot
    pairs (dedup correctness) and empty focus sets."""
    df = spark.createDataFrame(rows, "basket INT, item INT")
    fdf = spark.createDataFrame(
        [(f,) for f in sorted(focus)], "item INT"
    )
    got_arr = {
        (r.i, r.j): r.co
        for r in basket_pairs(
            df, min_co=1, max_basket=64, focus_items=fdf, focus_strategy="array"
        ).collect()
    }
    got_join = {
        (r.i, r.j): r.co
        for r in basket_pairs(
            df, min_co=1, max_basket=64, focus_items=fdf, focus_strategy="join"
        ).collect()
    }
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    expect = {}
    for items in baskets.values():
        for i, j in itertools.combinations(sorted(items), 2):
            if i in focus or j in focus:
                expect[(i, j)] = expect.get((i, j), 0) + 1
    assert got_arr == expect
    assert got_join == expect


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_bfs_matches_python_reference(spark, edges):
    df = spark.createDataFrame(edges, "src INT, dst INT")
    src = min(min(e) for e in edges)
    got = {r.node: r.dist for r in bfs_distances(df, src, max_hops=6).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {src: 0}
    frontier = [src]
    for d in range(1, 7):
        nxt = []
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.append(m)
        frontier = nxt
    assert got == dist


def test_als_first_step_closed_form(spark):
    """Round 1 with v0 = 1: u_i = Σr_ij / (λ + |items_i|), then
    v_j = Σr_ij·u_i / (λ + Σu_i²) — checked against hand math."""
    rows = [(1, 10, 4.0), (1, 11, 2.0), (2, 10, 6.0)]
    r = spark.createDataFrame(rows, "user INT, item INT, r DOUBLE")
    traj = rank1_als(r, rounds=1, lam=0.5).collect()[0]
    u1 = round((4.0 + 2.0) / (0.5 + 2.0), 6)  # user 1: two items
    u2 = round(6.0 / (0.5 + 1.0), 6)
    assert math.isclose(traj.sum_u, round(u1 + u2, 4), abs_tol=1e-9)
    v10 = round((4.0 * u1 + 6.0 * u2) / (0.5 + u1 * u1 + u2 * u2), 6)
    v11 = round((2.0 * u1) / (0.5 + u1 * u1), 6)
    assert math.isclose(traj.sum_v, round(v10 + v11, 4), abs_tol=1e-9)


# --- the checker's canonical form --------------------------------------


def _canon():
    import importlib.util
    import pathlib
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "_chk", root / "tools" / "check_correctness.py"
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("_chk", m)
    spec.loader.exec_module(m)
    return m.canon


def test_checker_distinguishes_signed_zero():
    """The strict gate property the mediation/warp fixes rely on:
    -0.0 and +0.0 canonicalize DIFFERENTLY (the driver's value-hash
    sees the sign even though -0.0 == 0.0)."""
    import pandas as pd

    canon = _canon()
    a = canon(pd.DataFrame({"x": [0.0]}))
    b = canon(pd.DataFrame({"x": [-0.0]}))
    assert a != b


def test_checker_catches_value_and_column_drift():
    import pandas as pd

    canon = _canon()
    base = pd.DataFrame({"a": [1, 2], "b": [0.5, 0.25]})
    same = pd.DataFrame({"b": [0.25, 0.5], "a": [2, 1]})  # row/col order only
    assert canon(base) == canon(same)
    assert canon(base) != canon(pd.DataFrame({"a": [1, 2], "b": [0.5, 0.2500001]}))
    # column-NAME drift is deliberately not canon's job — the checker
    # compares sorted column lists separately (check_correctness.py's
    # `columns spark=... duck=...` problem row); canon only fixes a
    # canonical value order given matching schemas
    assert canon(base) == canon(base.rename(columns={"b": "c"}))
