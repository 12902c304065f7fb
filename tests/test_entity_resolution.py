"""Entity-resolution tier semantics: blocking never loses an
under-threshold pair that shares a block, clustering is transitive,
and the fixpoint labelling the Spark side computes equals a
bounded-round replay (the oracle's 6-round assumption)."""

from pyspark.sql import functions as F

from ndvi_etl_pipeline_spark.operators.dedup import connected_components
from ndvi_etl_pipeline_spark.plans.catalog.part14_entity_resolution import (
    _ER_THRESHOLD,
    q_er_blocking_census,
    q_er_name_clusters,
)


def test_blocking_census_pair_math(spark, sf_dir_oracle):
    rows = {r.block: r for r in q_er_blocking_census(spark, sf_dir_oracle).collect()}
    total = rows.pop("ALL")
    assert total.cand_pairs == sum(r.cand_pairs for r in rows.values())
    for r in rows.values():
        assert r.cand_pairs == r.n_names * (r.n_names - 1) // 2
    n = total.n_names
    assert 0 < total.frac_of_full < 1
    assert abs(total.frac_of_full - total.cand_pairs / (n * (n - 1) / 2)) < 1e-6


def test_clusters_are_transitive_chain(spark):
    # a-b and b-c matched but a-c not directly: one cluster of 3
    e = spark.createDataFrame([(1, 2), (2, 3)], "src INT, dst INT")
    comp = {r.node: r.component for r in connected_components(e).collect()}
    assert comp == {1: 1, 2: 1, 3: 1}


def test_fixpoint_equals_six_round_replay(spark, sf_dir_oracle):
    """The er_name_clusters oracle unrolls 6 min-label rounds; assert
    the real match graph converges within that bound (i.e. the
    Spark fixpoint labelling equals the 6-round labelling)."""
    from ndvi_etl_pipeline_spark.plans.catalog._shared import _t

    names = (
        _t(spark, sf_dir_oracle, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").cast("bigint").alias("name_id"))
    )
    blk = names.select(
        "p_name", "name_id", F.split("p_name", " ").getItem(0).alias("block")
    )
    l = blk.select(F.col("name_id").alias("ida"), F.col("p_name").alias("a"), "block")
    r = blk.select(F.col("name_id").alias("idb"), F.col("p_name").alias("b"), "block")
    m = (
        l.join(r, "block")
        .where(F.col("a") < F.col("b"))
        .where(F.levenshtein("a", "b") <= _ER_THRESHOLD)
        .select(F.col("ida").alias("src"), F.col("idb").alias("dst"))
    )
    fix = {r.node: r.component for r in connected_components(m).collect()}

    # bounded replay: 6 synchronous min-label rounds
    edges = [(r.src, r.dst) for r in m.collect()]
    nodes = {n for e in edges for n in e}
    lbl = {n: n for n in nodes}
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
    for _ in range(6):
        nxt = dict(lbl)
        for n in nodes:
            for nb in adj.get(n, ()):
                if lbl[nb] < nxt[n]:
                    nxt[n] = lbl[nb]
        lbl = nxt
    assert fix == lbl


def test_cluster_census_consistency(spark, sf_dir_oracle):
    r = q_er_name_clusters(spark, sf_dir_oracle).collect()[0]
    assert r.n_clusters == r.n_singletons + r.n_multi_clusters
    assert r.n_names >= r.n_clusters
    assert r.max_cluster_size >= 1
