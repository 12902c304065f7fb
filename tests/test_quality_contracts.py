"""Parts 18-20 semantics: the expectations audit must COUNT injected
violations (not just pass on clean data), the merge law must hold,
and the sequence/modularity math is pinned on hand cases."""

import os
import tempfile

from pyspark.sql import functions as F


def test_expectations_clean_data_all_zero(spark, sf_dir_oracle):
    from ndvi_etl_pipeline_spark.plans.catalog.part18_quality_contracts import (
        q_data_quality_expectations,
    )

    rows = {r.check_name: r.n_violations for r in q_data_quality_expectations(
        spark, sf_dir_oracle).collect()}
    assert len(rows) == 7
    assert all(v == 0 for v in rows.values()), rows


def test_expectations_detect_injected_violations(spark, sf_dir):
    """Doctor the tables: a duplicate PK, a negative price, a bad
    status, an orphan lineitem, an out-of-range discount — the audit
    must count each exactly."""
    from ndvi_etl_pipeline_spark.plans.catalog.part18_quality_contracts import (
        q_data_quality_expectations,
    )
    from ndvi_etl_pipeline_spark.sources.testdata import load_table

    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    first = o.limit(1)
    bad_orders = (
        o.unionAll(first)  # duplicate PK (+1 excess row)
        .unionAll(
            first.select(
                F.lit(10**12).alias("o_orderkey"),
                "o_custkey",
                F.lit("X").alias("o_orderstatus"),  # bad domain
                F.lit(-5.0).alias("o_totalprice"),  # nonpositive price
                "o_orderdate",
                "o_orderpriority",
            )
        )
    )
    orphan = li.limit(1).withColumn("l_orderkey", F.lit(10**13))
    bad_li = li.unionAll(orphan).unionAll(
        li.limit(1).withColumn("l_discount", F.lit(0.9))
    )
    with tempfile.TemporaryDirectory() as td:
        bad_orders.write.mode("overwrite").parquet(os.path.join(td, "orders.parquet"))
        bad_li.write.mode("overwrite").parquet(os.path.join(td, "lineitem.parquet"))
        rows = {
            r.check_name: r.n_violations
            for r in q_data_quality_expectations(spark, td).collect()
        }
    assert rows["orders_pk_duplicates"] == 1
    assert rows["orders_nonpositive_price"] == 1
    assert rows["orders_status_domain"] == 1
    assert rows["lineitem_fk_orphans"] == 1
    assert rows["lineitem_discount_range"] == 1
    assert rows["orders_null_key"] == 0


def test_incremental_merge_law_holds(spark, sf_dir_oracle):
    from ndvi_etl_pipeline_spark.plans.catalog.part18_quality_contracts import (
        q_incremental_agg_maintenance,
    )

    rows = q_incremental_agg_maintenance(spark, sf_dir_oracle).collect()
    assert rows
    for r in rows:
        assert r.count_merges and r.sum_merges and r.minmax_merges


def test_sampled_contract_sample_share(spark, sf_dir_oracle):
    from ndvi_etl_pipeline_spark.plans.catalog.part18_quality_contracts import (
        q_sampled_estimate_contract,
    )

    rows = q_sampled_estimate_contract(spark, sf_dir_oracle).collect()
    assert rows
    n_t = sum(r.n_total for r in rows)
    n_s = sum(r.n_samp for r in rows)
    assert 0.05 < n_s / n_t < 0.15  # ~10% hash sample
    # CLT 95% intervals: expect the large majority to cover
    assert sum(1 for r in rows if r.within_ci) >= len(rows) - 1


def test_frequent_sequences_hand_case(spark):
    from pyspark.sql import Window

    # user 1: a, b, a  → supports a→b, b→a, (a before b AND b before a)
    # user 2: a, b     → supports a→b only
    rows = [
        (1, 1, 100, "a"), (2, 1, 200, "b"), (3, 1, 300, "a"),
        (4, 2, 100, "a"), (5, 2, 200, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, t BIGINT, event_type STRING"
    ).withColumn("ts", F.timestamp_micros(F.col("t") * 1000000)).drop("t")
    pos = ev.select(
        "user_id", "event_type",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("p"),
    )
    spans = pos.groupBy("user_id", "event_type").agg(
        F.min("p").alias("first_p"), F.max("p").alias("last_p")
    )
    a = spans.select("user_id", F.col("event_type").alias("sa"), "first_p")
    b = spans.select("user_id", F.col("event_type").alias("sb"), "last_p")
    sup = {
        (r.sa, r.sb): r.c
        for r in a.join(b, "user_id")
        .where((F.col("sa") != F.col("sb")) & (F.col("first_p") < F.col("last_p")))
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert sup[("a", "b")] == 2
    assert sup[("b", "a")] == 1  # only user 1 has b before a (the final a)


def test_modularity_two_cliques(spark):
    """Two brand-pure co-purchase cliques → strongly positive Q;
    perfectly mixed brands → Q == 0 by symmetry."""
    from ndvi_etl_pipeline_spark.operators.recsys import basket_pairs

    # baskets: {1,2,3} twice (brand A items), {4,5,6} twice (brand B)
    rows = [(b, i) for b in (10, 11) for i in (1, 2, 3)] + [
        (b, i) for b in (20, 21) for i in (4, 5, 6)
    ]
    baskets = spark.createDataFrame(rows, "basket INT, item INT")
    edges = basket_pairs(baskets, min_co=2).select("i", "j")
    lbl = spark.createDataFrame(
        [(i, "A" if i <= 3 else "B") for i in range(1, 7)], "item INT, c STRING"
    )
    el = (
        edges.join(lbl.withColumnRenamed("item", "i").withColumnRenamed("c", "ci"), "i")
        .join(lbl.withColumnRenamed("item", "j").withColumnRenamed("c", "cj"), "j")
    )
    m = el.count()
    intra = el.where(F.col("ci") == F.col("cj")).count()
    assert m == 6 and intra == 6  # two 3-cliques, all intra-brand
    # Q = sum_c (e_c/m - (d_c/2m)^2) = 2*(0.5 - 0.25) = 0.5
    # (each community: 3 intra edges of 6, degree sum 6 of 12)
    q = 2 * (3 / 6 - (6 / 12) ** 2)
    assert abs(q - 0.5) < 1e-12
