"""Catalog part 18 — pipeline quality contracts.

Three contract-style censuses every production lake runs:

* **Expectations audit** (the Great-Expectations/dbt-test idiom):
  null keys, value ranges, primary-key uniqueness, referential
  integrity, set membership — one pass per table, one row per check
  with its violation count. At 100 TB each check is a count
  aggregate sharing the scan; the FK check is the only join and
  runs as a broadcast/shuffle anti-join.
* **Sampling-accuracy contract**: estimate a group mean from a
  deterministic 10% hash sample with a CLT 95% interval and check
  the exact value falls inside — the audit behind every
  sample-based dashboard at scale (scan 10% of the lake, bound the
  error, verify the bound on the slice where exact truth is
  affordable).
* **Incremental-aggregation maintenance**: the mergeability law
  agg(base ∪ delta) = merge(agg(base), agg(delta)) for
  count/sum/min/max (+ avg via sums), checked exactly — the
  property that makes incremental view maintenance and map-side
  partials correct, pinned as data rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._shared import _t, register


@register(
    "data_quality_expectations",
    oracle="""
    SELECT 'orders_null_key' AS check_name,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_price',
           CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_pk_duplicates',
           CAST(coalesce(sum(c - 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'orders_status_domain',
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orphans',
           CAST(count(*) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_date_bounds',
           CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1990-01-01'
                          OR l_shipdate > TIMESTAMP '2030-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    """,
    tags=("quality", "orders", "lineitem"),
)
def q_data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations audit: seven dbt-test-style checks as one census —
    null PK, price positivity, PK uniqueness (excess-row count),
    status domain, FK orphans (anti-join), discount range, ship-date
    bounds. The per-table checks share one scan each (Catalyst fuses
    the conditional sums); the FK check is the only join. A green
    lake returns all zeros — the row SHAPE is the contract, so the
    oracle validates the checks themselves, not just the happy
    path."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def chk(name: str, df: DataFrame, cnt) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"), cnt.cast("bigint").alias("n_violations")
        )

    rows = [
        chk("orders_null_key", o, F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))),
        chk(
            "orders_nonpositive_price",
            o,
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)),
        ),
        (
            o.groupBy("o_orderkey")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") > 1)
            .agg(
                F.lit("orders_pk_duplicates").alias("check_name"),
                F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("bigint").alias("n_violations"),
            )
        ),
        chk(
            "orders_status_domain",
            o,
            F.sum(F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)),
        ),
        (
            li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
            .agg(
                F.lit("lineitem_fk_orphans").alias("check_name"),
                F.count("*").cast("bigint").alias("n_violations"),
            )
        ),
        chk(
            "lineitem_discount_range",
            li,
            F.sum(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1).otherwise(0)
            ),
        ),
        chk(
            "lineitem_date_bounds",
            li,
            F.sum(
                F.when(
                    (F.col("l_shipdate") < F.lit("1990-01-01").cast("timestamp"))
                    | (F.col("l_shipdate") > F.lit("2030-01-01").cast("timestamp")),
                    1,
                ).otherwise(0)
            ),
        ),
    ]
    out = rows[0]
    for e in rows[1:]:
        out = out.unionAll(e)
    return out


@register(
    "sampled_estimate_contract",
    oracle="""
    WITH base AS (
      SELECT c_nationkey % 5 AS grp, o_totalprice AS y,
             (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT
              % 10 = 0) AS in_sample
      FROM orders JOIN customer ON o_custkey = c_custkey),
    exact AS (
      SELECT grp, avg(y) AS mu, CAST(count(*) AS BIGINT) AS n_total
      FROM base GROUP BY grp),
    samp AS (
      SELECT grp, avg(y) AS xbar,
             stddev_samp(y) AS sd,
             CAST(count(*) AS BIGINT) AS n_samp
      FROM base WHERE in_sample GROUP BY grp)
    SELECT s.grp AS grp,
           e.n_total, s.n_samp,
           round(e.mu, 2) AS exact_mean,
           round(s.xbar, 2) AS sample_mean,
           round(s.xbar - 1.96 * s.sd / sqrt(s.n_samp), 2) AS ci_low,
           round(s.xbar + 1.96 * s.sd / sqrt(s.n_samp), 2) AS ci_high,
           (e.mu >= s.xbar - 1.96 * s.sd / sqrt(s.n_samp)
            AND e.mu <= s.xbar + 1.96 * s.sd / sqrt(s.n_samp)) AS within_ci
    FROM samp s JOIN exact e ON e.grp = s.grp
    """,
    tags=("quality", "sampling", "orders"),
)
def q_sampled_estimate_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-based estimation with a verified error bound: group
    means from a deterministic 10%% md5-hash sample, CLT 95%%
    intervals, and a within_ci contract column checked against the
    exact means. The hash draw is bit-identical in both engines
    (the dp_noisy_counts uniform idiom), so sample membership —
    and therefore every statistic — replays exactly. At 100 TB the
    sampled branch reads 10%% of the data; the exact branch exists
    only on audit slices like this one."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
    )
    base = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        (F.col("c_nationkey") % 5).alias("grp"),
        F.col("o_totalprice").alias("y"),
        (u % 10 == 0).alias("in_sample"),
    )
    exact = base.groupBy("grp").agg(
        F.avg("y").alias("mu"), F.count("*").cast("bigint").alias("n_total")
    )
    samp = (
        base.where("in_sample")
        .groupBy("grp")
        .agg(
            F.avg("y").alias("xbar"),
            F.stddev_samp("y").alias("sd"),
            F.count("*").cast("bigint").alias("n_samp"),
        )
    )
    lo = F.col("xbar") - 1.96 * F.col("sd") / F.sqrt(F.col("n_samp"))
    hi = F.col("xbar") + 1.96 * F.col("sd") / F.sqrt(F.col("n_samp"))
    return samp.join(exact, "grp").select(
        "grp", "n_total", "n_samp",
        F.round("mu", 2).alias("exact_mean"),
        F.round("xbar", 2).alias("sample_mean"),
        F.round(lo, 2).alias("ci_low"),
        F.round(hi, 2).alias("ci_high"),
        ((F.col("mu") >= lo) & (F.col("mu") <= hi)).alias("within_ci"),
    )


@register(
    "incremental_agg_maintenance",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS k, l_quantity AS q FROM lineitem
      WHERE l_orderkey % 10 <> 0),
    delta AS (
      SELECT l_returnflag AS k, l_quantity AS q FROM lineitem
      WHERE l_orderkey % 10 = 0),
    direct AS (
      SELECT l_returnflag AS k, CAST(count(*) AS BIGINT) AS n,
             sum(l_quantity) AS s, min(l_quantity) AS mn, max(l_quantity) AS mx
      FROM lineitem GROUP BY 1),
    pb AS (SELECT k, CAST(count(*) AS BIGINT) AS n, sum(q) AS s,
                  min(q) AS mn, max(q) AS mx FROM base GROUP BY k),
    pd AS (SELECT k, CAST(count(*) AS BIGINT) AS n, sum(q) AS s,
                  min(q) AS mn, max(q) AS mx FROM delta GROUP BY k),
    merged AS (
      SELECT coalesce(pb.k, pd.k) AS k,
             coalesce(pb.n, 0) + coalesce(pd.n, 0) AS n,
             coalesce(pb.s, 0) + coalesce(pd.s, 0) AS s,
             least(coalesce(pb.mn, pd.mn), coalesce(pd.mn, pb.mn)) AS mn,
             greatest(coalesce(pb.mx, pd.mx), coalesce(pd.mx, pb.mx)) AS mx
      FROM pb FULL OUTER JOIN pd ON pb.k = pd.k)
    SELECT d.k AS flag, d.n AS n_rows,
           round(d.s, 2) AS sum_qty,
           round(d.s / d.n, 6) AS avg_qty,
           (d.n = m.n) AS count_merges,
           (round(d.s, 6) = round(m.s, 6)) AS sum_merges,
           (d.mn = m.mn AND d.mx = m.mx) AS minmax_merges
    FROM direct d JOIN merged m ON m.k = d.k
    """,
    tags=("quality", "incremental", "lineitem"),
)
def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, pinned as data: split the fact
    table into base + delta, aggregate each, MERGE the partial states
    (count/sum add, min/max combine, avg re-derived from sums), and
    compare against the direct aggregate per group. The merge
    booleans are the associativity law map-side combine and
    streaming-upsert sinks rely on; sum equality is compared after
    rounding since FP addition order legitimately differs between
    one-pass and merged evaluation."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.where(F.col("l_orderkey") % 10 != 0)
    delta = li.where(F.col("l_orderkey") % 10 == 0)

    def agg(df):
        return df.groupBy(F.col("l_returnflag").alias("k")).agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("l_quantity").alias("s"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        )

    direct = agg(li)
    pb, pd = agg(base), agg(delta)
    pbr = pb.select([F.col(c).alias(f"b_{c}") for c in pb.columns])
    pdr = pd.select([F.col(c).alias(f"d_{c}") for c in pd.columns])
    merged = (
        pbr.join(pdr, pbr["b_k"] == pdr["d_k"], "full_outer")
        .select(
            F.coalesce("b_k", "d_k").alias("k"),
            (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias("n"),
            (F.coalesce("b_s", F.lit(0.0)) + F.coalesce("d_s", F.lit(0.0))).alias("s"),
            F.least(
                F.coalesce("b_mn", "d_mn"), F.coalesce("d_mn", "b_mn")
            ).alias("mn"),
            F.greatest(
                F.coalesce("b_mx", "d_mx"), F.coalesce("d_mx", "b_mx")
            ).alias("mx"),
        )
    )
    mr = merged.select([F.col(c).alias(f"m_{c}") for c in merged.columns])
    return direct.join(mr, direct["k"] == mr["m_k"]).select(
        F.col("k").alias("flag"),
        F.col("n").alias("n_rows"),
        F.round("s", 2).alias("sum_qty"),
        F.round(F.col("s") / F.col("n"), 6).alias("avg_qty"),
        (F.col("n") == F.col("m_n")).alias("count_merges"),
        (F.round("s", 6) == F.round("m_s", 6)).alias("sum_merges"),
        ((F.col("mn") == F.col("m_mn")) & (F.col("mx") == F.col("m_mx"))).alias(
            "minmax_merges"
        ),
    )
