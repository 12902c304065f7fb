"""Catalog part 14 — entity resolution / record linkage.

The blocking → pairwise-scoring → clustering pipeline every
large-scale dedup-by-similarity system runs (Fellegi-Sunter record
linkage; the same shape as the MinHash near-dup tier but over
STRUCTURED identity fields with edit-distance scoring):

1. **Blocking** — a cheap deterministic key (here: first name token)
   so candidate generation is a per-block self-join, never the n²
   cross product. The census quantifies the reduction ratio — the
   number every ER deployment reports.
2. **Scoring** — Levenshtein edit distance on candidate pairs, both
   engines computing the identical classic DP metric.
3. **Clustering** — connected components over above-threshold
   matches (operators/dedup.py:connected_components), so transitive
   matches collapse to one entity.

Production trick mirrored here: scoring runs over the DISTINCT-name
dictionary (64 strings at sf0.01, ~exponentially fewer than rows),
then clusters broadcast back — at 100 TB the dictionary relation is
the only thing the quadratic stage ever sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ...operators.dedup import connected_components
from ._shared import _t, register

_ER_THRESHOLD = 4  # max edit distance for a match (part.p_name pairs)

_ER_BASE_SQL = """names AS MATERIALIZED (
      SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS name_id
      FROM part GROUP BY p_name),
    blk AS (
      SELECT p_name, name_id, string_split(p_name, ' ')[1] AS block
      FROM names),
    cand AS MATERIALIZED (
      SELECT l.p_name AS a, r.p_name AS b,
             l.name_id AS ida, r.name_id AS idb, l.block,
             levenshtein(l.p_name, r.p_name) AS dist
      FROM blk l JOIN blk r ON l.block = r.block AND l.p_name < r.p_name)"""


@register(
    "er_blocking_census",
    oracle=f"""
    WITH {_ER_BASE_SQL},
    per AS (
      SELECT block, CAST(count(*) AS BIGINT) AS n_names,
             CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS cand_pairs
      FROM blk GROUP BY block),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM names)
    SELECT block, n_names, cand_pairs,
           round(CAST(cand_pairs AS DOUBLE) / (n * (n - 1) / 2), 6)
             AS frac_of_full
    FROM per CROSS JOIN tot
    UNION ALL
    SELECT 'ALL', (SELECT n FROM tot),
           CAST(sum(cand_pairs) AS BIGINT),
           round(CAST(sum(cand_pairs) AS DOUBLE)
                 / (max(n) * (max(n) - 1) / 2), 6)
    FROM per CROSS JOIN tot
    """,
    tags=("entity-resolution", "part"),
)
def q_er_blocking_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-key census for record linkage on part names: per-block
    candidate-pair counts and the fraction of the full n² pair space
    each block (and the blocking scheme overall, row 'ALL') retains.
    The quadratic stage only ever sees the distinct-name dictionary;
    blocks bound the self-join fan-out exactly like the LSH band
    buckets in the MinHash tier."""
    names = (
        _t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").cast("bigint").alias("name_id"))
    )
    blk = names.select(
        "p_name", "name_id", F.split("p_name", " ").getItem(0).alias("block")
    )
    per = blk.groupBy("block").agg(
        F.count("*").cast("bigint").alias("n_names"),
        (F.count("*") * (F.count("*") - 1) / 2).cast("bigint").alias("cand_pairs"),
    )
    tot = names.agg(F.count("*").cast("bigint").alias("n"))
    full = per.crossJoin(tot)
    per_rows = full.select(
        "block", "n_names", "cand_pairs",
        F.round(
            F.col("cand_pairs").cast("double") / (F.col("n") * (F.col("n") - 1) / 2),
            6,
        ).alias("frac_of_full"),
    )
    total_row = full.agg(
        F.lit("ALL").alias("block"),
        F.max("n").alias("n_names"),
        F.sum("cand_pairs").cast("bigint").alias("cand_pairs"),
        F.round(
            F.sum("cand_pairs").cast("double")
            / (F.max("n") * (F.max("n") - 1) / 2),
            6,
        ).alias("frac_of_full"),
    )
    return per_rows.unionAll(total_row)


@register(
    "er_levenshtein_matches",
    oracle=f"""
    WITH {_ER_BASE_SQL}
    SELECT a, b, block, CAST(dist AS INT) AS dist
    FROM (
      SELECT c.*, row_number() OVER (ORDER BY dist, a, b) AS rk
      FROM cand c WHERE dist <= {_ER_THRESHOLD})
    WHERE rk <= 20
    """,
    tags=("entity-resolution", "part"),
)
def q_er_levenshtein_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise match scoring: Levenshtein edit distance over
    within-block candidate pairs, top-20 closest matches at the
    match threshold. Both engines run the identical classic DP
    metric, so distances are exact integers."""
    names = (
        _t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").cast("bigint").alias("name_id"))
    )
    blk = names.select(
        "p_name", F.split("p_name", " ").getItem(0).alias("block")
    )
    l = blk.select(F.col("p_name").alias("a"), "block")
    r = blk.select(F.col("p_name").alias("b"), "block")
    cand = (
        l.join(r, "block")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "block", F.levenshtein("a", "b").alias("dist"))
        .where(F.col("dist") <= _ER_THRESHOLD)
    )
    return (
        cand.withColumn(
            "rk",
            F.row_number().over(Window.orderBy("dist", "a", "b")),
        )
        .where(F.col("rk") <= 20)
        .select("a", "b", "block", F.col("dist").cast("int").alias("dist"))
    )


def _er_cluster_oracle(rounds: int = 6) -> str:
    steps = []
    prev = "s0"
    for k in range(1, rounds + 1):
        steps.append(
            f"""s{k} AS MATERIALIZED (
      SELECT node, min(lbl) AS lbl FROM (
        SELECT node, lbl FROM {prev}
        UNION ALL
        SELECT e.dst, s.lbl FROM {prev} s JOIN und e ON e.src = s.node)
      GROUP BY node)"""
        )
        prev = f"s{k}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH {_ER_BASE_SQL},
    m AS (SELECT ida, idb FROM cand WHERE dist <= {_ER_THRESHOLD}),
    und AS MATERIALIZED (
      SELECT ida AS src, idb AS dst FROM m
      UNION SELECT idb, ida FROM m),
    s0 AS (SELECT name_id AS node, name_id AS lbl FROM names),
    {chain},
    cl AS (SELECT lbl, CAST(count(*) AS BIGINT) AS sz
           FROM s{rounds} GROUP BY lbl)
    SELECT CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_names,
           CAST(max(sz) AS BIGINT) AS max_cluster_size,
           CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons,
           CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_clusters
    FROM cl
    """


@register(
    "er_name_clusters",
    oracle=_er_cluster_oracle(),
    tags=("entity-resolution", "iterative", "part"),
)
def q_er_name_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity clusters: connected components (min-label propagation,
    operators/dedup.py) over the above-threshold match graph, with
    unmatched names as singletons — the transitive-closure step that
    turns pairwise matches into entities. The Spark side iterates to
    the fixpoint; the oracle unrolls 6 rounds, more than the match
    graph's diameter, so both reach the identical converged
    labelling (asserted in tests/test_entity_resolution.py)."""
    names = (
        _t(spark, sf_dir, "part")
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
    comp = connected_components(m)
    matched = comp.select(F.col("node"), F.col("component").alias("lbl"))
    singles = (
        names.join(matched, names["name_id"] == matched["node"], "left_anti")
        .select(F.col("name_id").alias("node"), F.col("name_id").alias("lbl"))
    )
    cl = matched.unionAll(singles).groupBy("lbl").agg(
        F.count("*").cast("bigint").alias("sz")
    )
    return cl.agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_names"),
        F.max("sz").cast("bigint").alias("max_cluster_size"),
        F.sum(F.when(F.col("sz") == 1, 1).otherwise(0)).cast("bigint").alias("n_singletons"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).cast("bigint").alias("n_multi_clusters"),
    )
