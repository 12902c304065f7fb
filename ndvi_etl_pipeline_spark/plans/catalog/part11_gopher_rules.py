"""Catalog part 11 — Gopher repetition rules (Rae et al. 2021,
appendix A1.1).

The repetition-based quality filters every large-scale LLM corpus
pipeline applies (MassiveText/Gopher, reused by Chinchilla, LLaMA,
RefinedWeb): per-document word-n-gram repetition mass (heaviest
n-gram for n=2..4, all duplicated n-grams for n=5..10) and the
within-document duplicate-line census, plus the threshold filter
that turns the stats into keep/reject decisions. Builders delegate
to operators/selection.py; every oracle replays the exact
arithmetic in DuckDB (same tokenization, same occurrence-mass
definition, same round-before-compare thresholds)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...operators import selection as SEL
from ._shared import _t, register

_TOP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8, 9, 10)

# Published Gopher thresholds (Rae et al. 2021 table A1): a document
# is removed when the fraction exceeds the limit. Ordered — the
# filter reports the FIRST violated rule. Owned by the operator
# layer so the streaming gate applies the identical policy.
_THRESHOLDS = SEL.GOPHER_THRESHOLDS

_TOK_SQL = "string_split_regex(lower(trim(text)), '\\s+')"


def _stats_sql() -> str:
    """The gopher_repetition_stats oracle as a reusable SELECT."""
    piv_cols = ", ".join(
        [
            f"max(CASE WHEN n = {n} THEN top_cov END) AS top{n}_cov"
            for n in _TOP_NS
        ]
        + [
            f"max(CASE WHEN n = {n} THEN dup_cov END) AS dup{n}_cov"
            for n in _DUP_NS
        ]
    )
    frac_cols = ", ".join(
        [
            f"round(CAST(coalesce(top{n}_cov, 0) AS DOUBLE) / t.total_chars, 6)"
            f" AS top{n}_frac"
            for n in _TOP_NS
        ]
        + [
            f"round(CAST(coalesce(dup{n}_cov, 0) AS DOUBLE) / t.total_chars, 6)"
            f" AS dup{n}_frac"
            for n in _DUP_NS
        ]
    )
    all_ns = ", ".join(str(n) for n in (*_TOP_NS, *_DUP_NS))
    return f"""
    WITH tok AS (
      SELECT doc_id, length(trim(text)) AS total_chars,
             {_TOK_SQL} AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    ns AS (SELECT unnest([{all_ns}]) AS n),
    grams AS (
      SELECT doc_id, n,
             unnest(list_transform(
               range(1, greatest(len(w) - n + 1, 0) + 1),
               i -> array_to_string(w[i:i+n-1], ' '))) AS g
      FROM tok CROSS JOIN ns
    ),
    cnt AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY doc_id, n, g),
    cov AS (
      SELECT doc_id, n, max(c * length(g)) AS top_cov,
             sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dup_cov
      FROM cnt GROUP BY doc_id, n
    ),
    piv AS (SELECT doc_id, {piv_cols} FROM cov GROUP BY doc_id)
    SELECT t.doc_id, CAST(t.total_chars AS INT) AS total_chars, {frac_cols}
    FROM tok t LEFT JOIN piv USING (doc_id)
    """


@register(
    "gopher_repetition_stats",
    oracle=_stats_sql(),
    tags=("selection", "documents", "gopher"),
)
def q_gopher_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher A1.1 repetition mass per document: heaviest-n-gram
    fraction (n=2,3,4) and duplicated-n-gram fraction (n=5..10) over
    word n-grams. One explode feeding doc_id-keyed aggregations —
    no corpus-wide shuffle on raw n-gram text (contrast the
    cross-corpus exact-substring census `exact_substring_dups`)."""
    return SEL.gopher_repetition_stats(_t(spark, sf_dir, "documents"))


def _filter_sql() -> str:
    chain = "CASE "
    for col, thr in _THRESHOLDS:
        chain += f"WHEN {col} > {thr} THEN '{col}' "
    chain += "ELSE 'kept' END"
    return f"""
    WITH stats AS ({_stats_sql()})
    SELECT {chain} AS reject_reason, CAST(count(*) AS INT) AS n_docs
    FROM stats GROUP BY 1
    """


@register(
    "gopher_repetition_filter",
    oracle=_filter_sql(),
    tags=("selection", "documents", "gopher"),
)
def q_gopher_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher removal decision: first violated repetition rule
    per document (published table-A1 thresholds), censused by
    reason. Compares the ROUNDED stats columns so both engines
    threshold the exact same IEEE values."""
    stats = SEL.gopher_repetition_stats(_t(spark, sf_dir, "documents"))
    return (
        stats.select(SEL.gopher_reject_reason().alias("reject_reason"))
        .groupBy("reject_reason")
        .agg(F.count("*").cast("int").alias("n_docs"))
    )


@register(
    "gopher_dup_segments",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOK_SQL} AS w FROM documents
      WHERE len({_TOK_SQL}) >= 2
    ),
    segs AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) // 2 + 1),
               i -> array_to_string(w[(i-1)*2+1:(i-1)*2+2], ' '))) AS seg
      FROM tok
    ),
    cnt AS (SELECT doc_id, seg, count(*) AS c FROM segs GROUP BY doc_id, seg)
    SELECT doc_id,
           CAST(sum(c) AS INT) AS n_segments,
           CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS INT) AS dup_segments,
           round(CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
                 / sum(c), 6) AS dup_seg_frac,
           round(CAST(sum(CASE WHEN c >= 2 THEN c * length(seg) ELSE 0 END) AS DOUBLE)
                 / sum(c * length(seg)), 6) AS dup_char_frac
    FROM cnt GROUP BY doc_id
    """,
    tags=("selection", "documents", "gopher"),
)
def q_gopher_dup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-segment census (the Gopher
    duplicate-line fraction, positional segmenter — this corpus has
    no newlines). Entirely doc_id-keyed: zero corpus-wide shuffle
    on segment text."""
    return SEL.dup_segment_stats(_t(spark, sf_dir, "documents"), seg_len=2)


def _bpe_oracle(k: int = 8) -> str:
    """Unrolled BPE-trajectory replay (the _kmeans_chain /_pca_chain
    discipline). Per round: lead() pairs over the per-word symbol
    rows, argmax pair by (count DESC, l, r), greedy non-overlapping
    application via runs-of-consecutive-candidates (take every other
    position inside a run — exactly the left-to-right fold the Spark
    operator computes with `aggregate`)."""
    finals = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS merge_rank, l AS lhs, r AS rhs,"
        f" c AS pair_count FROM m{i}"
        for i in range(1, k + 1)
    )
    return f"""
    WITH {_bpe_chain(k)}
    {finals}
    """


def _bpe_steps(k: int) -> list[str]:
    steps = []
    for i in range(1, k + 1):
        p = i - 1
        steps.append(f"""nxt{i} AS MATERIALIZED (
      SELECT word, cnt, pos, sym,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nsym
      FROM st{p}),
    m{i} AS MATERIALIZED (
      SELECT sym AS l, nsym AS r, CAST(sum(cnt) AS BIGINT) AS c
      FROM nxt{i} WHERE nsym IS NOT NULL
      GROUP BY sym, nsym ORDER BY c DESC, l ASC, r ASC LIMIT 1),
    c{i} AS MATERIALIZED (
      SELECT n.word, n.pos FROM nxt{i} n, m{i} m
      WHERE n.sym = m.l AND n.nsym = m.r),
    r{i} AS MATERIALIZED (
      SELECT word, pos,
             pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS rid
      FROM c{i}),
    sel{i} AS MATERIALIZED (
      SELECT word, pos FROM (
        SELECT word, pos, min(pos) OVER (PARTITION BY word, rid) AS p0
        FROM r{i})
      WHERE (pos - p0) % 2 = 0),
    app{i} AS MATERIALIZED (
      SELECT n.word, n.cnt, n.pos,
             CASE WHEN s1.pos IS NOT NULL THEN n.sym || n.nsym ELSE n.sym END AS sym,
             (s2.pos IS NOT NULL) AS absorbed
      FROM nxt{i} n
      LEFT JOIN sel{i} s1 ON s1.word = n.word AND s1.pos = n.pos
      LEFT JOIN sel{i} s2 ON s2.word = n.word AND s2.pos = n.pos - 1),
    st{i} AS MATERIALIZED (
      SELECT word, cnt,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
      FROM app{i} WHERE NOT absorbed)""")
    return steps


def _bpe_chain(k: int) -> str:
    """WITH-body prefix ending at st{k} (the trained vocab state) and
    m1..m{k} (the merge rounds) — shared by the training oracle and
    the serving (fertility) oracle."""
    steps = _bpe_steps(k)
    chain = ",\n    ".join(steps)
    return f"""tokw AS MATERIALIZED (
      SELECT w AS word, count(*) AS cnt FROM (
        SELECT unnest({_TOK_SQL}) AS w FROM documents) GROUP BY w),
    st0p AS MATERIALIZED (
      SELECT word, cnt, unnest(range(1, length(word) + 2)) AS pos FROM tokw),
    st0 AS MATERIALIZED (
      SELECT word, cnt, CAST(pos AS BIGINT) AS pos,
             CASE WHEN pos <= length(word)
                  THEN substr(word, CAST(pos AS INT), 1) ELSE '</w>' END AS sym
      FROM st0p),
    {chain}"""


@register(
    "bpe_merge_training",
    oracle=_bpe_oracle(8),
    tags=("selection", "iterative", "documents"),
)
def q_bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016), 8 merges: the
    5th iterative-family member (operators/iterate.py). State is
    vocabulary-sized; each round = one vocab-bounded shuffle + a
    1-row argmax collect + a map-side greedy fold. The oracle
    replays the full 8-round trajectory with window functions —
    merge table value-checked exactly, not rows-only."""
    return SEL.bpe_merges(_t(spark, sf_dir, "documents"), n_merges=8)


@register(
    "bpe_token_census",
    oracle=f"""
    WITH {{chain}},
    wlen AS MATERIALIZED (
      SELECT word, CAST(count(*) AS INT) AS n_sym FROM st8 GROUP BY word),
    dw AS (
      SELECT doc_id, unnest({{tok}}) AS word FROM documents)
    SELECT dw.doc_id,
           CAST(count(*) AS INT) AS n_words,
           CAST(sum(w.n_sym) AS INT) AS n_bpe_tokens,
           round(CAST(sum(w.n_sym) AS DOUBLE) / count(*), 6) AS fertility
    FROM dw JOIN wlen w USING (word)
    GROUP BY dw.doc_id
    """.format(chain="__CHAIN__", tok=_TOK_SQL).replace("__CHAIN__", _bpe_chain(8)),
    tags=("selection", "iterative", "documents"),
)
def q_bpe_token_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve the trained BPE: per-document word count, BPE token
    count, and fertility (tokens/word incl. the </w> terminal).
    Serving is a broadcast join of the vocabulary-sized word→n_sym
    table onto the exploded corpus — the corpus is never
    re-segmented. Oracle extends the same 8-round trajectory chain
    to the final vocab state st8."""
    return SEL.bpe_token_stats(_t(spark, sf_dir, "documents"), n_merges=8)


# BM25 parameters (Robertson/Sparck-Jones defaults; idf in the
# Lucene ln(1 + (N-df+0.5)/(df+0.5)) form so it is always positive).
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("spark", "window", "merge")


@register(
    "bm25_topk",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest({_TOK_SQL}) AS w FROM documents),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS MATERIALIZED (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, w AS term, count(*) AS tf FROM tok
      WHERE w IN {_BM25_TERMS!r} GROUP BY doc_id, w),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    idf AS (
      SELECT term, ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf
      FROM df CROSS JOIN stats s),
    scored AS (
      SELECT tf.doc_id,
             sum(idf.idf * tf.tf * ({_BM25_K1} + 1.0)
                 / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * dl.dl / s.avgdl))) AS score,
             count(*) AS n_terms_hit
      FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
      GROUP BY tf.doc_id)
    SELECT doc_id, CAST(n_terms_hit AS INT) AS n_terms_hit,
           round(score, 6) AS score, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
      FROM scored)
    WHERE rank <= 20
    """,
    tags=("selection", "documents", "retrieval"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson et al.; Lucene idf form) for
    a 3-term query. The query-term filter lands BEFORE the tf
    aggregation, so the per-term relation is |terms|-bounded; N and
    avgdl are scalar aggregates broadcast via cross join; top-k is
    sort+limit (TakeOrderedAndProject). Rank on the ROUNDED score so
    both engines order identical IEEE values."""
    d = _t(spark, sf_dir, "documents")
    from ...functions.text import tokens as _toks

    tok = d.select("doc_id", F.explode(_toks("text")).alias("w"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats.select("n_docs"))).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("idf")
                * F.col("tf")
                * (_BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    from ...operators.rank import global_ranked

    # sort+limit FIRST (TakeOrderedAndProject, distributed), then the
    # rank runs over the 20-row result via global_ranked — never a
    # global single-partition window (dsir_importance_topk discipline).
    rounded = scored.select(
        "doc_id",
        F.col("n_terms_hit").cast("int").alias("n_terms_hit"),
        F.round(F.col("score"), 6).alias("score"),
    )
    top = rounded.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)
    return global_ranked(
        top, [("score", "desc"), "doc_id"], row_number="irank"
    ).select(
        "doc_id", "n_terms_hit", "score", F.col("irank").cast("int").alias("rank")
    )


@register(
    "unimax_language_budget",
    oracle=f"""
    WITH lt AS MATERIALIZED (
      SELECT lang, CAST(sum(len({_TOK_SQL})) AS BIGINT) AS cap
      FROM documents GROUP BY lang),
    tot AS (SELECT 0.5 * sum(cap) AS budget, count(*) AS k FROM lt),
    s AS (
      SELECT lang, cap,
             row_number() OVER (ORDER BY cap ASC, lang ASC) AS idx,
             coalesce(sum(cap) OVER (ORDER BY cap ASC, lang ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_prev
      FROM lt),
    lam AS (
      SELECT min(CASE WHEN s_prev + cap * (t.k - idx + 1) >= t.budget
                      THEN idx END) AS i0
      FROM s CROSS JOIN tot t),
    lvl AS (
      SELECT CASE WHEN lam.i0 IS NULL THEN NULL
                  ELSE (t.budget - s.s_prev) / (t.k - lam.i0 + 1) END AS lvl
      FROM lam LEFT JOIN s ON s.idx = lam.i0 CROSS JOIN tot t)
    SELECT s.lang, s.cap,
           round(CASE WHEN lvl.lvl IS NULL OR s.cap <= lvl.lvl
                      THEN CAST(s.cap AS DOUBLE) ELSE lvl.lvl END, 4) AS alloc,
           round(CASE WHEN lvl.lvl IS NULL OR s.cap <= lvl.lvl
                      THEN 1.0 ELSE lvl.lvl / s.cap END, 6) AS sampling_rate
    FROM s CROSS JOIN lvl
    """,
    tags=("selection", "documents", "mixture"),
)
def q_unimax_language_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax-style language budgeting (Chung et al. 2023): spend a
    token budget (50% of the corpus) across languages so no language
    is over-sampled — the exact water-filling level λ with
    alloc_l = min(cap_l, λ), Σ alloc = budget, found in closed form
    on the capacity-sorted prefix sums. The per-language capacity
    table is |langs| rows; everything after the one token-count
    aggregation is scalar-scale. Water-level math is identical
    window algebra in both engines."""
    from ...functions.text import token_count
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    lt = d.groupBy("lang").agg(
        F.sum(token_count(F.lower(F.trim(F.col("text"))))).cast("bigint").alias("cap")
    )
    tot = lt.agg(
        (F.lit(0.5) * F.sum("cap")).alias("budget"), F.count("*").alias("k")
    )
    w = W.orderBy(F.asc("cap"), F.asc("lang"))
    s = lt.select(
        "lang",
        "cap",
        F.row_number().over(w).alias("idx"),
        F.coalesce(
            F.sum("cap").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("s_prev"),
    )
    sc_ = s.crossJoin(F.broadcast(tot))
    lam = sc_.agg(
        F.min(
            F.when(
                F.col("s_prev") + F.col("cap") * (F.col("k") - F.col("idx") + 1)
                >= F.col("budget"),
                F.col("idx"),
            )
        ).alias("i0")
    )
    lvl = (
        lam.join(s, lam["i0"] == s["idx"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.when(
                F.col("i0").isNull(), F.lit(None).cast("double")
            )
            .otherwise(
                (F.col("budget") - F.col("s_prev"))
                / (F.col("k") - F.col("i0") + 1)
            )
            .alias("lvl")
        )
    )
    keep = F.col("lvl").isNull() | (F.col("cap") <= F.col("lvl"))
    return s.crossJoin(F.broadcast(lvl)).select(
        "lang",
        "cap",
        F.round(
            F.when(keep, F.col("cap").cast("double")).otherwise(F.col("lvl")), 4
        ).alias("alloc"),
        F.round(
            F.when(keep, F.lit(1.0)).otherwise(F.col("lvl") / F.col("cap")), 6
        ).alias("sampling_rate"),
    )


@register(
    "theta_sketch_setops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    x AS (
      SELECT (SELECT count(*) FROM a) AS n_a,
             (SELECT count(*) FROM b) AS n_b,
             (SELECT count(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS n_union,
             (SELECT count(*) FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)) AS n_inter,
             (SELECT count(*) FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)) AS n_diff)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_union AS BIGINT) AS n_union,
           CAST(n_inter AS BIGINT) AS n_inter,
           CAST(n_diff AS BIGINT) AS n_diff,
           TRUE AS union_within_5pct, TRUE AS inter_within_5pct,
           TRUE AS diff_within_5pct
    FROM x
    """,
    tags=("approx", "events"),
)
def q_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Apache DataSketches, native in Spark 4) — the
    approximate-DISTINCT tier with FULL SET ALGEBRA, which HLL cannot
    do: estimate |A|, |B|, |A∪B|, |A∩B|, |A∖B| of two event types'
    user sets from two mergeable sketches. At 100 TB the sketches
    aggregate map-side and merge associatively (bytes move, not
    user_ids); intersection estimation is the capability that
    otherwise needs a full shuffle join. Sketch registers differ
    across engines, so the CONTRACT is checked (estimates within ±5%
    of exact, computed in-plan — the approx_distinct_stats pattern);
    the exact counts are the hash-matched columns."""
    e = _t(spark, sf_dir, "events")
    sk = e.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("sk_a"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("sk_b"),
        F.count_distinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("n_a"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_b"),
        F.count_distinct(
            F.when(
                F.col("event_type").isin("click", "purchase"), F.col("user_id")
            )
        ).alias("n_union"),
    )
    ab = e.filter(F.col("event_type").isin("click", "purchase")).groupBy(
        "user_id"
    ).agg(F.count_distinct("event_type").alias("k"))
    inter = ab.agg(
        F.sum(F.when(F.col("k") == 2, 1).otherwise(0)).alias("n_inter")
    )
    est = sk.crossJoin(F.broadcast(inter)).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("n_union").cast("bigint").alias("n_union"),
        F.col("n_inter").cast("bigint").alias("n_inter"),
        (F.col("n_a") - F.col("n_inter")).cast("bigint").alias("n_diff"),
        F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")).alias("e_union"),
        F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b")).alias(
            "e_inter"
        ),
        F.theta_sketch_estimate(F.theta_difference("sk_a", "sk_b")).alias(
            "e_diff"
        ),
    )
    pct = lambda est_c, ex_c: (  # noqa: E731
        F.abs(est_c - ex_c.cast("double")) <= 0.05 * F.greatest(ex_c.cast("double"), F.lit(1.0))
    )
    return est.select(
        "n_a",
        "n_b",
        "n_union",
        "n_inter",
        "n_diff",
        pct(F.col("e_union"), F.col("n_union")).alias("union_within_5pct"),
        pct(F.col("e_inter"), F.col("n_inter")).alias("inter_within_5pct"),
        pct(F.col("e_diff"), F.col("n_diff")).alias("diff_within_5pct"),
    )


@register(
    "triangle_count_graph",
    oracle="""
    WITH raw AS (
      SELECT (o_custkey % 25) AS src, (l_suppkey % 25) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE least(src, dst) < greatest(src, dst)),
    tri AS (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM e e1 JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    pernode AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
    SELECT CAST(node AS BIGINT) AS node,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM pernode GROUP BY node
    """,
    tags=("graph",),
)
def q_triangle_count_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts on the 25-node customer-bucket →
    supplier-bucket graph (the pagerank_graph relation). Compact-
    forward orientation: each triangle materialized once as a<b<c,
    wedge volume bounded by the low→high out-degrees; see
    operators/graph.py:triangle_counts."""
    from ...operators.graph import triangle_counts

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        (F.col("o_custkey") % 25).cast("bigint").alias("src"),
        (F.col("l_suppkey") % 25).cast("bigint").alias("dst"),
    )
    return triangle_counts(edges)


@register(
    "kll_quantile_contract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS exact_p50,
           round(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS exact_p90,
           TRUE AS p50_within_rank_2pct, TRUE AS p90_within_rank_2pct
    FROM events GROUP BY event_type
    """,
    tags=("approx", "events"),
)
def q_kll_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches (Apache DataSketches, native in Spark 4)
    per event type — the mergeable-quantile tier: sketches combine
    associatively map-side, so a 100 TB percentile is one partial
    agg, no global sort. The KLL guarantee is on RANK error (k=200 →
    ~1.65% normalized rank error), not value error, so the contract
    computed in-plan checks the sketch's p50/p90 estimates against
    the exact p48..p52 / p88..p92 value bands; the hash-matched
    columns are the exact percentiles."""
    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.kll_sketch_agg_double("value").alias("sk"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile(value, 0.9)").alias("exact_p90"),
        F.expr("percentile(value, 0.48)").alias("lo50"),
        F.expr("percentile(value, 0.52)").alias("hi50"),
        F.expr("percentile(value, 0.88)").alias("lo90"),
        F.expr("percentile(value, 0.92)").alias("hi90"),
    )
    est50 = F.kll_sketch_get_quantile_double("sk", F.lit(0.5))
    est90 = F.kll_sketch_get_quantile_double("sk", F.lit(0.9))
    return agg.select(
        "event_type",
        "n",
        F.round(F.col("exact_p50"), 4).alias("exact_p50"),
        F.round(F.col("exact_p90"), 4).alias("exact_p90"),
        ((est50 >= F.col("lo50")) & (est50 <= F.col("hi50"))).alias(
            "p50_within_rank_2pct"
        ),
        ((est90 >= F.col("lo90")) & (est90 <= F.col("hi90"))).alias(
            "p90_within_rank_2pct"
        ),
    )


# Gopher word-level rules (Rae et al. 2021 A1.1, first block) —
# bounds adapted only where the synthetic corpus makes the
# published constant degenerate (min_words 50→5: these docs are
# short), noted per rule. Ordered; first violated wins.
_GOPHER_WORD_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "gopher_word_rules",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             len({_TOK_SQL}) AS n_words,
             CAST(length(replace(array_to_string({_TOK_SQL}, ''), '#', ''))
                  AS DOUBLE)
               / greatest(length(array_to_string({_TOK_SQL}, '')), 1) AS nonhash_frac,
             CAST(length(array_to_string({_TOK_SQL}, '')) AS DOUBLE)
               / greatest(len({_TOK_SQL}), 1) AS mean_word_len,
             len(list_filter({_TOK_SQL},
                 w -> list_contains({list(_GOPHER_WORD_STOPWORDS)!r}, w)))
               AS n_stop
      FROM documents),
    cls AS (
      SELECT doc_id,
             CASE WHEN n_words < 5 THEN 'too_few_words'
                  WHEN n_words > 100000 THEN 'too_many_words'
                  WHEN mean_word_len < 2 THEN 'mean_word_len_low'
                  WHEN mean_word_len > 10 THEN 'mean_word_len_high'
                  WHEN nonhash_frac < 0.9 THEN 'symbol_ratio'
                  WHEN n_stop < 2 THEN 'stopword_rule'
                  ELSE 'kept' END AS reject_reason
      FROM s)
    SELECT reject_reason, CAST(count(*) AS INT) AS n_docs
    FROM cls GROUP BY reject_reason
    """,
    tags=("selection", "documents", "gopher"),
)
def q_gopher_word_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher A1.1 word-level quality rules: word-count bounds
    (min adapted 50→5 for this short-doc corpus), mean word length
    in [2,10] (published 3→2: the synthetic vocab has legitimate
    1-2-char tokens), symbol-to-word ratio via '#' mass (the
    published hash/ellipsis rule), and the ≥2-stopword rule over
    the paper's 8-word list. Pure per-doc column math — no
    explode, no shuffle except the final census groupBy."""
    from ...functions.text import tokens as _toks

    d = _t(spark, sf_dir, "documents")
    t = _toks("text")
    joined = F.concat_ws("", t)
    sw = F.array(*[F.lit(w) for w in _GOPHER_WORD_STOPWORDS])
    s = d.select(
        F.size(t).alias("n_words"),
        (
            F.length(F.regexp_replace(joined, "#", "")).cast("double")
            / F.greatest(F.length(joined), F.lit(1))
        ).alias("nonhash_frac"),
        (
            F.length(joined).cast("double")
            / F.greatest(F.size(t), F.lit(1))
        ).alias("mean_word_len"),
        F.size(F.filter(t, lambda w: F.array_contains(sw, w))).alias("n_stop"),
    )
    reason = (
        F.when(F.col("n_words") < 5, F.lit("too_few_words"))
        .when(F.col("n_words") > 100000, F.lit("too_many_words"))
        .when(F.col("mean_word_len") < 2, F.lit("mean_word_len_low"))
        .when(F.col("mean_word_len") > 10, F.lit("mean_word_len_high"))
        .when(F.col("nonhash_frac") < 0.9, F.lit("symbol_ratio"))
        .when(F.col("n_stop") < 2, F.lit("stopword_rule"))
        .otherwise(F.lit("kept"))
    )
    return (
        s.select(reason.alias("reject_reason"))
        .groupBy("reject_reason")
        .agg(F.count("*").cast("int").alias("n_docs"))
    )


def _morton_sql(x: str, y: str, bits: int) -> str:
    """DuckDB replay of operators/scale.py:morton_key — identical
    interleave; disjoint bit positions let + stand in for OR."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


@register(
    "zorder_skip_census",
    oracle=f"""
    WITH base AS (
      SELECT l_orderkey, (l_partkey % 1024) AS x, ((l_suppkey * 10) % 1024) AS y
      FROM lineitem),
    m AS (
      SELECT ({_morton_sql('x', 'y', 10)} >> 12) AS zgroup,
             CAST(floor(l_orderkey / 250.0) AS BIGINT) AS agroup,
             (x BETWEEN 96 AND 159 AND y BETWEEN 192 AND 255) AS hit
      FROM base)
    SELECT 'zorder' AS layout,
           CAST(count(DISTINCT zgroup) AS BIGINT) AS total_groups,
           CAST(count(DISTINCT CASE WHEN hit THEN zgroup END) AS BIGINT)
             AS touched_groups,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_matched,
           round(CAST(count(DISTINCT CASE WHEN hit THEN zgroup END) AS DOUBLE)
                 / count(DISTINCT zgroup), 6) AS touch_frac
    FROM m
    UNION ALL
    SELECT 'arrival',
           CAST(count(DISTINCT agroup) AS BIGINT),
           CAST(count(DISTINCT CASE WHEN hit THEN agroup END) AS BIGINT),
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT),
           round(CAST(count(DISTINCT CASE WHEN hit THEN agroup END) AS DOUBLE)
                 / count(DISTINCT agroup), 6)
    FROM m
    """,
    tags=("layout", "lineitem"),
)
def q_zorder_skip_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantify the Z-order layout win (operators/scale.py:
    morton_key / write_zordered — the table-format-free Delta/
    Iceberg Z-ORDER BY): bucket rows into "row groups" by the top
    morton bits (64×64 tiles) vs by arrival order, and count groups
    a 64×64 bbox predicate touches in each layout. The z-layout
    touches ~1 tile; arrival order touches nearly every group —
    exactly the min/max-stats pruning gap at 100 TB. Pure bit math
    (shift/mask/or), codegen'd, replayed bit-identically in the
    oracle."""
    from ...operators.scale import morton_key

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        (F.col("l_partkey") % 1024).alias("x"),
        ((F.col("l_suppkey") * 10) % 1024).alias("y"),
    )
    m = base.select(
        F.shiftright(morton_key("x", "y", bits=10), 12).alias("zgroup"),
        F.floor(F.col("l_orderkey") / 250.0).cast("bigint").alias("agroup"),
        (
            F.col("x").between(96, 159) & F.col("y").between(192, 255)
        ).alias("hit"),
    )

    def census(gcol: str, name: str) -> DataFrame:
        return m.agg(
            F.lit(name).alias("layout"),
            F.count_distinct(F.col(gcol)).cast("bigint").alias("total_groups"),
            F.count_distinct(F.when(F.col("hit"), F.col(gcol)))
            .cast("bigint")
            .alias("touched_groups"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_rows_matched"),
            F.round(
                F.count_distinct(F.when(F.col("hit"), F.col(gcol))).cast("double")
                / F.count_distinct(F.col(gcol)),
                6,
            ).alias("touch_frac"),
        )

    return census("zgroup", "zorder").unionAll(census("agroup", "arrival"))
