"""Corpus-curation operators for training-data pipelines.

The steps a 100 TB pretraining pipeline runs after dedup/quality
(operators/dedup.py, functions/text.py): deterministic train/eval
splitting, per-stratum sampling, PII/blockword scrubbing,
repetition-based quality rules, token-budget sequence packing, and
train→eval contamination checks.

Design rules (same as the rest of the engine):
- Everything is a lazy DataFrame transform — no collect, no driver
  loops; each operator is a plan fragment Catalyst fuses with its
  neighbors.
- Determinism comes from content hashes (md5), never from rand() or
  monotonically_increasing_id(), so results are stable across
  partitionings, retries, and cluster sizes — a hard requirement for
  reproducible dataset builds.
- Splits/sampling are per-row hash decisions (embarrassingly
  parallel, zero shuffles); packing shuffles once on the stream key;
  contamination shuffles on the n-gram hash (the join key whose
  cardinality we control via shingle size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens, word_shingles
from .iterate import scoped_persist


def hash_bucket(key: Column, buckets: int = 256) -> Column:
    """Deterministic [0, buckets) bucket from a content key.

    First 8 hex chars of md5 → int. Engine-portable (DuckDB computes
    the identical value for the oracle) and uniform; used for split
    assignment, sampling, and shard routing.
    """
    if buckets > 1 << 16:
        raise ValueError("hash_bucket supports up to 65536 buckets")
    hx = F.substring(F.md5(key.cast("string").cast("binary")), 1, 8)
    return (F.conv(hx, 16, 10).cast("bigint") % buckets).cast("int")


def mixture_keep(
    key: Column,
    group: Column,
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = 10000,
) -> Column:
    """Deterministic weighted subsampling toward a target mixture.

    True where the row survives sampling at its group's keep-rate
    (e.g. {'web': 0.25, 'code': 1.0}): hash-bucket of the content key
    compared against weight·buckets. Per-row expression — zero
    shuffles, stable under corpus growth and re-partitioning, and the
    kept set for a group at weight w is a SUBSET of the kept set at
    any w' > w (nested samples, so mixture re-weighs never resample
    disjoint rows).
    """
    b = hash_bucket(key, buckets)
    thr: Column = F.lit(int(round(default_weight * buckets)))
    for g, w in weights.items():
        thr = F.when(group == g, F.lit(int(round(w * buckets)))).otherwise(thr)
    return b < thr


def chunk_lengths(
    n_tokens: Column,
    window: int = 64,
    stride: int = 48,
) -> Column:
    """Token counts of the overlapping chunks a document splits into
    (RAG/embedding chunking bookkeeping): an ARRAY of
    ceil((n-window)/stride)+1 lengths, the last possibly short.

    Pure JVM array expression (sequence + transform) — callers explode
    it; no Python, no token materialization, so the chunk inventory of
    a 100 TB corpus is computed at scan speed.
    """
    n_chunks = F.when(n_tokens <= window, F.lit(1)).otherwise(
        F.ceil((n_tokens - window) / F.lit(float(stride))).cast("int") + 1
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.least(F.lit(window), n_tokens - i * stride),
    )


def assign_split(
    key: Column,
    eval_pct: int = 5,
    test_pct: int = 0,
    buckets: int = 100,
) -> Column:
    """Deterministic train/eval(/test) split on a stable key.

    A row's split never changes when the corpus grows — the standard
    hash-split contract (vs. rand() which reshuffles every run).
    """
    b = hash_bucket(key, buckets)
    out = F.when(b < eval_pct, F.lit("eval"))
    if test_pct:
        out = out.when(b < eval_pct + test_pct, F.lit("test"))
    return out.otherwise(F.lit("train"))


def weighted_sample_key(key: Column, weight: Column) -> Column:
    """Efraimidis–Spirakis weighted-sampling key: u^(1/w), u ∈ (0,1).

    Taking the k LARGEST keys draws a weighted random sample without
    replacement where inclusion probability follows the weights — the
    standard distributed/streaming reservoir algorithm (Efraimidis &
    Spirakis 2006): keys are independent per row, so the "reservoir"
    is just a global top-k, which Spark executes as per-partition
    top-k + tiny final merge (TakeOrderedAndProject) — no state, no
    single reducer, mergeable across streams/epochs.

    u derives from the md5 hash bucket (not rand()), so the sample is
    deterministic, replayable, and engine-portable — the same contract
    as `assign_split`.
    """
    hx = F.substring(F.md5(key.cast("string").cast("binary")), 1, 8)
    u = (F.conv(hx, 16, 10).cast("double") + 0.5) / F.lit(4294967296.0)
    return F.pow(u, 1.0 / weight)


def weighted_reservoir_sample(
    df: DataFrame, k: int, key_col: str, weight_col: str, out_key: str = "sample_key"
) -> DataFrame:
    """k-item weighted sample without replacement (largest ES keys).
    Deterministic tie-break on the id keeps the result total-ordered."""
    keyed = df.withColumn(
        out_key, weighted_sample_key(F.col(key_col), F.col(weight_col).cast("double"))
    )
    return keyed.orderBy(F.desc(out_key), F.col(key_col)).limit(k)


def epoch_shuffle(
    df: DataFrame, epoch: int, key_col: str, shards: int = 64
) -> DataFrame:
    """Deterministic per-epoch global training-order shuffle as
    (shard, pos): shard = hash(epoch, id) mod `shards`, pos = rank of
    hash(epoch, id) within the shard.

    This is how a 100 TB corpus gets a fresh, REPRODUCIBLE permutation
    every epoch with no global sort: the shard assignment is a
    map-side expression, and the within-shard rank is a window
    partitioned by shard — parallelism = `shards`, each sorting
    |corpus|/shards rows. Readers consume shards in order (shard-major,
    pos-minor) for the epoch's sequence; changing `epoch` re-deals
    everything while any single epoch's order is stable across reruns
    and engines (md5, not rand()).
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{epoch}:"), F.col(key_col).cast("string")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("_shard").orderBy("_h", key_col)
    return (
        df.withColumn("_h", h)
        .withColumn("_shard", (F.col("_h") % shards).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .withColumnRenamed("_shard", "shard")
        .drop("_h")
    )


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    k: int,
    key: str,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by content
    hash — deterministic "random" sampling.

    One shuffle (window partition on the strata). At scale the window
    never materializes a stratum in memory: rank is computed
    streaming over the sorted partition. For heavily-skewed strata a
    pre-filter `hash_bucket(key, N) < ceil(N * k / est_rows)` cuts
    the sorted volume first (cheap sargable guard, applied by the
    caller when stratum sizes are known).
    """
    order = F.md5(F.col(key).cast("string").cast("binary"))
    w = Window.partitionBy(*strata).orderBy(order, F.col(key))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("sample_rank")
    )


# Scrub patterns: identical semantics in Java regex (Spark) and RE2
# (DuckDB oracle) — word-boundary literal + digit runs. Real PII sets
# (emails, phones, SSNs) drop in as alternates with no plan change.
SCRUB_PATTERN = r"\bvalue\b|[0-9]{3,}"
SCRUB_TOKEN = "<scrub>"


def scrub_text(text: Column, pattern: str = SCRUB_PATTERN) -> Column:
    """Redact every pattern match with a fixed token. Pure codegen
    (regexp_replace is JVM-side); runs fused with the scan."""
    return F.regexp_replace(text, pattern, SCRUB_TOKEN)


def scrub_count(text: Column, pattern: str = SCRUB_PATTERN) -> Column:
    return F.regexp_count(text, F.lit(pattern))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document.

    - distinct_ratio: |distinct tokens| / |tokens|  (array expr, no
      shuffle — stays in whole-stage codegen)
    - top_ratio: occurrences of the most frequent token / |tokens|
      (explode → two-level aggregate; shuffle key is (doc, token),
      cardinality ≤ total token count, partial-agg combines repeats
      map-side so the shuffle carries distinct tokens per doc)

    Returns doc_id + both ratios + n_tok; callers threshold them
    (e.g. top_ratio > 0.2 → drop as boilerplate/spam).
    """
    toks = tokens(F.col(text_col))
    base = df.select(
        "doc_id",
        "source",
        toks.alias("toks"),
        F.size(toks).alias("n_tok"),
        (F.size(F.array_distinct(toks)).cast("double") / F.greatest(F.size(toks), F.lit(1))).alias(
            "distinct_ratio"
        ),
    )
    per_token = (
        base.select("doc_id", "source", "n_tok", "distinct_ratio", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "source", "n_tok", "distinct_ratio", "tok")
        .count()
    )
    return (
        per_token.groupBy("doc_id", "source", "n_tok", "distinct_ratio")
        .agg(F.max("count").alias("top_c"))
        .withColumn(
            "top_ratio",
            F.col("top_c").cast("double") / F.greatest(F.col("n_tok"), F.lit(1)),
        )
        .drop("top_c")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    stream_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming token-offset packing: within each stream (ordered by
    a stable key), documents are laid end-to-end and a document starts
    the bin its first token falls in: bin = floor(exclusive-cumsum /
    budget).

    One shuffle (window on stream_col). This is the contiguous-shard
    contract a sequence-packing writer needs — bin boundaries are a
    pure function of the ordered prefix sums, so any worker can
    recompute them; no coordination, no driver state. (Exact greedy
    first-fit packing is deliberately NOT used: it is
    order-dependent-but-gap-filling, which breaks determinism under
    re-partitioning for zero real gain at corpus scale.)
    """
    n_tok = token_count(F.col(text_col))
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return (
        df.withColumn("n_tok", n_tok)
        .withColumn("bin", F.floor(cum_before / budget).cast("int"))
    )


def contamination_check(
    docs: DataFrame,
    ngram: int = 8,
    eval_pct: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Train→eval leakage: eval documents sharing any n-token shingle
    with any train document.

    Plan shape: one scan → split column → shingle explode (hashed to
    64-bit keys) → semi-join eval-grams ⋉ train-grams on the gram
    hash. The join key is the shingle hash whose per-key cardinality
    is bounded by natural-language repetition; at 100 TB the heavy
    hitters (boilerplate grams) are exactly what AQE skew-split
    handles, and raising `ngram` lowers collision mass geometrically.

    Physical notes (measured, sf0.1):
    - the gram relation feeds BOTH join sides; without a persist the
      scan+explode subtree runs twice (ReusedExchange is not
      guaranteed under AQE) — persisting it halved wall-clock. At
      100 TB swap the memory persist for a parquet checkpoint of the
      (doc_id, split, gh) relation, which is also the natural
      incremental artifact when eval sets are rebuilt more often than
      the train corpus.
    - repartition by doc_id before the explode: corpus parquet that
      arrives in a handful of splits would otherwise serialize the
      whole shingle kernel (no-op on a real multi-file lake).
    - xxhash64 (bigint) instead of md5 (32-char string) for the join
      key: cheaper to compute, 4× narrower shuffle rows.
    """
    split = assign_split(F.col("doc_id"), eval_pct=eval_pct)
    base = docs.select(
        "doc_id", "source", split.alias("split"), F.col(text_col).alias("t")
    ).repartition("doc_id")
    g = scoped_persist(
        base.select(
            "doc_id",
            "source",
            "split",
            F.explode(word_shingles(tokens(F.col("t")), n=ngram)).alias("gram"),
        ).select("doc_id", "source", "split", F.xxhash64("gram").alias("gh")),
        "curation.contamination_check.grams",
    )
    train_g = g.filter(F.col("split") == "train").select("gh").distinct()
    eval_g = g.filter(F.col("split") == "eval")
    hits = eval_g.join(train_g, "gh", "left_semi")
    return hits.select("doc_id", "source").distinct()


def assign_contiguous_ids(
    df: DataFrame, order_col: str, id_col: str = "example_id", partitions: int | None = None
) -> DataFrame:
    """Assign dense 0..N-1 ids in `order_col` order, distributed.

    The naive `row_number() OVER (ORDER BY …)` is a single-task global
    sort — the classic 100 TB trap (every training-data pipeline needs
    example ids; none can afford one reducer). Two-pass instead:

    1. range-partition on the sort key (partitions are order-disjoint),
    2. count rows per partition and prefix-sum the counts with a
       triangular self-join over the |partitions|-row count relation
       (metadata-scale, broadcast both sides — no single-partition
       exchange anywhere in the plan),
    3. id = partition offset (broadcast-joined back on partition id)
       + local row_number within the partition.

    Global order holds because range partitions are disjoint and the
    window inside each partition sorts locally. The result is
    deterministic for a unique `order_col` regardless of partitioning.

    Fully lazy — no driver-side action at plan-build time. `ranged`
    is persisted (lazily) so the count branch and the id branch share
    ONE materialization of the same sampled range boundaries when the
    plan finally executes.
    """
    from pyspark.sql import Window

    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # persist so both branches reuse the SAME partitioning
    # (repartitionByRange samples; recomputation could re-draw bounds)
    ranged = scoped_persist(
        df.repartitionByRange(n, F.col(order_col)).withColumn(
            "_pid", F.spark_partition_id()
        ),
        "curation.assign_contiguous_ids.ranged",
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n"))
    prior = counts.select(F.col("_pid").alias("_qid"), F.col("_n").alias("_pn"))
    offsets = (
        counts.join(F.broadcast(prior), F.col("_qid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_pn"), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            id_col,
            (F.col("_off") + F.row_number().over(w) - 1).cast("bigint"),
        )
        .drop("_pid", "_off")
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    budget: int = 4096,
    stream_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The curation pipeline's END PRODUCT: documents → token-packed
    shards on disk + a verifiable manifest. Composes pack_sequences
    (deterministic bin assignment) with a partitioned parquet write
    (one directory per (stream, bin)) and returns the manifest:

        (stream, bin, n_docs, n_tokens, content_hash)

    content_hash is an order-independent XOR-fold of per-doc
    xxhash64(doc ‖ text) — any worker (or a later audit job) can
    recompute it from the shard files alone, so shard integrity is
    checkable without re-reading the source corpus. Everything is a
    pure function of corpus content: re-running on the same input
    yields byte-identical manifests regardless of partitioning.
    """
    packed = pack_sequences(
        df, budget, stream_col=stream_col, order_col=order_col, text_col=text_col
    ).persist()
    (
        packed.repartition(F.col(stream_col), F.col("bin"))
        .write.mode("overwrite")
        .partitionBy(stream_col, "bin")
        .parquet(out_dir)
    )
    doc_hash = F.xxhash64(F.col(order_col).cast("string"), F.col(text_col))
    manifest = (
        packed.groupBy(stream_col, "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            # XOR-fold: associative+commutative → partitioning-independent
            F.aggregate(
                F.collect_list(doc_hash), F.lit(0).cast("bigint"), lambda a, x: a.bitwiseXOR(x)
            ).alias("content_hash"),
        )
    )
    manifest.write.mode("overwrite").parquet(f"{out_dir}_manifest")
    packed.unpersist()
    return manifest


def expect(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """Declarative data-quality expectation suite: {name: boolean
    column} → one summary row per expectation with rows checked,
    violations (false OR null — an unknown is a failure, the strict
    reading), violation rate, and pass flag.

    All expectations evaluate in a SINGLE scan (one conditional
    aggregate per predicate, partial/final merged map-side), then
    unpivot to rows — adding an expectation never adds a pass over a
    100 TB table. The gate-don't-crash counterpart of the reference's
    inline asserts (SURVEY §5: V1/V2 download checks, grid-compat,
    empty-AOI): violations become data you can alert on, not
    exceptions that kill the job."""
    aggs = [F.count("*").cast("bigint").alias("_n_rows")]
    for name, pred in expectations.items():
        aggs.append(
            F.count_if(~F.coalesce(pred, F.lit(False)))
            .cast("bigint")
            .alias(name)
        )
    wide = df.agg(*aggs)
    names = list(expectations)
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return (
        wide.select(
            "_n_rows",
            F.expr(
                f"stack({len(names)}, {stack}) AS (expectation, n_violations)"
            ),
        )
        .select(
            "expectation",
            F.col("_n_rows").alias("n_rows"),
            "n_violations",
            F.round(F.col("n_violations") / F.col("_n_rows"), 6).alias(
                "violation_rate"
            ),
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
