"""Batch corpus-curation CLI: one command from a raw documents table
to token-packed training shards.

    python -m ndvi_etl_pipeline_spark.curate \
        --input /path/with/documents.parquet --out /path/curated

Composes the engine's selection/dedup/curation operators into the
published pipeline order (quality gate → Gopher repetition filter →
PII scrub → exact dedup → MinHash near-dup canonicalization → DSIR
weighting → packed shard write) and prints ONE JSON line with the
per-stage funnel counts — the batch twin of the streaming landing
drain (streaming/documents.py), sharing the identical operator layer
so both paths gate on the same policies.

Every stage is a lazy DataFrame transform; the only actions are the
near-dup clustering's bounded fixpoint rounds and the final shard
write. Scale notes live on the operators themselves (basket-capped
pair generation, banded LSH with skew-split, broadcast-sized model
state, range-partitioned shard assignment).
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import curation as CUR
from .operators import dedup as DD
from .operators import selection as SEL
from .operators.iterate import materialize
from .session import get_spark


def curate(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    neardup_threshold: float = 0.8,
    target_lang: str = "en",
    budget: int = 2048,
) -> dict:
    """Run the full curation funnel; returns the stage-count report."""
    from .functions.text import token_count

    path = (
        os.path.join(input_path, "documents.parquet")
        if os.path.isdir(input_path)
        else input_path
    )
    docs = spark.read.parquet(path)
    counts: dict[str, int] = {"raw": docs.count()}

    # 1. token-count quality gate
    gated = docs.withColumn("_n_tok", token_count("text")).where(
        F.col("_n_tok").between(min_tokens, max_tokens)
    )
    counts["quality"] = gated.count()

    # 2. Gopher repetition filter (published thresholds; shared with
    #    the streaming gate)
    stats = SEL.gopher_repetition_stats(gated.select("doc_id", "text"))
    kept_ids = stats.where(
        SEL.gopher_reject_reason() == "kept"
    ).select("doc_id")
    gophered = gated.join(kept_ids, "doc_id", "left_semi")
    counts["gopher"] = gophered.count()

    # 3. PII scrub (in-place redaction, pure codegen)
    scrubbed = gophered.withColumn("text", CUR.scrub_text(F.col("text")))

    # 4. exact dedup (content hash, keep min id)
    exact = DD.dedup_exact(scrubbed)
    counts["exact_dedup"] = exact.count()

    # 5. near-dup canonicalization: MinHash+LSH pairs → connected
    #    components → keep the min doc id per cluster
    exact = materialize(exact)
    pairs = DD.minhash_near_duplicates(
        exact, threshold=neardup_threshold
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = DD.connected_components(pairs)
    losers = (
        comp.groupBy("component")
        .agg(F.min("node").alias("keep"))
        .join(comp, "component")
        .where(F.col("node") != F.col("keep"))
        .select(F.col("node").alias("doc_id"))
    )
    canonical = exact.join(losers, "doc_id", "left_anti")
    counts["neardup_canonical"] = canonical.count()

    # 6. DSIR importance weights toward the target language
    weights = SEL.dsir_logweights(
        canonical, target_pred=F.col("lang") == F.lit(target_lang)
    )
    curated = canonical.join(
        weights.select("doc_id", "dsir_logweight"), "doc_id"
    ).drop("_n_tok")

    # 7. packed shards + verifiable manifest
    manifest = CUR.write_training_shards(curated, out_dir, budget=budget)
    mrows = manifest.collect()
    counts["shards"] = len(mrows)
    counts["packed_docs"] = int(sum(r.n_docs for r in mrows))
    counts["packed_tokens"] = int(sum(r.n_tokens for r in mrows))
    return counts


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="python -m ndvi_etl_pipeline_spark.curate",
        description="Raw documents parquet -> curated, packed training shards.",
    )
    ap.add_argument("--input", required=True, help="documents.parquet (or its dir)")
    ap.add_argument("--out", required=True, help="output shard directory")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-tokens", type=int, default=1000)
    ap.add_argument("--neardup-threshold", type=float, default=0.8)
    ap.add_argument("--target-lang", default="en")
    ap.add_argument("--budget", type=int, default=2048, help="tokens per shard bin")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="curate")
    t0 = time.time()
    counts = curate(
        spark,
        args.input,
        args.out,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        neardup_threshold=args.neardup_threshold,
        target_lang=args.target_lang,
        budget=args.budget,
    )
    counts["sec"] = round(time.time() - t0, 2)
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
