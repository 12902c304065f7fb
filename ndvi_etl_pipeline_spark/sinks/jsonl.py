"""Sharded JSONL export — the training-data handoff sink.

Tokenizer/training jobs consume newline-delimited JSON in
size-controlled gzip shards (small enough to stream, large enough to
amortize open costs; the convention every public corpus follows).
The writer is Spark's native JSON datasource — distributed,
schema-faithful, codec'd in the JVM — with the sharding made
deterministic:

- **shard id** = pmod(xxhash64(id), ceil(rows/target)) — a
  REPRODUCIBLE row→shard mapping (unlike round-robin repartition(n),
  hash-of-id survives re-runs and task retries — the idempotency
  rule the reference's upserts encode, load_to_postgis.py:163) with
  near-equal shard sizes regardless of id skew.
- **hive-layout shards** (`shard=K/part-*.json.gz`) written after a
  clustering repartition on the shard id, so every shard directory
  is exactly ONE gzip file and shards are individually addressable —
  a training consumer can open shard K without listing the corpus.

At 100 TB this is the same code: |shards| in the tens of thousands,
each task streaming one gzip member. Read-back is spark.read.json —
round-trip tested.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    target_records_per_shard: int = 100_000,
    compression: str = "gzip",
    known_count: int | None = None,
) -> int:
    """Write `df` as ~equal JSONL shards of ≤~target records each,
    deterministically sharded by hash of `id_col`. Returns the shard
    count. Pass `known_count` to skip the counting job when the
    caller already materialized the count (e.g. from an Observation
    metric on the upstream stage)."""
    n = known_count if known_count is not None else df.count()
    shards = max(1, math.ceil(n / target_records_per_shard))
    out = df.withColumn("shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)))
    (
        # cluster rows so each shard value lands in one task → one
        # file per shard directory (two shard values sharing a task
        # still write separate per-directory files)
        out.repartition(shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", compression)
        .json(path)
    )
    return shards


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """Round-trip reader: schema-on-read if a schema is given (the
    production path — inference costs a full pass), inferred
    otherwise (tests/ad hoc)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
