"""The batch curation CLI: funnel monotonicity, shard/manifest
consistency, and determinism across runs."""

import os
import tempfile

from ndvi_etl_pipeline_spark.curate import curate


def test_curate_funnel_and_determinism(spark, sf_dir):
    with tempfile.TemporaryDirectory() as td:
        out1 = os.path.join(td, "run1")
        out2 = os.path.join(td, "run2")
        c1 = curate(spark, sf_dir, out1)
        c2 = curate(spark, sf_dir, out2)

    # stages only ever remove documents
    assert c1["raw"] >= c1["quality"] >= c1["gopher"] >= c1["exact_dedup"]
    assert c1["exact_dedup"] >= c1["neardup_canonical"] > 0
    # everything surviving the funnel is packed
    assert c1["packed_docs"] == c1["neardup_canonical"]
    assert c1["shards"] > 0 and c1["packed_tokens"] > 0
    # the pipeline is deterministic end to end
    for k in ("raw", "quality", "gopher", "exact_dedup",
              "neardup_canonical", "shards", "packed_docs", "packed_tokens"):
        assert c1[k] == c2[k], k


def test_curate_writes_readable_shards(spark, sf_dir):
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "shards")
        c = curate(spark, sf_dir, out)
        df = spark.read.parquet(out)  # hive layout: source=<s>/bin=<b>/
        assert df.count() == c["packed_docs"]
        cols = set(df.columns)
        assert "text" in cols and "dsir_logweight" in cols
