#!/usr/bin/env python
"""Round-10 VERDICT ask #4 decomposition: can a Bloom pre-filter (or a
shuffled strategy) beat the packed-key broadcast anti-join for the
mid-tier DV read (~12M delete keys)?

Models the dv_read_mid regime faithfully — SPARSE 63-bit packed keys
(high bits are a path hash, so LongHashedRelation runs in its
open-addressing map mode, not the dense-array mode a `range` synthetic
would hit) and a ~2% table hit rate — and measures, at 60M table rows
and 12M build keys with the noop sink:

  floor   plain scan of the keyed relation
  D       broadcast build cost alone (1k-row probe side)
  A       the current plan: broadcast LeftAnti, 60M probes
  F       shuffled-hash LeftAnti (both sides exchange)
  C       Bloom evaluation alone (might_contain over every row)
  B       Bloom + broadcast anti via the null-key probe-skip trick
          (bloom-negative rows get a NULL join key, which the anti
          join's codegen emits without probing)

Round-10 measurement (this box, interleaved session):

  floor 0.26 | D 7.88 | A 9.35 | F 4.26 | C ~1.05 | B 10.59

Conclusions (recorded in OPTIMIZATION_r10.md):
- the driver-side single-threaded broadcast-relation BUILD (~7.9 s at
  12M keys) dominates the mid-tier read, not the probes (~25 ns/row);
- a Bloom pre-filter cannot touch the build and its per-row eval
  (~14 ns) is the same order as the probe it would skip -> B is a
  wash-to-worse. VERDICT #4's hypothesis is measured and refuted.
- the shuffled-hash form wins LOCALLY by skipping the driver build,
  but it shuffles the entire table — exactly the wrong trade at
  100 TB (the build is a fixed driver-side cost that amortizes over
  table size; the shuffle is proportional to it). Keeping broadcast.

Uses two Spark-internal bridges (BloomFilterMightContain via
ExpressionUtils) — measurement-only; no query path depends on them.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.classic.column import Column as CCol

    from ndvi_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench_dv_bloom", shuffle_partitions=32)
    sc = spark.sparkContext
    jvm = spark._jvm

    n = int(os.environ.get("DV_BLOOM_ROWS", 60_000_000))
    mask = (1 << 63) - 1

    def keyed(df):
        return df.select(
            F.xxhash64(F.col("id")).bitwiseAND(F.lit(mask)).alias("k"),
            (F.col("id") % 97).alias("v"),
        )

    big = keyed(spark.range(0, n))
    dv = keyed(spark.range(0, 10 * n).filter("id % 50 = 2")).select("k")
    dv = dv.localCheckpoint()
    tiny = keyed(spark.range(0, 1000))
    print("dv keys:", dv.count(), flush=True)

    def timed(df, label, reps=3):
        ts = []
        for _ in range(reps + 1):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(
            f"{label}: cold {ts[0]:.2f} warm {min(ts[1:]):.2f} "
            f"{['%.2f' % t for t in ts[1:]]}",
            flush=True,
        )

    sc.setJobDescription("floor")
    timed(big, "floor plain keyed scan")
    sc.setJobDescription("D build only")
    timed(tiny.join(F.broadcast(dv), ["k"], "left_anti"), "D broadcast build only")
    sc.setJobDescription("A broadcast anti")
    a = big.join(F.broadcast(dv), ["k"], "left_anti")
    timed(a, "A broadcast anti")
    sc.setJobDescription("F shuffle-hash anti")
    timed(big.join(dv.hint("shuffle_hash"), ["k"], "left_anti"), "F shuffle-hash anti")

    t0 = time.perf_counter()
    jbf = dv._jdf.stat().bloomFilter("k", 12_000_000, 0.02)
    baos = jvm.java.io.ByteArrayOutputStream()
    jbf.writeTo(baos)
    blob = bytes(baos.toByteArray())
    print(f"bloom build {time.perf_counter()-t0:.2f}s, {len(blob)/1e6:.1f} MB", flush=True)

    eu = jvm.org.apache.spark.sql.classic.ExpressionUtils

    def might_contain(blob_lit, val_col):
        e = jvm.org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            eu.expression(blob_lit._jc), eu.expression(val_col._jc)
        )
        return CCol(eu.column(e))

    mc = might_contain(F.lit(blob), F.col("k"))
    sc.setJobDescription("C bloom eval only")
    timed(big.withColumn("__m", mc), "C bloom eval only")
    sc.setJobDescription("B bloom + broadcast anti")
    b = (
        big.withColumn("__pk", F.when(mc, F.col("k")))
        .join(F.broadcast(dv.select(F.col("k").alias("__pk"))), ["__pk"], "left_anti")
        .drop("__pk")
    )
    timed(b, "B bloom + broadcast anti (null-key probe skip)")

    na, nb = a.count(), b.count()
    print("counts:", na, nb, "MATCH" if na == nb else "MISMATCH", flush=True)
    return 0 if na == nb else 1


if __name__ == "__main__":
    sys.exit(main())
