"""`stac_catalog` — a Python DataSource (Spark 4 DataSource API) for
STAC item catalogs on disk.

The driver-side path (sources/stac.py::search_stac → items_to_df) is
right for a live API search: one small HTTP exchange, catalog metadata
only. But a *materialized* catalog — the standard cloud layout of
static STAC: one JSON document per item (or newline/array bundles),
millions of items for a multi-year Landsat archive — must be scanned
like data, not collected on the driver. This source plugs that scan
into Spark's own reader machinery:

    spark.dataSource.register(StacCatalogDataSource)
    items = (spark.read.format("stac_catalog")
                  .option("path", "/catalog/dir").load())
    scenes = select_scenes(items, ...)   # same relation as the API path

Design (reference parity: download_landsat_stac.py:96-131 reads the
same item fields from the live search):
- `partitions()` globs file names ONLY (driver touches no content) and
  round-robins them into `numPartitions` splits, so item parsing —
  the actual work — happens executor-side, in parallel.
- `read(partition)` parses each file as a single item object, an array
  of items, a FeatureCollection, or newline-delimited items, and emits
  rows via the same `item_to_row` normalization as `items_to_df` —
  one normalization, two transports, identical downstream relation.
- Output schema is ITEM_SCHEMA (properties/assets as MAP columns,
  SURVEY §1.4); predicate/column work stays in `select_scenes`, which
  is transport-agnostic.

At 100 TB scale: the catalog for a full archive is ~10⁷ small JSON
documents; this reader gives |files|-way parallel parse with ~zero
driver memory, and the scene relation it produces feeds the fetch /
decode pipeline unchanged.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ._filescan import list_files, round_robin_splits
from .stac import ITEM_SCHEMA, item_to_row


def _iter_items(payload) -> Iterator[dict]:
    """Yield item dicts from any of the common static-STAC shapes."""
    if isinstance(payload, list):
        yield from (it for it in payload if isinstance(it, dict))
    elif isinstance(payload, dict):
        if payload.get("type") == "FeatureCollection" or "features" in payload:
            yield from (
                it for it in payload.get("features", []) if isinstance(it, dict)
            )
        else:
            yield payload  # a single item document


def _read_file(path: str) -> Iterator[dict]:
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    text = text.strip()
    if not text:
        return
    try:
        yield from _iter_items(json.loads(text))
    except json.JSONDecodeError:
        # newline-delimited items (one JSON document per line)
        for line in text.splitlines():
            line = line.strip()
            if line:
                yield from _iter_items(json.loads(line))


class StacCatalogReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("stac_catalog requires option 'path'")
        self.path = path
        self.pattern = options.get("pattern", "*.json")
        self.num_partitions = int(options.get("numPartitions", 8))

    def _files(self) -> list[str]:
        return list_files(self.path, self.pattern)

    def partitions(self) -> list[InputPartition]:
        return [
            InputPartition(s)
            for s in round_robin_splits(self._files(), self.num_partitions)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        for path in partition.value:
            for it in _read_file(path):
                yield item_to_row(it)


class StacCatalogStreamReader(SimpleDataSourceStreamReader):
    """Incremental catalog feed: each micro-batch delivers the item
    files that appeared since the last offset — the SURVEY §2.9
    observation that the reference's date-ordered scene feed *is* a
    file stream, realized as `spark.readStream.format("stac_catalog")`.

    Offset = the lexicographic high-watermark of delivered file names
    (bounded-size, replayable). Assumption documented for operators:
    new catalog files sort after already-delivered ones (true for the
    date-encoded scene/item naming the reference relies on,
    load_to_postgis.py:178-183); out-of-order names belong to the
    batch reader + a reprocess. Catalog metadata is driver-read (it is
    small); the heavy per-item work — fetch/decode — happens after the
    exchange, executor-side."""

    def __init__(self, options: dict) -> None:
        self._inner = StacCatalogReader(options)

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _new_files(self, last: str) -> list[str]:
        return [p for p in self._inner._files() if os.path.basename(p) > last]

    def read(self, start: dict):
        files = self._new_files(start["last"])
        if not files:
            return iter(()), start
        # a LIST iterator, not a generator: the runner advances it with
        # next() AND pickles it to replay the prefetched batch for the
        # executors — list iterators support both, generators don't
        rows = [item_to_row(it) for p in files for it in _read_file(p)]
        return iter(rows), {"last": os.path.basename(files[-1])}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = [
            p
            for p in self._new_files(start["last"])
            if os.path.basename(p) <= end["last"]
        ]
        return iter([item_to_row(it) for p in files for it in _read_file(p)])


class StacCatalogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stac_catalog"

    def schema(self):
        return ITEM_SCHEMA

    def reader(self, schema) -> StacCatalogReader:
        return StacCatalogReader(self.options)

    def simpleStreamReader(self, schema) -> StacCatalogStreamReader:
        return StacCatalogStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the stac_catalog format."""
    spark.dataSource.register(StacCatalogDataSource)
