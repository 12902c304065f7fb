"""Shared file-listing/partitioning for Python DataSources.

The `warc` and `stac_catalog` DataSources (and any future file-backed
source) need the same two pieces: a driver-side names-only listing
(never file content — executors open their own files) and a
round-robin split so a lexicographic hot spot (one crawl segment's or
one path/row's files sorting together) spreads across partitions.
"""

from __future__ import annotations

import fnmatch
import os


def list_files(path: str, pattern: str) -> list[str]:
    """`path` itself if it is a file, else a recursive walk filtered
    by fnmatch `pattern`, sorted for determinism."""
    if os.path.isfile(path):
        return [path]
    out: list[str] = []
    for root, _dirs, names in os.walk(path):
        out.extend(
            os.path.join(root, n) for n in names if fnmatch.fnmatch(n, pattern)
        )
    return sorted(out)


def round_robin_splits(files: list[str], num_partitions: int) -> list[list[str]]:
    """Split a sorted file list into ≤ num_partitions non-empty
    round-robin slices (consecutive files — similar sizes/dates —
    spread across slices)."""
    n = max(1, min(num_partitions, len(files) or 1))
    return [s for s in (files[i::n] for i in range(n)) if s]
