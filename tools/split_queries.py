#!/usr/bin/env python
"""One-shot refactoring tool: split plans/queries.py (~35k lines) into
plans/catalog/ modules, preserving registration order exactly.

Layout produced:
- catalog/_shared.py — the original header (imports, QuerySpec,
  REGISTRY, register, canon_round, erfc helpers, ...) plus every
  order-insensitive top-level helper (defs/constants that reference
  neither a specific q_* builder nor mutate REGISTRY at import time),
  in original order, with an explicit __all__ including underscore
  names so parts can star-import them.
- catalog/partNN_<slug>.py — the @register chunks (plus the few
  order-sensitive inline statements such as REGISTRY wrapping blocks)
  in original order, cut at chunk boundaries near a line budget. Each
  part star-imports _shared and all previous parts, so later builders
  can reference earlier q_* names.
- catalog/__init__.py — imports the parts in order (triggering all
  registrations).

The facade rewrite of plans/queries.py is done by the caller.
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

SRC = Path("ndvi_etl_pipeline_spark/plans/queries.py")
OUT = Path("ndvi_etl_pipeline_spark/plans/catalog")
LINE_BUDGET = 4200

Q_REF = re.compile(r"\bq_[a-z0-9_]+\b")


def top_level_names(tree_body) -> list[str]:
    names: list[str] = []
    for node in tree_body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.append(node.target.id)
        elif isinstance(node, ast.Import):
            names.extend((a.asname or a.name.split(".")[0]) for a in node.names)
        elif isinstance(node, ast.ImportFrom):
            names.extend((a.asname or a.name) for a in node.names if a.name != "*")
        elif isinstance(node, ast.For):
            if isinstance(node.target, ast.Name):
                names.append(node.target.id)
    return names


def main() -> int:
    text = SRC.read_text()
    # one package level deeper than plans/: ..functions -> ...functions
    text = re.sub(r"\bfrom \.\.(?=[a-z])", "from ...", text)
    lines = text.splitlines(keepends=True)
    tree = ast.parse(text)

    # chunk = (start_line0, end_line0_excl, kind, node)
    chunks = []
    prev_end = 0
    for node in tree.body:
        start = node.lineno - 1
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.decorator_list:
            start = min(d.lineno for d in node.decorator_list) - 1
        # pull preceding comment/blank lines into this chunk
        s = start
        while s > prev_end and (
            lines[s - 1].strip() == "" or lines[s - 1].lstrip().startswith("#")
        ):
            s -= 1
        end = node.end_lineno
        src = "".join(lines[s:end])

        is_query = isinstance(node, ast.FunctionDef) and any(
            (isinstance(d, ast.Call) and getattr(d.func, "id", "") == "register")
            for d in node.decorator_list
        )
        if is_query:
            kind = "query"
        elif isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            # defs are order-insensitive unless they capture a specific
            # q_* builder name (resolved in their defining module)
            kind = "inline" if Q_REF.search(src) else "shared"
        elif isinstance(node, ast.Expr):
            # bare call statements (e.g. _finalize_xxx()) run at import
            # time and depend on prior registrations — keep in place
            kind = "inline"
        else:
            # other module-level statements: order-sensitive iff they
            # READ the registry (subscript) or a q_* name; the plain
            # definitions (REGISTRY = {}, register = ...) stay shared
            if "REGISTRY[" in src or Q_REF.search(src):
                kind = "inline"
            else:
                kind = "shared"
        chunks.append((s, end, kind, node, src))
        prev_end = end

    # the final API functions go to shared (they only close over REGISTRY)
    api = {"queries", "oracle_sql", "headline_queries"}
    chunks = [
        (s, e, ("shared" if getattr(n, "name", "") in api else k), n, src)
        for (s, e, k, n, src) in chunks
    ]

    shared_srcs = [c[4] for c in chunks if c[2] == "shared"]
    flow = [c for c in chunks if c[2] != "shared"]

    # warn: inline chunks whose defined names are used by later chunks
    for i, (s, e, k, n, src) in enumerate(flow):
        if k != "inline":
            continue
        names = [nm for nm in top_level_names([n]) if nm.startswith("_")]
        for nm in names:
            for s2, e2, k2, n2, src2 in flow[i + 1 :]:
                if re.search(rf"\b{re.escape(nm)}\b", src2):
                    print(f"WARN: inline-private {nm} referenced later", file=sys.stderr)
                    break

    # cut flow into parts
    parts: list[list[tuple]] = [[]]
    nl = 0
    for c in flow:
        clen = c[1] - c[0]
        if nl + clen > LINE_BUDGET and parts[-1]:
            parts.append([])
            nl = 0
        parts[-1].append(c)
        nl += clen

    def slug(part) -> str:
        for s, e, k, n, src in part:
            if k == "query":
                m = re.search(r'@register\(\s*\n?\s*"([a-z0-9_]+)"', src)
                if m:
                    return m.group(1)[:18]
        return "misc"

    OUT.mkdir(exist_ok=True)
    # _shared.py
    shared_text = "".join(shared_srcs)
    shared_tree = ast.parse(shared_text)
    names = top_level_names(shared_tree.body)
    all_list = ",\n    ".join(f'"{n}"' for n in dict.fromkeys(names))
    shared_text = shared_text.replace(
        "from __future__ import annotations\n", "", 1
    )
    shared_out = (
        '"""Catalog-shared core: registry, helpers, constants (split from\n'
        "the monolithic plans/queries.py; see catalog/__init__.py).\n"
        'Underscore helpers are deliberately in __all__ so part modules\n'
        'can `from ._shared import *`."""\n\n'
        "from __future__ import annotations\n\n"
        + shared_text
        + "\n\n__all__ = [\n    " + all_list + ",\n]\n"
    )
    (OUT / "_shared.py").write_text(shared_out)

    part_names = []
    for i, part in enumerate(parts, 1):
        name = f"part{i:02d}_{slug(part)}"
        part_names.append(name)
        hdr = (
            f'"""Query catalog part {i}/{len(parts)} (split from '
            'plans/queries.py; registration order preserved)."""\n\n'
            "from __future__ import annotations\n\n"
            "from ._shared import *  # noqa: F401,F403\n"
        )
        for prev in part_names[:-1]:
            hdr += f"from .{prev} import *  # noqa: F401,F403\n"
        body = "".join(c[4] for c in part)
        (OUT / f"{name}.py").write_text(hdr + "\n" + body)

    init = (
        '"""The query catalog: importing this package registers every\n'
        "query+oracle pair into REGISTRY (catalog/_shared.py). Parts are\n"
        'ordered; each may reference builders from earlier parts."""\n\n'
        + "".join(f"from . import {n}  # noqa: F401\n" for n in part_names)
        + "from ._shared import (  # noqa: F401\n"
        "    REGISTRY,\n    QuerySpec,\n    canon_round,\n    canon_round_sql,\n"
        "    headline_queries,\n    oracle_sql,\n    queries,\n    register,\n)\n"
    )
    (OUT / "__init__.py").write_text(init)
    print(
        f"shared: {len(shared_text.splitlines())} lines; "
        + "; ".join(
            f"{n}: {sum(c[1] - c[0] for c in p)}" for n, p in zip(part_names, parts)
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
