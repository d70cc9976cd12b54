"""Extraction stage: source rows → entity rows via Arrow-batched mapInPandas.

Replaces the reference's ThreadPoolExecutor fan-out
(/root/reference/src/pipeline/processor.py:302-354) with Spark data
parallelism: one vectorized Python stage over the (optionally salted)
repartitioned input table; no driver-side loops, no per-row Python UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jsparse import extract_file
from .schemas import ENTITY_SCHEMA

# file-level predicates of processor.py:229-300, expressed as Catalyst
# filters so they push into the parquet scan
SUPPORTED_EXTS = (".js", ".jsx", ".ts", ".tsx", ".mjs", ".cjs")
MAX_FILE_BYTES = 1024 * 1024  # processor.py:280


def source_filter(df: DataFrame) -> DataFrame:
    """A1/A2: extension + size + generated/test-file pruning
    (processor.py:236-238, 275-300). Pure column predicates — Catalyst
    pushes them into the scan."""
    path = F.col("path")
    fname = F.element_at(F.split(path, "/"), -1)
    lower = F.lower(fname)
    keep_ext = F.lower(path).rlike(r"\.(js|jsx|ts|tsx|mjs|cjs)$")
    not_large = F.length("content") <= F.lit(MAX_FILE_BYTES)
    not_generated = ~(
        lower.contains(".generated.")
        | lower.contains(".min.")
        | lower.contains(".bundle.")
        | lower.contains("vendor")
    )
    not_test = ~(
        F.lower(path).contains(".test.")
        | F.lower(path).contains(".spec.")
        | F.lower(path).contains("__tests__")
    )
    not_hidden = ~fname.startswith(".")
    ignore_dirs = (
        "node_modules", "dist", "build", ".git", ".next", "coverage",
        "__pycache__", ".pytest_cache", "venv", "env", ".vscode", ".idea",
    )
    not_ignored_dir = ~path.rlike(
        "(^|/)(" + "|".join(d.replace(".", r"\.") for d in ignore_dirs) + ")/"
    )
    return df.filter(
        keep_ext & not_large & not_generated & not_test & not_hidden & not_ignored_dir
    )


def _dedup_keep_first(xs: list) -> list:
    seen = set()
    out = []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def _entity_rows(repo: str, path: str, commit: str, content: str) -> list[dict]:
    ents = extract_file(path, content)
    rows = []
    sha = hashlib.sha256(content.encode()).hexdigest()
    for e in ents:
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "kind": e.kind,
                "name": e.name,
                "uri": e.uri,
                "line": e.line,
                "col": e.col,
                "end_line": e.end_line,
                "end_col": e.end_col,
                "body_hash": e.body_hash,
                "scope": e.scope,
                "is_async": e.is_async,
                "is_generator": e.is_generator,
                "is_arrow": e.is_arrow,
                "is_exported": e.is_exported,
                "is_default_export": e.is_default_export,
                "is_static": e.is_static,
                "is_private": e.is_private,
                "is_constructor": e.is_constructor,
                "is_const": e.is_const,
                "is_let": e.is_let,
                "is_var": e.is_var,
                "init_value": e.init_value,
                "module_type": e.module_type,
                "module_path": e.module_path,
                "import_type": e.import_type,
                "imported_symbols": e.imported_symbols or [],
                "export_type": e.export_type,
                "callee_name": e.callee_name,
                "caller_uri": e.caller_uri,
                "callee_uri": e.callee_uri,
                "is_method_call": e.is_method_call,
                "arguments": e.arguments or [],
                # duplicate-free lists → duplicate-free triples, so the
                # emission stage needs NO global dropDuplicates shuffle
                # (rdflib Graph set semantics, ontology_builder.py:79-82)
                "calls": _dedup_keep_first(e.calls),
                "parent_class_uri": e.parent_class_uri,
                "is_rest": e.is_rest,
                "extends_name": e.extends_name,
                "functions": _dedup_keep_first(e.functions),
                "classes": _dedup_keep_first(e.classes),
                "methods": _dedup_keep_first(e.methods),
                "exports": _dedup_keep_first(e.exports),
                "imports": _dedup_keep_first(e.imports),
                "import_candidates": e.import_candidates or [],
                "content_sha256": sha if e.kind == "module" else None,
            }
        )
    return rows


def extract_entities(
    source_df: DataFrame,
    apply_filters: bool = True,
    repartition: int | None = None,
) -> DataFrame:
    """Source table → entity rows.

    Map-only: Arrow batches stream through ``mapInPandas``; 1→N expansion
    happens inside the UDF so no separate explode of a giant array column
    is materialized. For skewed repos, pre-repartition by a salted key so
    one mega-repo cannot pin a single task (SURVEY.md §4.3).
    """
    df = source_filter(source_df) if apply_filters else source_df
    if repartition:
        # salt on (repo, path): files of one repo spread across all tasks
        df = df.repartition(repartition, F.col("repo"), F.col("path"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for repo, path, commit, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                try:
                    out.extend(_entity_rows(repo, path, commit, content or ""))
                except Exception:
                    # mirror the reference's per-file failure tolerance
                    # (processor.py:342-354): a broken file yields nothing
                    continue
            if out:
                yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=ENTITY_SCHEMA)
