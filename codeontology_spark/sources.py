"""Source connectors: get a codebase INTO the input-table shape
(repo, path, commit, lang, content) that the pipeline consumes.

The reference discovers files with a driver-side os.walk
(/root/reference/src/pipeline/processor.py:229-273); at 100 TB the
listing itself must be distributed, so `read_source_dir` uses Spark's
`binaryFile` source — executors list and read the tree in parallel, and
filters on (path, length) are evaluated BEFORE file contents are read
(binaryFile reads the content column lazily per row), so oversized and
ignored files cost a stat call, not a read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import MAX_FILE_BYTES, source_filter

_TS_EXTS = (".ts", ".tsx")


def read_source_jsonl(
    spark: SparkSession, path: str, apply_discovery_filter: bool = True
) -> DataFrame:
    """Source dump ingestion: newline-delimited JSON records with the
    canonical input fields (repo, path, commit, lang, content) — the
    common interchange shape for crawled-code dumps. The schema is
    declared (no sampling-based inference pass over a 100 TB dump); rows
    missing optional fields surface as nulls and the discovery filter
    prunes them like any other row."""
    from .schemas import INPUT_SCHEMA

    df = spark.read.schema(INPUT_SCHEMA).json(path)
    return source_filter(df) if apply_discovery_filter else df


def read_source_dir(
    spark: SparkSession,
    root: str,
    repo: str | None = None,
    commit: str = "",
    apply_discovery_filter: bool = True,
) -> DataFrame:
    """A1 discovery as a distributed scan: directory tree → input rows.

    - `repo` defaults to the root directory's basename (the reference
      keys its graph by codebase directory, processor.py:132-137);
    - `path` is root-relative with forward slashes;
    - `lang` follows the reference's extension dispatch: .ts/.tsx →
      typescript, everything else in the supported set → javascript
      (ast_parser.py language selection);
    - `content` is UTF-8-decoded text (the pipeline's parsers are text
      parsers; undecodable files should be excluded by the discovery
      filter's extension predicate before this point);
    - with `apply_discovery_filter`, extract.source_filter's A1/A2
      predicates (extension, size, generated/test/hidden/ignored-dir)
      run here so the returned table is exactly what the reference's
      walk would have yielded. The size cut additionally applies to the
      binaryFile `length` column pre-read.
    """
    import re as _re

    has_scheme = _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", root)
    base = root.rstrip("/") if has_scheme else os.path.abspath(root)
    if repo is None:
        repo = os.path.basename(base.rstrip("/"))
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(base)
        .filter(F.col("length") <= MAX_FILE_BYTES)  # pre-read stat filter
    )
    # strip the scheme + root prefix SCHEME-AGNOSTICALLY: binaryFile
    # reports file:/abs/dir/f.js locally, hdfs://nn/dir/f.js or
    # s3a://bucket/dir/f.js on cluster filesystems. Compare scheme-less
    # forms; if nothing matches, keep the FULL scheme-less path — falling
    # back to the basename would collide same-named files in different
    # directories (breaking (repo, path)-keyed dedup/LWW) and blind the
    # discovery filter's directory predicates
    # strip scheme AND any leading slashes on BOTH sides (file:/abs vs
    # file:///abs render differently across Hadoop FS configs; an
    # asymmetric strip would fail the prefix match for every row and
    # silently fall back to absolute paths)
    strip_scheme = r"^([A-Za-z][A-Za-z0-9+.-]*:)?/*"
    base_noscheme = _re.sub(strip_scheme, "", base)
    path_noscheme = F.regexp_replace(F.col("path"), strip_scheme, "")
    prefix = base_noscheme.rstrip("/") + "/"
    rel = F.when(
        path_noscheme.startswith(prefix),
        F.expr(
            f"substring(regexp_replace(path, '{strip_scheme}', ''), {len(prefix) + 1})"
        ),
    ).otherwise(path_noscheme)
    is_ts = F.lower(rel).rlike(r"\.(ts|tsx)$")
    out = df.select(
        F.lit(repo).alias("repo"),
        rel.alias("path"),
        F.lit(commit).alias("commit"),
        F.when(is_ts, F.lit("typescript")).otherwise(F.lit("javascript")).alias("lang"),
        F.decode(F.col("content"), "UTF-8").alias("content"),
    )
    return source_filter(out) if apply_discovery_filter else out
