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
    spark: SparkSession,
    path: str,
    apply_discovery_filter: bool = True,
    on_malformed: str = "drop",
) -> DataFrame:
    """Source dump ingestion: newline-delimited JSON records with the
    canonical input fields (repo, path, commit, lang, content) — the
    common interchange shape for crawled-code dumps. The schema is
    declared (no sampling-based inference pass over a 100 TB dump); rows
    missing optional fields surface as nulls and the discovery filter
    prunes them like any other row.

    Malformed-line contract (mirrors read_ntriples' strict/lenient one):
    crawl dumps contain truncated records, raw control bytes, invalid
    UTF-8 and half-written lines, and one such line must cost one row,
    never the job. `on_malformed`:

    - 'drop' (default): DROPMALFORMED — malformed lines vanish. A line
      is malformed when it is not a complete JSON object (truncated /
      split records) or contains invalid UTF-8 bytes; a record whose
      field has a castable-but-wrong JSON type (``"content": 42``) is
      NOT malformed — the scalar coerces to its string form and the row
      is kept.
    - 'null': PERMISSIVE — malformed lines become all-null rows; note
      the discovery filter then prunes them anyway (null path fails
      every predicate), so this differs from 'drop' only with
      apply_discovery_filter=False.
    - 'fail': FAILFAST — first malformed line aborts the read, for
      callers who want a dump validated, not ingested.

    Records are NEWLINE-delimited: a literal newline inside a JSON
    string is invalid JSON (must be escaped as \\n) and splits the
    record — both halves are malformed and handled per the mode. This
    keeps the format splittable at arbitrary byte offsets, which is the
    property that lets Spark parallelize a 100 TB dump; escaped
    newlines (the valid encoding) round-trip fine.
    """
    from .schemas import INPUT_SCHEMA

    modes = {"drop": "DROPMALFORMED", "null": "PERMISSIVE", "fail": "FAILFAST"}
    if on_malformed not in modes:
        raise ValueError(
            f"on_malformed must be drop|null|fail, got {on_malformed!r}"
        )
    df = (
        spark.read.schema(INPUT_SCHEMA)
        .option("mode", modes[on_malformed])
        .json(path)
    )
    return source_filter(df) if apply_discovery_filter else df


def read_source_dir(
    spark: SparkSession,
    root: str,
    repo: str | None = None,
    commit: str = "",
    apply_discovery_filter: bool = True,
    on_bad_utf8: str = "replace",
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
    - `on_bad_utf8`: crawl trees contain files with a source extension
      but invalid UTF-8 bytes; under Spark 4 ANSI mode a plain
      decode() would raise MALFORMED_CHARACTER_CODING on the FIRST such
      file and fail the whole distributed ingest (ADVICE r4). Instead:
      'replace' (default) substitutes U+FFFD for invalid sequences
      (make_valid_utf8 — one garbled row, job survives), 'drop' filters
      those rows out pre-decode (is_valid_utf8), 'fail' keeps the
      strict ANSI behavior for callers who want ingest to halt.
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
    # binary→string cast copies bytes without ANSI validation;
    # make_valid_utf8 then repairs invalid sequences to U+FFFD. A plain
    # F.decode(content,'UTF-8') raises under ANSI on the first bad file.
    raw_text = F.col("content").cast("string")
    if on_bad_utf8 == "replace":
        content = F.make_valid_utf8(raw_text)
    elif on_bad_utf8 == "drop":
        df = df.filter(F.is_valid_utf8(F.col("content").cast("string")))
        content = raw_text
    elif on_bad_utf8 == "fail":
        content = F.decode(F.col("content"), "UTF-8")
    else:
        raise ValueError(f"on_bad_utf8 must be replace|drop|fail, got {on_bad_utf8!r}")
    out = df.select(
        F.lit(repo).alias("repo"),
        rel.alias("path"),
        F.lit(commit).alias("commit"),
        F.when(is_ts, F.lit("typescript")).otherwise(F.lit("javascript")).alias("lang"),
        content.alias("content"),
    )
    return source_filter(out) if apply_discovery_filter else out
