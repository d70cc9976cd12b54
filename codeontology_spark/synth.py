"""Deterministic synthetic source-repo table (seeded, no wall clock).

Replicates the reference's fixture codebases (fixtures.py) across N
synthetic repos so the same byte content — and therefore the same expected
triples — appears at any scale. Used by tests, bench.py and the scaling
runs; real deployments read an Iceberg/Parquet table of the same shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from .fixtures import FIXTURES, perf50
from .schemas import INPUT_SCHEMA


def _commit_for(repo: str) -> str:
    return hashlib.sha256(repo.encode()).hexdigest()[:12]


def _lang_for(path: str) -> str:
    return "typescript" if path.endswith((".ts", ".tsx")) else "javascript"


def fixture_rows(fixture_names: list[str] | None = None) -> list[tuple]:
    """One repo per fixture set, paths relative to the repo root."""
    rows = []
    names = fixture_names or sorted(FIXTURES)
    for fx in names:
        repo = f"fixture/{fx}"
        commit = _commit_for(repo)
        for path, content in sorted(FIXTURES[fx].items()):
            rows.append((repo, path, commit, _lang_for(path), content))
    return rows


def fixture_table(spark: SparkSession, fixture_names: list[str] | None = None) -> DataFrame:
    return spark.createDataFrame(fixture_rows(fixture_names), schema=INPUT_SCHEMA)


_PARQUET_CACHE: dict[tuple, str] = {}


def fixture_table_parquet(
    spark: SparkSession, fixture_names: list[str] | None = None
) -> DataFrame:
    """fixture_table materialized through a parquet round-trip.

    createDataFrame ships local rows through a Python RDD stage; chaining
    that straight into the extraction UDF runs TWO Python workers per task
    (pickle → JVM → Arrow), which thrashes at high core counts — measured
    ~10 s to extract 17 tiny files at local[32] vs ~1 s through parquet,
    where the scan is JVM-side and extraction is a single Python stage.
    The written table is cached per (process, fixture set)."""
    key = tuple(sorted(fixture_names or FIXTURES))
    if key not in _PARQUET_CACHE:
        import tempfile

        d = tempfile.mkdtemp(prefix="fixture_tbl_")
        fixture_table(spark, fixture_names).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/src"
        )
        _PARQUET_CACHE[key] = f"{d}/src"
    return spark.read.parquet(_PARQUET_CACHE[key])


def synth_table(
    spark: SparkSession,
    n_repos: int = 100,
    include_perf50: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """N synthetic repos; repo i carries every fixture file set (and the
    50-file perf corpus) under per-fixture subdirectories. ~13-63 files and
    ~3.5-8 KLoC per repo depending on include_perf50. Deterministic."""
    base: list[tuple[str, str]] = []
    for fx in sorted(FIXTURES):
        for path, content in sorted(FIXTURES[fx].items()):
            base.append((f"{fx}/{path}", content))
    if include_perf50:
        for path, content in sorted(perf50().items()):
            base.append((f"perf/{path}", content))

    def gen(idx):
        for i in idx:
            repo = f"synth/repo{i:05d}"
            commit = _commit_for(repo)
            for path, content in base:
                yield (repo, path, commit, _lang_for(path), content)

    n_part = partitions or min(max(n_repos // 4, 1), 256)
    rdd = spark.sparkContext.parallelize(range(n_repos), n_part).mapPartitions(
        lambda it: gen(it)
    )
    return spark.createDataFrame(rdd, schema=INPUT_SCHEMA)
