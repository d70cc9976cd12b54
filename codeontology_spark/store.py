"""Graph store: partitioned triple-table persistence + per-partition
lineage + checkpoint resume.

Replaces the reference's Turtle-file store (graph_store.py:479-543:
timestamped .ttl + .metadata.json + `latest` symlink) with a Parquet table
partitioned by predicate (the layout every B-query filters on, so
partition pruning serves them a single directory), plus:

- a lineage table, one row per (stage, input partition) with file counts,
  row counts and wall time — the north rule's resumability bookkeeping;
- snapshot directories (snap=<label>) standing in for Iceberg snapshots;
- resume = anti-join of the input's (repo, path, content-sha) against the
  lineage of completed partitions, so a killed run reprocesses only
  unfinished inputs (SURVEY.md §4.5).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import LINEAGE_SCHEMA

FILE_LINEAGE_COLS = ["repo", "path", "content_sha256"]


def write_triples(
    triples: DataFrame,
    base: str,
    snapshot: str = "latest",
    buckets_per_pred: int = 8,
    num_partitions: int | None = None,
    write_mode: str = "overwrite",
) -> str:
    """Partition by predicate: every template query (B1-B16) filters on
    pred, so pruning turns each into a single-partition scan. repo stays a
    column (high cardinality → not a partition key; bucketing by repo is
    the Iceberg-side upgrade).

    The shuffle key is (pred, hash-bucket(subj)), not pred alone: with only
    ~40 predicates a pred-only repartition caps the write at 40 tasks and
    the dominant predicates (hasName, locatedAt ≈ a third of the table)
    serialize into single straggler tasks. Salting by subject hash keeps
    partition pruning (pred is still the directory key) while spreading
    each predicate over `buckets_per_pred` tasks/files.

    With `num_partitions=None` the shuffle count is AQE's call: it sizes
    partitions by bytes over the ~40×buckets distinct keys (tiny graphs
    coalesce to few files, 100 TB graphs fan out). Pass an explicit
    `num_partitions` to pin the task count (AQE does not coalesce an
    explicitly-sized repartition)."""
    path = f"{base}/snap={snapshot}"
    keys = [F.col("pred"), F.pmod(F.xxhash64("subj"), F.lit(buckets_per_pred))]
    part = (
        triples.repartition(num_partitions, *keys)
        if num_partitions
        else triples.repartition(*keys)
    )
    part.write.mode(write_mode).partitionBy("pred").parquet(path)
    return path


def read_triples(spark: SparkSession, base: str, snapshot: str = "latest") -> DataFrame:
    return spark.read.parquet(f"{base}/snap={snapshot}")


def stage_lineage(df: DataFrame, stage: str) -> DataFrame:
    """Per-(partition, repo) lineage rows computed in the same pass as the
    stage output (mapInPandas over the final partitions; no extra shuffle).
    One row PER REPO within the partition — a multi-repo partition must not
    be labeled with the repo of its first batch (round-2 VERDICT)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.perf_counter()
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        n_rows = 0
        acc: dict[str | None, dict] = {}
        for pdf in batches:
            n_rows += len(pdf)
            if "path" in pdf.columns and len(pdf):
                for repo, grp in pdf.groupby("repo", dropna=False):
                    a = acc.setdefault(repo, {"n": 0, "paths": set()})
                    a["n"] += len(grp)
                    a["paths"].update(grp["path"])
        wall_ms = (time.perf_counter() - t0) * 1000.0
        if not acc:  # empty or path-less partition: one bookkeeping row
            acc[None] = {"n": n_rows, "paths": set()}
        yield pd.DataFrame(
            [
                {
                    "stage": stage,
                    "partition_id": pid,
                    "repo": repo,
                    "n_files": len(a["paths"]),
                    "n_rows": a["n"],
                    "min_path": min(a["paths"]) if a["paths"] else None,
                    "max_path": max(a["paths"]) if a["paths"] else None,
                    "wall_ms": wall_ms,
                }
                for repo, a in sorted(acc.items(), key=lambda kv: str(kv[0]))
            ]
        )

    return df.mapInPandas(gen, schema=LINEAGE_SCHEMA)


def write_file_lineage(
    entities: DataFrame,
    base: str,
    snapshot: str = "latest",
    write_mode: str = "overwrite",
) -> str:
    """File-grain completion ledger: one row per successfully processed
    input file (its module row carries the content sha). This is what
    resume anti-joins against. A resumed run appends its newly-completed
    files (write_mode='append') so the ledger stays cumulative."""
    path = f"{base}/lineage/snap={snapshot}"
    (
        entities.filter(F.col("kind") == "module")
        .select(*FILE_LINEAGE_COLS)
        .write.mode(write_mode)
        .parquet(path)
    )
    return path


def resume_pending(
    spark: SparkSession, source_df: DataFrame, base: str, snapshot: str = "latest"
) -> DataFrame:
    """Inputs not yet recorded as completed (by content hash, so a changed
    file reprocesses even if its path completed before)."""
    try:
        done = spark.read.parquet(f"{base}/lineage/snap={snapshot}")
    except Exception:
        return source_df  # no ledger yet → everything pending
    cur = source_df.withColumn(
        "content_sha256", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
    )
    return cur.join(done, on=FILE_LINEAGE_COLS, how="left_anti").drop("content_sha256")
