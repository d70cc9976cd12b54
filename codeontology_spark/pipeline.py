"""End-to-end pipeline: source table → entities → triples (+ invariants).

Mirrors the reference's CodebaseProcessor.process_codebase control flow
(/root/reference/src/pipeline/processor.py:126-227) as one lazy DataFrame
DAG; the only materialization points are an explicit persist of the entity
table (scanned by several emission projections) and the final write.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .emit import dedup_colliding_uris, triples_from_entities
from .extract import extract_entities, source_filter


@dataclass
class BuildResult:
    entities: DataFrame
    triples: DataFrame
    raw_entities: DataFrame | None = None  # the persisted pre-dedup stage

    def unpersist(self) -> None:
        if self.raw_entities is not None:
            self.raw_entities.unpersist()


def build_graph(
    source_df: DataFrame,
    apply_filters: bool = True,
    repartition: int | None = None,
    persist: bool = True,
) -> BuildResult:
    """source rows → (entities, triples). Both returned lazily; entities is
    persisted because emission fans out into several projections over it."""
    ents = extract_entities(source_df, apply_filters=apply_filters, repartition=repartition)
    if persist:
        # persist BEFORE the dedup split: dedup_colliding_uris unions two
        # branches over this subtree and Catalyst does no subplan CSE, so an
        # unpersisted extraction would run the Python stage twice (and the
        # ~10 emission projections many more times)
        ents = ents.persist(StorageLevel.MEMORY_AND_DISK)
    raw = ents if persist else None
    ents = dedup_colliding_uris(ents)
    triples = triples_from_entities(ents)
    return BuildResult(entities=ents, triples=triples, raw_entities=raw)


def verify_content_invariant(source_df: DataFrame, entities: DataFrame) -> DataFrame:
    """Per-row invariant (BASELINE.json): the module row's content sha256
    must equal sha2(content, 256) of the source table. Returns rows that
    VIOLATE the invariant (empty = pass). Anti-join keeps it one shuffle."""
    src = source_df.select(
        "repo", "path", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("content_sha256")
    )
    mods = entities.filter(F.col("kind") == "module").select("repo", "path", "content_sha256")
    return mods.join(src, on=["repo", "path", "content_sha256"], how="left_anti")


def changed_files(source_df: DataFrame, prev_state: DataFrame) -> DataFrame:
    """A3 change-detection anti-join (processor.py:306-319): skip files whose
    content hash is unchanged since the previous run. prev_state columns:
    (repo, path, content_sha256)."""
    cur = source_df.withColumn(
        "content_sha256", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
    )
    return cur.join(
        prev_state.select("repo", "path", "content_sha256"),
        on=["repo", "path", "content_sha256"],
        how="left_anti",
    ).drop("content_sha256")


def graph_stats(triples: DataFrame) -> DataFrame:
    """B16 get_entity_count (ontology_builder.py:396-418): COUNT(*) GROUP BY
    rdf:type over instance triples."""
    return (
        triples.filter(F.col("pred") == "rdf:type")
        .groupBy(F.col("obj").alias("entity_type"))
        .count()
        .orderBy(F.desc("count"), "entity_type")
    )


__all__ = [
    "BuildResult",
    "build_graph",
    "changed_files",
    "graph_stats",
    "source_filter",
    "verify_content_invariant",
]
