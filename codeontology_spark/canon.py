"""Canonicalization: connected-components de-duplication of entity URIs
(north_star stage; SURVEY.md §7 step 6, B19).

Same-entity candidate edges come from the linker:
- an extensionless import's guessed module URI ↔ the module URI its
  candidate resolution actually found (A11), and
- a (repo, name)-keyed alias between an exported definition and same-named
  definitions in other files when they carry identical body hashes
  (copy-paste modules — the classic mega-repo vendoring case).

Components are labeled by min URI (iterative DataFrame label propagation,
queries.connected_components); rewrite_triples maps every subj/obj to its
canonical id, which de-duplicates the graph without ever collecting to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .link import resolve_import_candidates
from .queries import connected_components


def same_entity_edges(entities: DataFrame) -> DataFrame:
    """(repo, src, dst) candidate identity edges."""
    # guessed (extensionless) module URI ↔ resolved module URI; the guess
    # is candidates[0] minus its '.ts' suffix (jsparse emits candidates in
    # the reference's fixed extension order)
    imp = resolve_import_candidates(entities)
    guesses = entities.filter(
        (F.col("kind") == "import") & (F.size("import_candidates") > 0)
    ).select(
        "repo",
        F.col("uri").alias("import_uri"),
        F.concat(
            F.lit("http://codebase.local/"),
            F.regexp_replace(F.element_at("import_candidates", 1), r"\.ts$", ""),
            F.lit("#module"),
        ).alias("guessed_uri"),
    )
    alias1 = (
        imp.join(guesses, ["repo", "import_uri"])
        .filter(F.col("guessed_uri") != F.col("resolved_module_uri"))
        .select(
            "repo",
            F.col("guessed_uri").alias("src"),
            F.col("resolved_module_uri").alias("dst"),
        )
        .distinct()
    )

    # identical-body same-name definitions across files (vendored copies)
    defs = entities.filter(
        F.col("kind").isin("function", "class") & F.col("body_hash").isNotNull()
    ).select("repo", "name", "body_hash", "uri", "path")
    a = defs.select("repo", "name", "body_hash", F.col("uri").alias("src"), F.col("path").alias("pa"))
    b = defs.select("repo", "name", "body_hash", F.col("uri").alias("dst"), F.col("path").alias("pb"))
    alias2 = (
        a.join(b, ["repo", "name", "body_hash"])
        .filter(F.col("pa") < F.col("pb"))
        .select("repo", "src", "dst")
        .distinct()
    )
    return alias1.unionByName(alias2)


def canonical_mapping(entities: DataFrame) -> DataFrame:
    """(repo, uri, canonical_uri) for every URI in an identity component."""
    edges = same_entity_edges(entities)
    labels = connected_components(edges)
    return labels.select("repo", "uri", F.col("component").alias("canonical_uri"))


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Replace subj/obj by canonical ids (left joins; identity when
    unmapped) and drop duplicate triples the merge created. The mapping is
    small relative to the graph → broadcast both joins."""
    m_subj = F.broadcast(
        mapping.select("repo", F.col("uri").alias("subj"), F.col("canonical_uri").alias("c_subj"))
    )
    m_obj = F.broadcast(
        mapping.select("repo", F.col("uri").alias("obj"), F.col("canonical_uri").alias("c_obj"))
    )
    out = (
        triples.join(m_subj, ["repo", "subj"], "left")
        .join(m_obj, ["repo", "obj"], "left")
        .select(
            "repo",
            F.coalesce("c_subj", "subj").alias("subj"),
            "pred",
            F.coalesce("c_obj", "obj").alias("obj"),
            "is_uri",
            "dtype",
        )
    )
    return out.dropDuplicates(["repo", "subj", "pred", "obj", "dtype"])
