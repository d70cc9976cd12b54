"""Cross-file linking: the scale-path replacement for the reference's
per-process LSP server (SURVEY.md A9-A11).

The reference spawns typescript-language-server per workspace
(/root/reference/src/parsers/lsp_client.py:24-157) — a per-node daemon that
can't scale out. Here the same resolutions are joins:

- A9-replacement: a broadcast symbol table of defined functions/classes,
  joined against unresolved call mentions on (repo, name). For skewed
  names (think `get`, `init` across a mega-repo) the mention side is
  salted: the symbol table is exploded ×SALT so each salted mention key
  still finds its match — classic broadcast-skew pattern.
- A10: symbolic-key nearest-line resolution as a window over line deltas
  (lsp_client.py:834-885, nearest at :861).
- A11: import-specifier candidates joined against the repo's file set,
  picking the first existing candidate by priority (ast_parser.py:607-629
  extension order .ts/.tsx/.js/.jsx then index.*).

These run ONLY in extended mode — reference-fidelity output keeps
intra-file resolution so triple P/R is preserved (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SALT = 8


def symbol_table(entities: DataFrame) -> DataFrame:
    """Broadcastable (repo, name, def_uri, def_path, def_line) of defined
    functions / methods / classes. One definition per (repo, name): the
    lexicographically first path then lowest line, so results are
    deterministic under any partitioning."""
    defs = entities.filter(F.col("kind").isin("function", "method", "class")).select(
        "repo", "name", F.col("uri").alias("def_uri"), F.col("path").alias("def_path"),
        F.col("line").alias("def_line"),
    )
    w = Window.partitionBy("repo", "name").orderBy("def_path", "def_line")
    return defs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def resolve_cross_file_calls(entities: DataFrame) -> DataFrame:
    """Unresolved simple-identifier call mentions → definitions, via a
    salted broadcast hash join. Returns (repo, call_uri, caller_path,
    callee_uri, name)."""
    mentions = (
        entities.filter(
            (F.col("kind") == "call")
            & F.col("callee_uri").isNull()
            & ~F.col("callee_name").contains(".")
        )
        .select(
            "repo",
            F.col("uri").alias("call_uri"),
            F.col("path").alias("caller_path"),
            F.col("callee_name").alias("name"),
        )
        .withColumn("_salt", F.pmod(F.xxhash64("call_uri"), F.lit(SALT)))
    )
    syms = symbol_table(entities).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    resolved = mentions.join(
        F.broadcast(syms), on=["repo", "name", "_salt"], how="inner"
    )
    # don't re-link a call to a definition in its own file: the in-UDF pass
    # already did intra-file resolution with the reference's exact scoping
    return resolved.filter(F.col("caller_path") != F.col("def_path")).select(
        "repo", "call_uri", "caller_path", F.col("def_uri").alias("callee_uri"), "name"
    )


def nearest_line_resolution(
    refs: DataFrame, defs: DataFrame
) -> DataFrame:
    """A10: resolve (repo, path, name, ref_line) references to the entity
    with the nearest line among same-(repo,path,name) definitions
    (lsp_client.py:861). refs: (repo, path, name, ref_line); defs:
    (repo, path, name, uri, line)."""
    j = refs.join(defs, ["repo", "path", "name"])
    w = Window.partitionBy("repo", "path", "name", "ref_line").orderBy(
        F.abs(F.col("line") - F.col("ref_line")), F.col("line")
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("repo", "path", "name", "ref_line", "uri", "line")
    )


def resolve_import_candidates(entities: DataFrame) -> DataFrame:
    """A11: extensionless relative imports → the first existing candidate
    path by priority (ast_parser.py:613-624 candidate order). Returns
    (repo, import_uri, resolved_module_uri)."""
    cands = (
        entities.filter((F.col("kind") == "import") & (F.size("import_candidates") > 0))
        .select(
            "repo",
            F.col("uri").alias("import_uri"),
            F.posexplode("import_candidates").alias("prio", "cand_path"),
        )
    )
    files = entities.filter(F.col("kind") == "module").select(
        "repo", F.col("path").alias("cand_path")
    )
    hit = cands.join(files, ["repo", "cand_path"])
    w = Window.partitionBy("repo", "import_uri").orderBy("prio")
    return (
        hit.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "repo",
            "import_uri",
            F.concat(
                F.lit("http://codebase.local/"), F.col("cand_path"), F.lit("#module")
            ).alias("resolved_module_uri"),
        )
    )


def extended_call_edges(entities: DataFrame) -> DataFrame:
    """Extra (subj, pred, obj) rows for cross-file resolution — additive,
    behind a flag (emits the same edge predicates the intra-file pass
    uses). Keep separate from reference-fidelity triples when comparing."""
    res = resolve_cross_file_calls(entities)
    calls_fn = res.select(
        "repo", F.col("call_uri").alias("subj"), F.lit("code:callsFunction").alias("pred"),
        F.col("callee_uri").alias("obj"), F.lit(True).alias("is_uri"), F.lit("uri").alias("dtype"),
    )
    called_at = res.select(
        "repo", F.col("callee_uri").alias("subj"), F.lit("code:calledAt").alias("pred"),
        F.col("call_uri").alias("obj"), F.lit(True).alias("is_uri"), F.lit("uri").alias("dtype"),
    )
    return calls_fn.unionByName(called_at)
