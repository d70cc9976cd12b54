"""Spark schemas for the KG-construction pipeline.

Input table shape per BASELINE.json input_hint:
(repo:string, path:string, commit:string, lang:string, content:string).
"""

from __future__ import annotations

from pyspark.sql import types as T

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

_arr = T.ArrayType(T.StringType())

# One row per extracted code entity (URI-deduped within file).
# Mirrors the reference's Pydantic entity layer flattened for Arrow
# (/root/reference/src/models/code_entities.py).
ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("uri", T.StringType(), False),
        T.StructField("line", T.IntegerType(), False),
        T.StructField("col", T.IntegerType(), False),
        T.StructField("end_line", T.IntegerType(), True),
        T.StructField("end_col", T.IntegerType(), True),
        T.StructField("body_hash", T.StringType(), True),
        T.StructField("scope", T.StringType(), True),
        T.StructField("is_async", T.BooleanType(), True),
        T.StructField("is_generator", T.BooleanType(), True),
        T.StructField("is_arrow", T.BooleanType(), True),
        T.StructField("is_exported", T.BooleanType(), True),
        T.StructField("is_default_export", T.BooleanType(), True),
        T.StructField("is_static", T.BooleanType(), True),
        T.StructField("is_private", T.BooleanType(), True),
        T.StructField("is_constructor", T.BooleanType(), True),
        T.StructField("is_const", T.BooleanType(), True),
        T.StructField("is_let", T.BooleanType(), True),
        T.StructField("is_var", T.BooleanType(), True),
        T.StructField("init_value", T.StringType(), True),
        T.StructField("module_type", T.StringType(), True),
        T.StructField("module_path", T.StringType(), True),
        T.StructField("import_type", T.StringType(), True),
        T.StructField("imported_symbols", _arr, True),
        T.StructField("export_type", T.StringType(), True),
        T.StructField("callee_name", T.StringType(), True),
        T.StructField("caller_uri", T.StringType(), True),
        T.StructField("callee_uri", T.StringType(), True),
        T.StructField("is_method_call", T.BooleanType(), True),
        T.StructField("arguments", _arr, True),
        T.StructField("calls", _arr, True),
        T.StructField("parent_class_uri", T.StringType(), True),
        T.StructField("is_rest", T.BooleanType(), True),
        T.StructField("extends_name", T.StringType(), True),
        T.StructField("functions", _arr, True),
        T.StructField("classes", _arr, True),
        T.StructField("methods", _arr, True),
        T.StructField("exports", _arr, True),
        T.StructField("imports", _arr, True),
        T.StructField("import_candidates", _arr, True),
        T.StructField("content_sha256", T.StringType(), True),  # module rows
        T.StructField("docstring", T.StringType(), True),
        T.StructField("comments", _arr, True),
    ]
)

# RDF-style triple table. obj is the lexical form; dtype disambiguates.
TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("is_uri", T.BooleanType(), False),
        T.StructField("dtype", T.StringType(), False),
    ]
)

# Per-partition lineage rows (north rule: checkpoint/resume bookkeeping).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("repo", T.StringType(), True),
        T.StructField("n_files", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("min_path", T.StringType(), True),
        T.StructField("max_path", T.StringType(), True),
        T.StructField("wall_ms", T.DoubleType(), False),
    ]
)
