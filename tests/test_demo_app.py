"""Demo-app corpus (the reference's richest sample codebase): extraction
breadth + Spark-vs-oracle structural equality on realistic Next.js-style
files (hooks, arrows, classes, JSX, template literals, method chains)."""

import pytest
from pyspark.sql import functions as F

from codeontology_spark.compare import canonicalize, diff, precision_recall
from codeontology_spark.fixtures import DEMO_FILES
from codeontology_spark.jsparse import extract_file
from codeontology_spark.pipeline import build_graph
from codeontology_spark.schemas import INPUT_SCHEMA

from oracle_emit import oracle_triples


def test_demo_extraction_breadth():
    svc = extract_file("lib/userService.js", DEMO_FILES["lib/userService.js"])
    cls = [e for e in svc if e.kind == "class"][0]
    assert cls.name == "UserService" and len(cls.methods) == 7
    meths = {e.name: e for e in svc if e.kind == "method"}
    assert meths["getUserById"].is_async and not meths["constructor"].is_async
    api = extract_file("pages/api/users.js", DEMO_FILES["pages/api/users.js"])
    assert len([e for e in api if e.kind == "call"]) >= 20
    ui = extract_file("components/UserProfile.jsx", DEMO_FILES["components/UserProfile.jsx"])
    arrows = [e for e in ui if e.kind == "function" and e.is_arrow]
    assert len(arrows) >= 3  # useEffect/handler callbacks


def test_demo_triples_match_oracle(spark):
    rows = [
        ("demo/app", path, "c0ffee", "javascript", content)
        for path, content in sorted(DEMO_FILES.items())
    ]
    src = spark.createDataFrame(rows, schema=INPUT_SCHEMA).coalesce(1)
    res = build_graph(src, persist=True)
    actual = [
        (r.subj, r.pred, r.obj, r.is_uri, r.dtype) for r in res.triples.collect()
    ]
    expected = []
    for path, content in DEMO_FILES.items():
        if path.endswith(".json"):
            continue  # extension filter drops package.json (processor.py:236)
        expected.extend(oracle_triples(path, extract_file(path, content)))
    pr = precision_recall(canonicalize(expected), canonicalize(actual))
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, (
        pr,
        diff(canonicalize(expected), canonicalize(actual)),
    )
    res.unpersist()
