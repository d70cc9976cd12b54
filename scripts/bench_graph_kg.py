"""Graph-query family vs a production-sized KG (VERDICT r5 item #7).

Builds the 10k-repo synthetic corpus (~60 M triples — the same corpus the
2→8 scaling gate uses), persists the triple table, then times the graph
operators the star-schema bench cannot stress:

- get_context depth-3 around a module URI (B15),
- SCC over the kg `code:imports` edge slice (B7),
- connected components over the same slice (B19),
- transitive closure is deliberately NOT run here: the imports graph of
  N identical fixture repos has closure size O(N·c) but the operator is
  bounded by max_iters; closure on the full KG is covered by the bench's
  closure_nation_chain instead.

Prints one JSON line with wall seconds and the Spark job count per op
(job count = how many driver round-trips the iterative plan costs — the
scale-relevant number for iterative DataFrame loops).

Usage: python scripts/bench_graph_kg.py [n_repos] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_repos = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import shutil
    import tempfile

    from codeontology_spark.pipeline import build_graph
    from codeontology_spark.session import get_spark
    from codeontology_spark.synth import synth_table

    spark = get_spark(
        "bench_graph_kg", cores=cores, shuffle_partitions=cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext

    tmp = tempfile.mkdtemp(prefix="bench_kg_")
    synth_table(spark, n_repos=n_repos, partitions=cores * 2).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/src")
    src = spark.read.parquet(f"{tmp}/src")

    t0 = time.perf_counter()
    res = build_graph(src, persist=True)
    triples = res.triples.persist()
    n_triples = triples.count()
    build_s = time.perf_counter() - t0

    from codeontology_spark import queries as Q
    from pyspark.sql import functions as F

    def job_count() -> int:
        # PySpark's StatusTracker returns plain lists; job ids for ALL
        # groups via the UI REST API would be overkill — the default group
        # covers everything this script runs
        import urllib.request

        base = sc.uiWebUrl
        app_id = sc.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            return len(json.load(r))

    out = {"n_repos": n_repos, "n_triples": n_triples,
           "build_s": round(build_s, 1), "cores": cores, "ops": {}}

    def run(name, fn):
        sc.setJobDescription(f"kgbench:{name}")
        j0 = job_count()
        t0 = time.perf_counter()
        n_rows = fn()
        wall = time.perf_counter() - t0
        out["ops"][name] = {
            "wall_s": round(wall, 2),
            "jobs": job_count() - j0,
            "rows": n_rows,
        }
        sc.setJobDescription(None)
        print(f"[kgbench] {name}: {wall:.2f}s rows={n_rows}", file=sys.stderr)

    # one module URI that exists in every repo clone — take it from repo 0
    mod_uri = (
        triples.filter(
            (F.col("repo") == "synth/0000000") & (F.col("pred") == "rdf:type")
            & (F.col("obj") == "code:Module")
        ).select("subj").limit(1).collect()
    )
    uri = mod_uri[0]["subj"] if mod_uri else None
    if uri is None:  # repo naming differs — grab any module URI
        r = triples.filter(
            (F.col("pred") == "rdf:type") & (F.col("obj") == "code:Module")
        ).select("repo", "subj").limit(1).collect()[0]
        uri = r["subj"]

    run("get_context_depth3",
        lambda: Q.get_context(triples, uri, depth=3).count())
    imports = Q.edge(triples, "code:imports")
    run("scc_imports",
        lambda: Q.strongly_connected_components(imports).count())
    run("cc_imports",
        lambda: Q.connected_components(imports).count())

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
