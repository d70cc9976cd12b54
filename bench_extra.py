"""Extra benchmarks (guide §1.4/§1.5): noop-sink isolation of operator
SUB-stages, so the per-query seconds in bench.py can be attributed to the
right operator internals. bench.py itself is frozen for measurement; the
numbers here are cited as evidence in OPTIMIZATION_r06.md only.

Usage: python bench_extra.py [name ...]   (default: all probes)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS   (default 32)
Each probe runs 3 consecutive trials, prints best/median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from codeontology_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    E._ship_pkg(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from codeontology_spark.ops import corpus as CP
    from codeontology_spark.ops import dedup as D

    def probe_minhash_sig():
        return D.minhash_signatures(docs)

    def probe_minhash_wide_sig():
        return D.minhash_wide_signatures(D.canonical_docs(docs))

    def probe_banded_full():
        return D.minhash_banded_pairs(docs)

    def probe_canonical():
        return D.canonical_docs(docs)

    def probe_simhash64_canon():
        return D.simhash64(D.canonical_docs(docs))

    def probe_simhash_pairs_full():
        return D.simhash_near_dup_pairs(docs)

    def probe_jaccard_t06():
        return D.ngram_jaccard_pairs(docs, threshold=0.6, max_df=64)

    def probe_dedup_clusters_full():
        return CP.dedup_clusters(docs, threshold=0.6, max_df=64)

    def probe_shingles_distinct():
        from pyspark.sql import functions as F

        return D.shingles(docs).distinct().groupBy("doc_id").agg(F.count("*").alias("n"))

    probes = {
        "minhash_sig": probe_minhash_sig,
        "minhash_wide_sig": probe_minhash_wide_sig,
        "banded_full": probe_banded_full,
        "canonical": probe_canonical,
        "simhash64_canon": probe_simhash64_canon,
        "simhash_pairs_full": probe_simhash_pairs_full,
        "jaccard_t06": probe_jaccard_t06,
        "dedup_clusters_full": probe_dedup_clusters_full,
        "shingles_distinct": probe_shingles_distinct,
    }
    names = sys.argv[1:] or list(probes)
    out = {}
    for name in names:
        fn = probes[name]
        ts = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            _noop(fn())
            ts.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(ts), "median": statistics.median(ts), "trials": ts}
        print(f"[extra] {name}: best {min(ts)}s trials {ts}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
