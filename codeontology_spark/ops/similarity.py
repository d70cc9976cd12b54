"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exactness baseline (one broadcast of the
query vector, map-side score, global top-k via orderBy+limit — at cluster
scale Spark turns that into per-partition top-k + a tiny final reduce).
The LSH variant buckets by deterministic random-hyperplane sign bits so
candidate generation is a hash shuffle instead of a full scan per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Top-k rows by cosine to a constant query vector. All-JVM: the vector
    is a literal array, the score is a codegen expression."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        "vec_id",
        "label",
        F.round(cosine(F.col("embedding").cast("array<double>"), q), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def pairwise_label_centroids(emb: DataFrame) -> DataFrame:
    """Per-label centroid summary (first-component mean + count) — the
    aggregation shape IVF coarse quantization needs (avg over array cols
    via posexplode → groupBy (label, pos))."""
    per_dim = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = per_dim.groupBy("label", "pos").agg(F.avg("v").alias("mean_v"))
    dim0 = cent.filter(F.col("pos") == 0).select(
        "label", F.round("mean_v", 4).alias("dim0_mean")
    )
    counts = emb.groupBy("label").agg(F.count("*").alias("n"))
    return counts.join(dim0, "label").select("label", "n", "dim0_mean")


def lsh_hyperplane_buckets(emb: DataFrame, n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: bit i = sign(v · p_i) with
    deterministic pseudo-random planes p_i[j] = (md5-derived in [-1, 1]).
    Candidate pairs then come from a groupBy on the bucket key — the scale
    path for ANN (brute force stays the correctness baseline)."""
    import hashlib

    def plane(i: int) -> list[float]:
        out = []
        for j in range(dim):
            h = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)
            out.append((h / 0x7FFFFFFF) - 1.0)
        return out

    v = F.col("embedding").cast("array<double>")
    bits = []
    for i in range(n_planes):
        p = F.array(*[F.lit(x) for x in plane(i)])
        bits.append(F.when(_dot(v, p) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.select("vec_id", "label", F.concat(*bits).alias("bucket"))


def ann_bucket_candidates(emb: DataFrame, n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Candidate pairs sharing an LSH bucket (a < b), with exact cosine
    re-ranking on the candidates only."""
    b = lsh_hyperplane_buckets(emb, n_planes, dim)
    withv = b.join(emb.select("vec_id", "embedding"), "vec_id")
    a = withv.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"), "bucket")
    c = withv.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"), "bucket")
    pairs = a.join(c, "bucket").filter(F.col("a") < F.col("b"))
    return pairs.select(
        "a",
        "b",
        F.round(cosine(F.col("ea").cast("array<double>"), F.col("eb").cast("array<double>")), 4).alias("cos_sim"),
    )
