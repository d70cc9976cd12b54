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
    # zero-norm guard: a zero embedding scores 0.0, matching the driver-side
    # _cos_py — without it the division yields NaN, which sorts GREATEST in
    # Spark struct max and would hijack kmeans_assign/_argmax_cell ranking
    denom = _norm(a) * _norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(a, b) / denom)


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


def plane_values(i: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane i: component j is md5-derived
    in [-1, 1] — reproducible on both the Spark and the SQL-oracle side."""
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)
        out.append((h / 0x7FFFFFFF) - 1.0)
    return out


def embedding_dim(emb: DataFrame) -> int:
    """Derive the embedding dimension from the data and fail fast on ragged
    input. Without this, a dim mismatch makes zip_with pad with nulls, the
    dot goes null, `when(null >= 0)` routes every vector to one bucket, and
    the candidate join silently degenerates to an O(n²) cross join."""
    row = emb.select(
        F.min(F.size("embedding")).alias("lo"), F.max(F.size("embedding")).alias("hi")
    ).first()
    if row["lo"] is None:
        raise ValueError("embedding column is empty")
    if row["lo"] != row["hi"]:
        raise ValueError(f"ragged embedding dims: min={row['lo']} max={row['hi']}")
    return int(row["lo"])


def planes_for_corpus(n_rows: int, target_bucket: int = 64, lo: int = 4, hi: int = 24) -> int:
    """Scale the number of hyperplanes with corpus size so the *expected*
    bucket holds ~target_bucket vectors: 2^planes ≈ n/target. At 10⁹
    vectors that is ~24 planes / 16M buckets instead of a fixed 256."""
    import math

    if n_rows <= target_bucket:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_rows / target_bucket))))


def lsh_hyperplane_buckets(
    emb: DataFrame, n_planes: int | None = None, dim: int | None = None
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: bit i = sign(v · p_i).
    Candidate pairs then come from a join on the bucket key — the scale
    path for ANN (brute force stays the correctness baseline)."""
    if dim is None:
        dim = embedding_dim(emb)
    if n_planes is None:
        n_planes = planes_for_corpus(emb.count())
    v = F.col("embedding").cast("array<double>")
    bits = []
    for i in range(n_planes):
        p = F.array(*[F.lit(x) for x in plane_values(i, dim)])
        bits.append(F.when(_dot(v, p) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.select("vec_id", "label", F.concat(*bits).alias("bucket"))


def ann_multiprobe_candidates(
    emb: DataFrame,
    n_planes: int | None = None,
    dim: int | None = None,
    max_bucket: int = 32,
    n_probes: int = 4,
) -> DataFrame:
    """Multi-probe LSH candidates: each vector probes its home bucket plus
    the `n_probes` buckets at Hamming distance 1 (first n_probes bits
    flipped), recovering near neighbors that a single sign flip pushed
    into an adjacent bucket — the standard recall knob that avoids adding
    planes (which would square the bucket count). Plan: explode the probe
    list (n_probes+1 short strings per row) and hash-join probe → home; a
    distance-d pair matches exactly one probe, so no dedup shuffle is
    needed beyond the aggregate. Hot buckets capped like
    ann_bucket_candidates."""
    from .skew import capped_first_rows

    b = lsh_hyperplane_buckets(emb, n_planes, dim)
    b = capped_first_rows(b, "bucket", "vec_id", max_bucket)
    probes = [F.col("bucket")]
    for i in range(1, n_probes + 1):
        flipped = F.concat(
            F.substring("bucket", 1, i - 1),
            F.when(F.substring("bucket", i, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
            F.expr(f"substring(bucket, {i + 1})"),
        )
        probes.append(flipped)
    withv = b.join(emb.select("vec_id", "embedding"), "vec_id")
    a = withv.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea"),
        F.explode(F.array(*probes)).alias("probe"),
    )
    c = withv.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb"),
        F.col("bucket").alias("probe"),
    )
    pairs = a.join(c, "probe").filter(F.col("a") < F.col("b"))
    return pairs.select(
        "a",
        "b",
        F.round(
            cosine(F.col("ea").cast("array<double>"), F.col("eb").cast("array<double>")), 4
        ).alias("cos_sim"),
    )


def _lit_vec(vals) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in vals])


def _argmax_cell(sims: list) -> "F.Column":
    """Index of the max-cosine centroid, ties → smallest cell id: compare
    struct(sim, -cell) field-wise (all codegen, no UDF)."""
    packed = F.array(
        *[F.struct(s.alias("sim"), F.lit(-i).alias("negcell")) for i, s in enumerate(sims)]
    )
    return (-F.array_max(packed)["negcell"]).cast("int")


def kmeans_centroids(
    emb: DataFrame, k_cells: int = 8, iters: int = 2
) -> list[list[float]]:
    """Seeded deterministic spherical k-means coarse quantizer.

    Init = the k_cells vectors with the smallest md5(vec_id) (a min-k
    hash sample — deterministic, no RNG, and exactly mirrorable in SQL).
    Each Lloyd iteration: (1) assign every vector to its max-cosine
    centroid — a map-only pass against the BROADCAST centroid literals
    (k·dim doubles, the standard distributed-kmeans shape; no cross join,
    no shuffle); (2) recompute centroids as per-(cell, dim) means — one
    map-side-combinable shuffle on (cell, pos) with k·dim groups. The only
    driver traffic is the k×dim centroid matrix per iteration, same class
    as collecting the query vector. Ties in assignment break to the
    smallest cell id (mirrored in the SQL twin).

    Null embeddings are excluded from the model: a crawl row with no
    vector can neither seed nor pull a centroid (previously a null
    landing in the min-md5 seed sample crashed the collect)."""
    emb = emb.filter(F.col("embedding").isNotNull())
    seeds = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k_cells)
        .collect()
    )
    cents = [list(r["e"]) for r in seeds]
    v = F.col("embedding").cast("array<double>")
    for _ in range(iters):
        sims = [cosine(v, _lit_vec(c)) for c in cents]
        assigned = emb.select("vec_id", v.alias("e"), _argmax_cell(sims).alias("cell"))
        per_dim = assigned.select("cell", F.posexplode("e").alias("pos", "x"))
        rows = (
            per_dim.groupBy("cell", "pos")
            .agg(F.avg("x").alias("c"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("cell", F.col("pc.c").alias("centroid"))
            .collect()
        )
        new = {r["cell"]: list(r["centroid"]) for r in rows}
        # empty cells keep their previous centroid (deterministic; mirrored)
        cents = [new.get(i, cents[i]) for i in range(k_cells)]
    return cents


def kmeans_assign(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, cell) for the final centroids — map-only, broadcast
    literals. Null embeddings get no row (they belong to no cell)."""
    emb = emb.filter(F.col("embedding").isNotNull())
    v = F.col("embedding").cast("array<double>")
    sims = [cosine(v, _lit_vec(c)) for c in cents]
    return emb.select("vec_id", _argmax_cell(sims).alias("cell"))


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    n_probe: int = 3,
    k: int = 10,
    k_cells: int = 8,
    iters: int = 2,
) -> DataFrame:
    """IVF ANN with a REAL coarse quantizer: seeded deterministic k-means
    cells (kmeans_centroids — round 2 used the label column as a
    placeholder); the query probes the n_probe nearest cells by centroid
    cosine, then brute-forces only those cells — scanning n_probe/k_cells
    of the corpus instead of all of it. At 10⁹ vectors the same plan holds:
    centroids are broadcast literals, the assignment is map-only, and the
    probed-cell scan is a partition-prunable filter when the corpus is
    written bucketed by cell."""
    cents = kmeans_centroids(emb, k_cells, iters)
    probe = rank_cells(cents, query_vec)[:n_probe]
    assigned = kmeans_assign(emb, cents)
    cells = emb.join(
        assigned.filter(F.col("cell").isin(probe)).select("vec_id"),
        "vec_id",
        "left_semi",
    )
    return cosine_topk(cells, query_vec, k)


def rank_cells(cents: list[list[float]], query_vec) -> list[int]:
    """Cell ids by descending centroid cosine to the query (ties → smaller
    id) — the driver-side probe ranking, k·dim work on tiny data."""
    q = [float(x) for x in query_vec]
    return sorted(range(len(cents)), key=lambda i: (-_cos_py(cents[i], q), i))


def write_ivf_index(emb: DataFrame, cents: list[list[float]], path: str) -> None:
    """Materialize the IVF index: the corpus written `partitionBy("cell")`
    so each coarse-quantizer cell is its own directory. This is what makes
    probing sublinear IN I/O, not just in compute: a probe query's
    `cell IN (...)` filter becomes partition pruning — the scan reads
    n_probe directories of the k_cells total and the other cells' bytes
    are never opened (asserted on the plan's PartitionFilters in tests).
    At 10⁹ vectors, cells are large parquet files and this is the standard
    IVF layout."""
    assigned = kmeans_assign(emb, cents)
    (
        emb.join(assigned, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    index_path: str,
    cents: list[list[float]],
    query_vec: list[float],
    n_probe: int = 3,
    k: int = 10,
) -> DataFrame:
    """IVF top-k over a materialized index (write_ivf_index): rank cells by
    centroid cosine driver-side, scan ONLY the n_probe winning directories
    (partition-pruned), brute-force cosine within them. Same results as
    ivf_topk with the same centroids — the difference is the probed scan
    reads n_probe/k_cells of the bytes."""
    probe = rank_cells(cents, query_vec)[:n_probe]
    cells = spark.read.parquet(index_path).filter(F.col("cell").isin(probe))
    return cosine_topk(cells, query_vec, k)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    dim: int | None = None,
    max_bucket: int = 32,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection — the semantic member of
    the dedup family (exact/minhash/simhash catch lexical duplication;
    this catches paraphrases that share an embedding neighborhood).
    Candidates come from the LSH bucket join (hash shuffle, capped
    buckets, never O(n²)); the exact cosine filter keeps pairs at or
    above `threshold`. Returns (a, b, cos_sim)."""
    cands = ann_bucket_candidates(emb, n_planes=n_planes, dim=dim, max_bucket=max_bucket)
    return cands.filter(F.col("cos_sim") >= threshold)


def _cos_py(a: list[float], b: list[float]) -> float:
    """Driver-side cosine over two tiny vectors (centroid ranking only) —
    sequential fold, same summation order as the SQL twin."""
    import math

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb)) if na and nb else 0.0


def ann_bucket_candidates(
    emb: DataFrame,
    n_planes: int | None = None,
    dim: int | None = None,
    max_bucket: int = 32,
) -> DataFrame:
    """Candidate pairs sharing an LSH bucket (a < b), with exact cosine
    re-ranking on the candidates only.

    Hot buckets are capped: a deterministic row_number over (bucket, vec_id)
    keeps the first `max_bucket` vectors per bucket, bounding the
    within-bucket self-join at max_bucket·(max_bucket−1)/2 pairs no matter
    how skewed the corpus — the standard recall-for-boundedness trade; at
    scale, planes_for_corpus already sizes the expected bucket below the
    cap, so the cap only trims pathological hot spots. The cap itself is
    the two-phase skew-safe form (ops/skew.capped_first_rows): identical
    output, no single-task sort of a mega-bucket."""
    from .skew import capped_first_rows

    b = lsh_hyperplane_buckets(emb, n_planes, dim)
    b = capped_first_rows(b, "bucket", "vec_id", max_bucket)
    withv = b.join(emb.select("vec_id", "embedding"), "vec_id")
    a = withv.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"), "bucket")
    c = withv.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"), "bucket")
    pairs = a.join(c, "bucket").filter(F.col("a") < F.col("b"))
    return pairs.select(
        "a",
        "b",
        F.round(cosine(F.col("ea").cast("array<double>"), F.col("eb").cast("array<double>")), 4).alias("cos_sim"),
    )
