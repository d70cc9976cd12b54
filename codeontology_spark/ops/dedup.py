"""Deduplication operators for a documents corpus.

Scale notes (100 TB): exact dedup is one hash-shuffle on a 64-hex key;
MinHash signatures are map-side (explode → partial min-agg, map-side
combine) with one shuffle on doc_id; the LSH bucket join shuffles on the
band signature (short string), which is the standard way to avoid the
O(n²) pair explosion; n-gram Jaccard joins on shingle — its fan-out is
bounded by shingle frequency, so at scale you'd cap hot shingles
(df-style stopword dropping) before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE = 5  # char-shingle width
K_HASHES = 8  # minhash permutations (one band of 8 rows here)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: canonical = min doc_id per identical text."""
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("text_sha"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .select("text_sha", "canonical_id", "n_copies")
    )


def shingles(docs: DataFrame, width: int = SHINGLE) -> DataFrame:
    """(doc_id, shingle) — char shingles via JVM transform+sequence; the
    whole expansion stays inside codegen, no Python."""
    expr = f"transform(sequence(1, greatest(length(text) - {width - 1}, 1)), i -> substring(text, i, {width}))"
    return docs.select("doc_id", F.explode(F.expr(expr)).alias("sh"))


def minhash_signatures(docs: DataFrame, k: int = K_HASHES, width: int = SHINGLE) -> DataFrame:
    """One-band MinHash: k hash families from ONE sha256 per shingle.

    Hash family i = the i-th 8-hex slice of sha256(shingle) — 64 hex chars
    give 8 independent families from a single digest (hashing dominates the
    cost at 10^7+ shingles; round 1 paid 2 md5 calls for the same 8
    families). Min of a fixed-width hex slice equals the numeric min, so no
    int conversion is needed and the DuckDB oracle reproduces it
    byte-for-byte. The groupBy is map-side combinable (partial min).
    """
    assert k <= 8
    sh = shingles(docs, width)
    h0 = F.sha2(F.col("sh"), 256)
    aggs = [
        F.min(F.substring(h0, i * 8 + 1, 8)).alias(f"mh{i}") for i in range(k)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.concat_ws("", *[F.col(f"mh{i}") for i in range(k)]).alias("sig")
    )


def minhash_near_dup_pairs(docs: DataFrame, k: int = K_HASHES, width: int = SHINGLE) -> DataFrame:
    """LSH band join: docs sharing the full k-minhash band signature.
    Self-join on sig (shuffle on the short band key), a < b."""
    sig = minhash_signatures(docs, k, width)
    a = sig.select(F.col("doc_id").alias("a"), "sig")
    b = sig.select(F.col("doc_id").alias("b"), "sig")
    return a.join(b, "sig").filter(F.col("a") < F.col("b")).select("a", "b", "sig")


def minhash_wide_signatures(docs: DataFrame, k: int = 16, width: int = SHINGLE) -> DataFrame:
    """k ≤ 16 minhash values as separate columns mh0..mh{k-1}. Hash family
    i = the (i%8)-th 8-hex slice of sha256(shingle) (i < 8) or of
    sha256('x' ∥ shingle) — 2 digests per shingle for 16 families (round 1
    used 4 md5 calls; hashing dominates at 10⁷+ shingles). Min of a
    fixed-width hex slice equals the numeric min, so the DuckDB oracle
    mirrors it byte-for-byte; the groupBy is map-side combinable."""
    assert k <= 16
    sh = shingles(docs, width)
    h0 = F.sha2(F.col("sh"), 256)
    h1 = F.sha2(F.concat(F.lit("x"), F.col("sh")), 256)
    aggs = [
        F.min(F.substring(h0 if i < 8 else h1, (i % 8) * 8 + 1, 8)).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_banded_pairs(
    docs: DataFrame, bands: int = 4, rows_per_band: int = 4, width: int = SHINGLE
) -> DataFrame:
    """Banded MinHash LSH: b bands × r rows over b·r hash families. A pair
    is a candidate if it agrees on ALL r rows of ANY band — the standard
    recall/precision knob (P[candidate] = 1-(1-J^r)^b) that single-band
    minhash lacks. Plan: per band, a self-equi-join on the short
    (band_id, band signature) key — b hash shuffles on tiny keys, no
    all-pairs work; the unioned band joins dedup on (a, b)."""
    k = bands * rows_per_band
    sig = minhash_wide_signatures(docs, k, width)
    out = None
    for bnd in range(bands):
        cols = [F.col(f"mh{bnd * rows_per_band + r}") for r in range(rows_per_band)]
        banded = sig.select("doc_id", F.concat(*cols).alias("bsig"))
        a = banded.select(F.col("doc_id").alias("a"), "bsig")
        b = banded.select(F.col("doc_id").alias("b"), "bsig")
        pairs = (
            a.join(b, "bsig")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", F.lit(bnd).alias("band"))
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.groupBy("a", "b").agg(
        F.count("*").alias("n_bands"), F.min("band").alias("first_band")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    width: int = SHINGLE,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Jaccard over distinct char shingles via a sparse similarity join:
    pairs sharing ≥1 shingle, |A∩B| counted by the join, |A|,|B| from
    per-doc distinct counts. Returns pairs with jaccard ≥ threshold.

    `max_df` caps hot-shingle fan-out: shingles appearing in more than
    max_df documents are dropped BEFORE sizes and the pair join (stopword
    shingles carry no near-dup signal but each contributes df² join rows —
    unbounded at corpus scale). Jaccard is then over the filtered shingle
    sets — a documented semantic the SQL oracle mirrors exactly; the join
    output is bounded by max_df · |shingle rows|."""
    sh = shingles(docs, width).distinct()
    if max_df is not None:
        dfc = sh.groupBy("sh").agg(F.count("*").alias("df"))
        sh = sh.join(dfc.filter(F.col("df") <= max_df).select("sh"), "sh")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "sh")
    b = sh.select(F.col("doc_id").alias("b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    j = (
        common.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("a", "b", "jaccard")


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over whitespace tokens: per bit, majority vote of the
    token hashes' bits. Token hash = first 16 bits of md5 (hex → int via
    two-nibble arithmetic so the SQL oracle can mirror it exactly)."""
    toks = docs.select(
        "doc_id", F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("tok")
    )
    h4 = F.substring(F.md5(F.col("tok")), 1, 4)
    hv = F.conv(h4, 16, 10).cast("int")
    toks = toks.select("doc_id", hv.alias("h"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(16)
    ]
    votes = toks.groupBy("doc_id").agg(*bit_aggs)
    sim = None
    for i in range(16):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.cast("int").alias("simhash"))


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 2) -> DataFrame:
    """SimHash near-dup pairs: candidates from Hamming-band joins, then an
    exact popcount filter.

    Pigeonhole banding: split the 16-bit simhash into max_hamming+1 bands —
    any pair within Hamming distance max_hamming agrees exactly on at least
    one band, so candidate generation is (max_hamming+1) hash equi-joins on
    short integer keys instead of an all-pairs scan; the exact
    bit_count(xor) filter then removes band-collision false positives.
    Returns (a, b, hamming)."""
    sim = simhash16(docs)
    n_bands = max_hamming + 1
    width = 16 // n_bands
    widths = [16 - width * (n_bands - 1)] + [width] * (n_bands - 1)
    pairs = None
    shift = 16
    for bnd, w in enumerate(widths):
        shift -= w
        band_val = F.shiftright(F.col("simhash"), shift).bitwiseAND(F.lit((1 << w) - 1))
        banded = sim.select("doc_id", "simhash", band_val.alias("bv"))
        a = banded.select(
            F.col("doc_id").alias("a"), F.col("simhash").alias("sa"), "bv"
        )
        b = banded.select(
            F.col("doc_id").alias("b"), F.col("simhash").alias("sb"), "bv"
        )
        p = a.join(b, "bv").filter(F.col("a") < F.col("b")).select("a", "b", "sa", "sb")
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.groupBy("a", "b")
        .agg(F.first("sa").alias("sa"), F.first("sb").alias("sb"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
