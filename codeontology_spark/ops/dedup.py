"""Deduplication operators for a documents corpus.

Scale notes (100 TB): exact dedup is one hash-shuffle on a 64-hex key;
MinHash signatures are map-side (explode → partial min-agg, map-side
combine) with one shuffle on doc_id; the LSH bucket joins shuffle on a
band signature (short key) — the standard way to avoid the O(n²) pair
explosion. Two skew guards protect the band joins themselves:

1. **exact-dup pre-collapse** (`canonical_docs`): an exact-duplicate
   cluster of c docs shares *every* band signature, so uncollapsed band
   joins emit O(c²) pairs per band — the dominant real-world blowup
   (boilerplate pages duplicated millions of times). Near-dup pair ops
   therefore run over one representative per distinct text; the collapsed
   copies are recoverable from `exact_dedup`.
2. **hot-bucket caps**: a deterministic row_number ≤ max_bucket per
   (band, signature) bounds any single bucket's self-join at
   max_bucket²/2 pairs no matter how skewed the corpus (same
   recall-for-boundedness trade as ops/similarity.ann_bucket_candidates).

n-gram Jaccard joins on shingle; its fan-out is bounded by the max_df
hot-shingle cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .layout import est_bytes, spread

SHINGLE = 5  # char-shingle width
K_HASHES = 8  # minhash permutations (one band of 8 rows here)
MAX_BUCKET = 64  # per-(band, signature) hot-bucket cap for minhash joins
SIMHASH_MAX_BUCKET = 256  # per-(band, value) cap for the 16-bit simhash bands


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: canonical = min doc_id per identical text."""
    return (
        docs.groupBy(F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("text_sha"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .select("text_sha", "canonical_id", "n_copies")
    )


def canonical_docs(docs: DataFrame) -> DataFrame:
    """One representative row per distinct text (min doc_id), carrying
    n_copies. Run BEFORE any band join: exact-dup clusters share all band
    signatures, so each c-cluster would otherwise emit O(c²) candidate
    pairs per band; collapsed, it contributes one row."""
    docs = spread(docs)
    canon = docs.groupBy(F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("text_sha")).agg(
        F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies")
    )
    return docs.join(canon.select("doc_id", "n_copies"), "doc_id")


#: max bytes ONE window task may sort before the two-phase salted cap is
#: required — below it a single-task sort cannot straggle (a laptop sorts
#: 64 MB in well under a second), above it the mega-bucket risk is real.
#: Independent of core count, so the choice is data-adaptive, not
#: local-mode tuning.
CAP_SINGLE_WINDOW_MAX_BYTES = 64 << 20


def _cap_bucket(
    df: DataFrame, key: str | list[str], max_bucket: int, src_bytes: int | None = None
) -> DataFrame:
    """Deterministically keep the first max_bucket rows (by doc_id) per
    bucket key — bounds any bucket's self-join regardless of skew, and is
    exactly mirrorable in SQL as a QUALIFY row_number().

    Two forms with byte-identical output (so the SQL oracles never
    change), chosen by the size of the SOURCE corpus (``src_bytes``, the
    caller's Catalyst estimate of the docs table — the banded frame
    itself descends from a localCheckpoint whose LogicalRDD estimate is
    meaningless):

    - source above CAP_SINGLE_WINDOW_MAX_BYTES (or unknown) → two-phase
      salted pre-cap (ops/skew.capped_first_rows): a mega-bucket is
      possible and must never single-task-sort;
    - below it → the plain window: the banded table is strictly smaller
      than the corpus, so even the worst case (every row in one bucket)
      sorts < 64 MB on one task, and the salted pre-pass would only add
      an exchange + sort of the same rows.
    """
    from .skew import capped_first_rows

    if src_bytes is None or src_bytes > CAP_SINGLE_WINDOW_MAX_BYTES:
        return capped_first_rows(df, key, "doc_id", max_bucket)
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy("doc_id")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )


def shingles(docs: DataFrame, width: int = SHINGLE) -> DataFrame:
    """(doc_id, shingle) — char shingles via JVM transform+sequence; the
    whole expansion stays inside codegen, no Python."""
    expr = (
        f"transform(sequence(1, greatest(length(coalesce(text, '')) - {width - 1}, 1)),"
        f" i -> substring(coalesce(text, ''), i, {width}))"
    )
    # spread BEFORE the explode: the per-shingle hashing downstream is the
    # dominant per-row cost, and partitioning by doc_id lets the signature
    # groupBy("doc_id") reuse this exchange instead of adding its own
    return spread(docs).select("doc_id", F.explode(F.expr(expr)).alias("sh"))


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


def minhash_near_dup_pairs(
    docs: DataFrame,
    k: int = K_HASHES,
    width: int = SHINGLE,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """LSH band join: canonical docs sharing the full k-minhash band
    signature. Exact dups are pre-collapsed (canonical_docs) and the
    bucket self-join is capped at max_bucket rows per signature, so pair
    output is bounded even on a corpus that is one giant duplicate
    cluster. Self-join on sig (shuffle on the short band key), a < b."""
    sig = minhash_signatures(canonical_docs(docs), k, width)
    capped = _cap_bucket(sig, "sig", max_bucket, src_bytes=est_bytes(docs))
    a = capped.select(F.col("doc_id").alias("a"), "sig")
    b = capped.select(F.col("doc_id").alias("b"), "sig")
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
    docs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    width: int = SHINGLE,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Banded MinHash LSH: b bands × r rows over b·r hash families. A pair
    is a candidate if it agrees on ALL r rows of ANY band — the standard
    recall/precision knob (P[candidate] = 1-(1-J^r)^b) that single-band
    minhash lacks. Plan: per band, a self-equi-join on the short
    (band_id, band signature) key — b hash shuffles on tiny keys, no
    all-pairs work; the unioned band joins dedup on (a, b).

    Skew guards: exact dups pre-collapsed, per-(band, bsig) row_number cap.
    The signature table is localCheckpoint-ed so the shingle explosion +
    min-agg subtree provably runs ONCE, not once per band branch (without
    it each branch of the union re-derives sig; ReusedExchange usually —
    but not provably — rescues that).

    Plan shape: the b band projections are UNIONED into one (band, bsig)
    table before ONE composite-key cap and ONE self-join — per-band caps
    and joins have identical semantics but cost b separate window/join
    shuffles of the same total bytes plus b× the per-stage overhead (at
    small scale the extra passes dominated the query; at cluster scale
    fewer, larger shuffles beat many small ones)."""
    k = bands * rows_per_band
    src_bytes = est_bytes(docs)
    sig = minhash_wide_signatures(canonical_docs(docs), k, width).localCheckpoint(
        eager=False
    )
    banded = None
    for bnd in range(bands):
        cols = [F.col(f"mh{bnd * rows_per_band + r}") for r in range(rows_per_band)]
        part = sig.select(
            F.lit(bnd).alias("band"), F.concat(*cols).alias("bsig"), "doc_id"
        )
        banded = part if banded is None else banded.unionByName(part)
    capped = _cap_bucket(banded, ["band", "bsig"], max_bucket, src_bytes=src_bytes)
    a = capped.select("band", "bsig", F.col("doc_id").alias("a"))
    b = capped.select("band", "bsig", F.col("doc_id").alias("b"))
    pairs = a.join(b, ["band", "bsig"]).filter(F.col("a") < F.col("b"))
    return pairs.groupBy("a", "b").agg(
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


def _bit_votes(h, n_bits: int, prefix: str):
    """Per-bit ±1 majority-vote aggregates over a token-hash column.
    Branch-free: vote = 2*bit - 1 gives exactly +1 for a set bit and -1
    for a clear one, so the integer sums are identical to the CASE form
    the SQL oracle mirrors, minus 64 codegen branches per row."""
    return [
        F.sum(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)
        ).alias(f"{prefix}{i}")
        for i in range(n_bits)
    ]


def _assemble(prefix: str, n_bits: int):
    out = None
    for i in range(n_bits):
        term = F.when(F.col(f"{prefix}{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        out = term if out is None else out + term
    return out.cast("long")


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over whitespace tokens, as two 32-bit halves
    (sim_hi, sim_lo — bigints in [0, 2³²)): per bit, majority vote of the
    token hashes' bits. Token hash = md5(token); hi = hex chars 1-8,
    lo = hex chars 9-16, each → bigint via conv so the SQL oracle mirrors
    it exactly ('0x'||substr(md5(tok),...))::BIGINT.

    64 bits (vs round 2's 16) is what makes the pigeonhole band join
    subquadratic: each 16-bit band key has 65,536 distinct values, and a
    64-bit fingerprint doesn't birthday-collide until ~2³² docs (16 bits
    collided at ~300). One shuffle: the groupBy is map-side combinable
    (64 partial sums per doc)."""
    toks = spread(docs).select(
        "doc_id", F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("tok")
    )
    md5 = F.md5(F.col("tok"))
    hi = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    toks = toks.select("doc_id", hi.alias("h_hi"), lo.alias("h_lo"))
    votes = toks.groupBy("doc_id").agg(
        *_bit_votes(F.col("h_hi"), 32, "hb"), *_bit_votes(F.col("h_lo"), 32, "lb")
    )
    return votes.select(
        "doc_id", _assemble("hb", 32).alias("sim_hi"), _assemble("lb", 32).alias("sim_lo")
    )


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, max_bucket: int = SIMHASH_MAX_BUCKET
) -> DataFrame:
    """SimHash near-dup pairs: candidates from pigeonhole Hamming-band
    joins over the 64-bit fingerprint, then an exact popcount filter.

    Banding: the 64 bits split into four 16-bit bands (hi>>16, hi&0xffff,
    lo>>16, lo&0xffff) — any pair within Hamming distance ≤ 3 agrees
    exactly on at least one band, so candidate generation is 4 hash
    equi-joins on 16-bit keys (65,536 distinct values per band — the
    round-2 16-bit construction had 32-64, making the join O(n²/64) by
    construction). Exact dups are pre-collapsed and each band bucket is
    capped, so even adversarial corpora stay bounded. The exact
    bit_count(xor) filter removes band-collision false positives.
    Returns (a, b, hamming)."""
    assert 1 <= max_hamming <= 3, "4 fixed 16-bit bands cover hamming <= 3"
    src_bytes = est_bytes(docs)
    sim = simhash64(canonical_docs(docs)).localCheckpoint(eager=False)
    band_exprs = [
        F.shiftright(F.col("sim_hi"), 16).bitwiseAND(F.lit(65535)),
        F.col("sim_hi").bitwiseAND(F.lit(65535)),
        F.shiftright(F.col("sim_lo"), 16).bitwiseAND(F.lit(65535)),
        F.col("sim_lo").bitwiseAND(F.lit(65535)),
    ]
    # union the 4 band projections, then ONE (band, bv) cap and ONE
    # self-join — same semantics as per-band caps/joins, a quarter of the
    # window/join passes (see minhash_banded_pairs note)
    banded = None
    for bnd, bv in enumerate(band_exprs):
        part = sim.select(
            F.lit(bnd).alias("band"), bv.alias("bv"), "doc_id", "sim_hi", "sim_lo"
        )
        banded = part if banded is None else banded.unionByName(part)
    capped = _cap_bucket(banded, ["band", "bv"], max_bucket, src_bytes=src_bytes)
    a = capped.select(
        "band", "bv",
        F.col("doc_id").alias("a"),
        F.col("sim_hi").alias("sa_hi"),
        F.col("sim_lo").alias("sa_lo"),
    )
    b = capped.select(
        "band", "bv",
        F.col("doc_id").alias("b"),
        F.col("sim_hi").alias("sb_hi"),
        F.col("sim_lo").alias("sb_lo"),
    )
    pairs = (
        a.join(b, ["band", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa_hi", "sa_lo", "sb_hi", "sb_lo")
    )
    return (
        pairs.distinct()
        .withColumn(
            "hamming",
            (
                F.bit_count(F.col("sa_hi").bitwiseXOR(F.col("sb_hi")))
                + F.bit_count(F.col("sa_lo").bitwiseXOR(F.col("sb_lo")))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
