"""Corpus-preparation ops: decontamination, sharding, stratified
sampling, vocabulary, near-dup cluster assignment."""

from collections import Counter

import pyspark.sql.functions as F
import pytest

from codeontology_spark.ops import corpus as C

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, f"src{i % 3}", len(t)) for i, (t, lang) in enumerate(rows)],
        DOC_SCHEMA,
    )


def test_word_ngrams_arithmetic(spark):
    df = spark.range(1).select(
        C.word_ngrams(F.lit("A b  c d e"), 3).alias("g3"),
        C.word_ngrams(F.lit("a b"), 3).alias("short"),
        C.word_ngrams(F.lit("   "), 2).alias("blank"),
    )
    row = df.first()
    assert row.g3 == ["a b c", "b c d", "c d e"]
    # the CASE guard: fewer than n tokens -> empty, NOT a descending
    # sequence explosion
    assert row.short == []
    assert row.blank == []


def test_decontaminate_flags_planted_overlap(spark):
    bench_span = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # contains the full benchmark 8-gram
        (f"prefix words {bench_span} suffix words", "en"),
        # clean
        ("one two three four five six seven eight nine ten", "en"),
        # too short for any 8-gram
        ("tiny doc", "en"),
    ]
    docs = _docs(spark, rows)
    bench = spark.createDataFrame([(0, bench_span)], "bench_id long, text string")
    out = {r.doc_id: r for r in C.decontaminate(docs, bench, n=8).collect()}
    assert len(out) == 3  # every doc gets a row, even the gram-less one
    assert out[0].contaminated == 1 and out[0].n_contaminated >= 1
    assert out[1].contaminated == 0 and out[1].contamination == 0.0
    assert out[2].n_grams == 0 and out[2].contamination == 0.0
    # ratio is over distinct grams
    assert 0 < out[0].contamination <= 1


def test_decontaminate_broadcasts_benchmark(spark):
    docs = _docs(spark, [("a b c d e f g h i j", "en")])
    bench = spark.createDataFrame([(0, "a b c d e f g h")], "bench_id long, text string")
    plan = C.decontaminate(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_shard_corpus_deterministic_and_balanced(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.lit("x y z").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(5).alias("n_chars"),
    )
    a = C.shard_corpus(docs, 16).select("doc_id", "shard").collect()
    b = C.shard_corpus(docs.repartition(7), 16).select("doc_id", "shard").collect()
    assert dict((r.doc_id, r.shard) for r in a) == dict((r.doc_id, r.shard) for r in b)
    shards = [r.shard for r in a]
    assert all(0 <= s < 16 for s in shards)
    stats = C.shard_stats(docs, 16).collect()
    assert len(stats) == 16
    assert sum(r.n_docs for r in stats) == 2000
    assert sum(r.total_chars for r in stats) == 2000 * 5
    # md5 is uniform: no shard should be wildly off 125 +/- ~4 sigma
    assert all(70 <= r.n_docs <= 190 for r in stats)


def test_stratified_sample_rates_and_determinism(spark):
    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
        F.lit("s").alias("source"),
        F.lit(1).alias("n_chars"),
    )
    fr = {"en": 0.5, "de": 0.1}
    got = C.stratified_sample(docs, fr).collect()
    # default fraction 0.0: no zh rows at all
    by_lang = Counter(r.lang for r in got)
    assert set(by_lang) <= {"en", "de"}
    # 1000 docs per lang; binomial 4-sigma bands
    assert 430 <= by_lang["en"] <= 570
    assert 60 <= by_lang["de"] <= 140
    again = C.stratified_sample(docs.repartition(11), fr).collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in again)


def test_top_vocab_matches_python(spark):
    rows = [
        ("the cat sat on the mat", "en"),
        ("the dog ate the cat", "en"),
        ("a cat and a dog", "en"),
    ]
    docs = _docs(spark, rows)
    counts = Counter(w for t, _ in rows for w in t.split())
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    got = [(r.word, r.n) for r in C.top_vocab(docs, k=4).orderBy("rank").collect()]
    assert got == expect


def test_mixture_weights_quantized_arithmetic(spark):
    import math

    rows = [("a b c d", "en")] * 4 + [("x y", "en")] * 2
    docs = spark.createDataFrame(
        [(i, t, lang, "big" if i < 4 else "small", len(t))
         for i, (t, lang) in enumerate(rows)],
        DOC_SCHEMA,
    )
    out = {r.source_key: r for r in C.mixture_weights(docs).collect()}
    toks = {"big": 16, "small": 4}  # 4 docs x 4 words, 2 docs x 2 words
    q = {s: math.floor(math.sqrt(n) * 1e6) for s, n in toks.items()}
    denom = sum(q.values())
    for s in toks:
        assert out[s].n_tokens == toks[s]
        assert out[s].weight == round(q[s] / denom, 6)
    # sqrt rebalancing upweights the small source vs proportional
    assert out["small"].weight > toks["small"] / sum(toks.values())
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 2e-6


def _py_jaccard(a, b, width=5):
    sa = {a[i : i + width] for i in range(max(len(a) - width + 1, 1))}
    sb = {b[i : i + width] for i in range(max(len(b) - width + 1, 1))}
    return round(len(sa & sb) / len(sa | sb), 4)


def test_dedup_clusters_transitive(spark):
    # A~B and B~C above threshold, A~C below: transitivity must still
    # put all three in one cluster. D/E are byte-identical (exact-dup
    # star edge). F is unrelated and must not appear in the drop list.
    base = "".join(f"{i:02d}" for i in range(60))  # 120 non-repeating chars
    a = base
    b = "ABCDEFGHIJKL" + base[12:]
    c = "ABCDEFGHIJKL" + base[12:50] + "MNOPQRSTUVWXYZabcd" + base[68:]
    assert _py_jaccard(a, b) >= 0.6
    assert _py_jaccard(b, c) >= 0.6
    assert _py_jaccard(a, c) < 0.6
    rows = [(a, "en"), (b, "en"), (c, "en"), ("dup dup dup", "en"),
            ("dup dup dup", "en"), ("totally unrelated text here", "en")]
    docs = _docs(spark, rows)
    out = {r.doc_id: r.canonical_id
           for r in C.dedup_clusters(docs, threshold=0.6, max_df=None).collect()}
    assert out == {1: 0, 2: 0, 4: 3}


def test_word_ngrams_random_parity(spark):
    # seeded sweep: 200 random texts (odd whitespace, unicode, empties)
    # vs a pure-python reference, one Spark job
    import random

    rng = random.Random(42)
    alphabet = ["foo", "BAR", "b", "", " ", "\t", "héllo", "1", "x" * 30]
    texts = [
        " ".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12)))
        for _ in range(200)
    ]

    def py_ngrams(t, n):
        toks = [w for w in t.lower().split() if w]
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for n in (1, 3, 8):
        got = {
            r.doc_id: r.g
            for r in df.select(
                "doc_id", C.word_ngrams(F.col("text"), n).alias("g")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == py_ngrams(t, n), (n, repr(t))


def test_benchmark_slice_shape(spark):
    docs = _docs(
        spark,
        [(" ".join(f"w{i}" for i in range(30)), "en") for _ in range(3)],
    )
    bench = C.benchmark_slice(docs, every=2, start=5, length=4).collect()
    assert sorted(r.bench_id for r in bench) == [0, 2]
    assert all(r.text == "w4 w5 w6 w7" for r in bench)


def test_c4_line_filter_gates(spark):
    from codeontology_spark.ops.text import c4_line_filter

    pages = [
        # 0: clean page — 3 good lines survive, 1 bad line dropped
        "This line is fine.\nshort.\nAnother good line here!\nIs this ok?",
        # 1: too few surviving lines → page dropped, stats still reported
        "Only one good line here.\nnope\nstill nope",
        # 2: lorem ipsum tell → dropped even with enough good lines
        "Good line one here.\nGood line two here.\nLorem Ipsum dolor sit.",
        # 3: brace tell (code) → dropped
        "function f() {\nGood line one here.\nGood line two here.\nGood line three here.",
        # 4: line with trailing quote after punctuation counts as terminal
        'He said "stop".\nShe replied "why?"\nThird good line here.',
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(pages)], DOC_SCHEMA
    )
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}

    assert (out[0]["n_lines"], out[0]["n_kept"], out[0]["keep_page"]) == (4, 3, True)
    assert out[0]["clean_text"] == (
        "This line is fine.\nAnother good line here!\nIs this ok?"
    )
    assert out[1]["keep_page"] is False and out[1]["n_kept"] == 1
    assert out[1]["clean_text"] is None  # dropped page carries no text
    assert out[2]["keep_page"] is False and out[2]["n_kept"] == 3
    assert out[3]["keep_page"] is False  # brace gate, not line count
    assert out[4]["keep_page"] is True and out[4]["n_kept"] == 3


def test_pack_sequences_layout(spark):
    from codeontology_spark.ops.corpus import pack_sequences

    # single shard so the concatenation order is just doc_id order:
    # token counts 5, 0 (empty), 6, 4 with seq_len=8 →
    # stream offsets 0, 5, 5, 11; doc 2 straddles the 8-token boundary
    texts = ["a b c d e", "", "f g h i j k", "l m n o"]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, seq_len=8, n_shards=1).collect()
    }
    assert [(out[i]["n_tokens"], out[i]["start_offset"]) for i in range(4)] == [
        (5, 0), (0, 5), (6, 5), (4, 11)
    ]
    assert (out[0]["start_seq"], out[0]["end_seq"]) == (0, 0)
    assert (out[1]["start_seq"], out[1]["end_seq"]) == (0, 0)  # empty doc
    assert (out[2]["start_seq"], out[2]["end_seq"]) == (0, 1)  # straddles
    assert (out[3]["start_seq"], out[3]["end_seq"]) == (1, 1)

    # sharded layout is a pure function of doc_id: same placement under
    # any input partitioning
    a = sorted(map(tuple, pack_sequences(df.repartition(7), 8, 4).collect()))
    b = sorted(map(tuple, pack_sequences(df.coalesce(1), 8, 4).collect()))
    assert a == b


def test_pack_sequences_derived_shards(spark):
    """VERDICT r5 next-round #4: with n_shards unset, pack_sequences must
    derive the shard count from the corpus size estimate so the per-shard
    running-sum window can never become a single-task straggler. Pins the
    derivation: floor of PACK_MIN_SHARDS for small inputs, one shard per
    PACK_BYTES_PER_SHARD above it, and the derived default must produce
    the same layout as passing the value explicitly."""
    from codeontology_spark.ops.corpus import (
        PACK_BYTES_PER_SHARD,
        PACK_MIN_SHARDS,
        derive_pack_shards,
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(i, "a b c", "en", "s", 5) for i in range(40)], DOC_SCHEMA
    )
    # tiny corpus → the floor
    assert derive_pack_shards(df) == PACK_MIN_SHARDS
    # derivation formula: ceil(bytes / PACK_BYTES_PER_SHARD), floored
    assert PACK_MIN_SHARDS == 64 and PACK_BYTES_PER_SHARD == 256 << 20
    # default (derived) layout == explicit layout at the derived count
    a = sorted(map(tuple, pack_sequences(df, 8).collect()))
    b = sorted(map(tuple, pack_sequences(df, 8, PACK_MIN_SHARDS).collect()))
    assert a == b


def test_pack_sequences_random_parity_and_plan(spark):
    import random

    from codeontology_spark.ops.corpus import _md5_u32, pack_sequences

    rng = random.Random(7)
    texts = [
        " ".join("w%d" % rng.randrange(50) for _ in range(rng.randrange(0, 30)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )
    seq_len, n_shards = 16, 4
    out = pack_sequences(df, seq_len=seq_len, n_shards=n_shards)

    # python reference: same md5 shard formula, concat in doc_id order
    import hashlib

    def shard_of(doc_id):
        return int(hashlib.md5(f"shard:{doc_id}".encode()).hexdigest()[:8], 16) % n_shards

    streams = {}
    expect = {}
    for i, t in enumerate(texts):  # doc_id order == enumeration order
        sh = shard_of(i)
        n = len([w for w in t.split() if w])
        start = streams.get(sh, 0)
        streams[sh] = start + n
        end_tok = start + n - 1 if n else start
        expect[i] = (sh, n, start, start // seq_len, end_tok // seq_len)
    got = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["start_offset"],
                      r["start_seq"], r["end_seq"])
        for r in out.collect()
    }
    assert got == expect

    # plan: the ONLY shuffle is the shard window's hash partitioning
    # (post-execution AQE prints the same exchange in both the final and
    # the initial plan — count unique exchanges, not lines)
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    exchanges = {
        re.sub(r"\[plan_id=\d+\]", "", ln.strip())
        for ln in plan.splitlines()
        if "Exchange" in ln
    }
    assert len(exchanges) == 1 and "hashpartitioning(shard" in next(iter(exchanges))


def test_corpus_freq_score(spark):
    from codeontology_spark.ops.corpus import corpus_freq_score

    # vocab_size=2 → model = {'a': 5, 'b': 3} (count desc, word asc ties)
    texts = ["a a b z", "a b b q r", "a a", ""]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )
    out = {r["doc_id"]: r for r in corpus_freq_score(df, vocab_size=2).collect()}
    # doc 0: words a,a,b,z → oov 1/4, mean (5+5+3+0)/4
    assert (out[0]["n_tokens"], out[0]["oov_ratio"], out[0]["mean_word_count"]) == (4, 0.25, 3.25)
    # doc 1: a,b,b,q,r → oov 2/5, mean (5+3+3)/5
    assert (out[1]["oov_ratio"], out[1]["mean_word_count"]) == (0.4, 2.2)
    # doc 2: all in-vocab
    assert (out[2]["oov_ratio"], out[2]["mean_word_count"]) == (0.0, 5.0)
    # doc 3: empty → zeros, not nulls
    assert (out[3]["n_tokens"], out[3]["oov_ratio"], out[3]["mean_word_count"]) == (0, 0.0, 0.0)


def test_null_text_is_empty_not_poison(spark):
    """Crawl corpora carry null-text rows; token-derived ops must treat
    them as empty documents, not propagate nulls (a null token count
    would silently corrupt e.g. packing offsets via null-skipping sums)."""
    from codeontology_spark.ops.corpus import pack_sequences
    from codeontology_spark.ops.text import c4_line_filter, token_stats

    df = spark.createDataFrame(
        [(0, "a b c", "en", "s", 5), (1, None, "en", "s", 0),
         (2, "d e", "en", "s", 3)],
        DOC_SCHEMA,
    )
    ts = {r["doc_id"]: r for r in token_stats(df).collect()}
    assert (ts[1]["n_tokens"], ts[1]["n_chars"]) == (0, 0)

    pk = {r["doc_id"]: r for r in pack_sequences(df, 4, 1).collect()}
    assert (pk[1]["n_tokens"], pk[1]["start_offset"]) == (0, 3)
    assert pk[2]["start_offset"] == 3  # the null row occupies no tokens

    c4 = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert (c4[1]["n_lines"], c4[1]["n_kept"], c4[1]["keep_page"]) == (1, 0, False)

    # the whole family scores a null row as the empty document
    from codeontology_spark.ops.corpus import corpus_freq_score, dedup_clusters
    from codeontology_spark.ops.dedup import exact_dedup, shingles
    from codeontology_spark.ops.text import (
        bpe_token_stats,
        fingerprint,
        quality_score,
        redact_pii,
    )

    empty_df = spark.createDataFrame(
        [(10, "", "en", "s", 0), (11, None, "en", "s", 0)], DOC_SCHEMA
    )
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(empty_df).collect()}
    assert fp[10] == fp[11]  # null ≡ empty, not a null fingerprint
    ex = exact_dedup(empty_df).collect()
    assert len(ex) == 1 and ex[0]["n_copies"] == 2
    qs = {r["doc_id"]: r for r in quality_score(empty_df).collect()}
    assert (qs[11]["alpha_ratio"], qs[11]["len_ok"]) == (0.0, False)
    bp = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_stats(empty_df).collect()}
    assert bp[11] == 0
    rd = {r["doc_id"]: r["redacted"] for r in redact_pii(empty_df).collect()}
    assert rd[11] == ""
    sh = shingles(empty_df).groupBy("doc_id").count().collect()
    assert {r["doc_id"]: r["count"] for r in sh} == {10: 1, 11: 1}


def test_null_embedding_excluded_not_crash(spark):
    """A crawl row with no vector: ranked last by cosine_topk, excluded
    from the k-means model and assignment (previously a null in the
    min-md5 seed sample crashed centroid collection)."""
    from codeontology_spark.ops.similarity import (
        cosine_topk,
        kmeans_assign,
        kmeans_centroids,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], "a"), (1, None, "b"), (2, [0.5, 0.5], "c"),
         (3, [0.9, 0.1], "a")],
        "vec_id long, embedding array<float>, label string",
    )
    top = cosine_topk(df, [1.0, 0.0], k=4).collect()
    assert [r["vec_id"] for r in top][:3] == [0, 3, 2]
    assert top[3]["cos_sim"] is None  # null vec ranks last, never above

    cents = kmeans_centroids(df, k_cells=2, iters=2)
    assert all(all(x is not None for x in c) for c in cents)
    assigned = kmeans_assign(df, cents).collect()
    assert sorted(r["vec_id"] for r in assigned) == [0, 2, 3]
    assert all(r["cell"] is not None for r in assigned)
