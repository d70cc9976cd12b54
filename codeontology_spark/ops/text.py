"""Text-analysis operators over a documents table (doc_id, text, lang,
source, n_chars). Everything is whole-stage-codegen column expressions —
language ID and quality scoring are shallow heuristics by design (the
per-document cost must stay O(len) at 100 TB)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny stopword sets for n-gram-free language ID; deliberately small so the
# SQL oracle mirrors them verbatim
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
}


def tokens_col(text=None):
    """Non-empty whitespace tokens (JVM split + filter).

    NULL-safe: a null text is an empty token array, not a null one —
    real crawl corpora carry null rows, and a null here poisons every
    derived count downstream (size/sum/window offsets all go null,
    silently corrupting e.g. a packing layout)."""
    if text is None:
        text = F.col("text")
    text = F.coalesce(text, F.lit(""))
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_stats(docs: DataFrame) -> DataFrame:
    toks = tokens_col()
    n_chars = F.length(F.coalesce(F.col("text"), F.lit("")))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_chars.alias("n_chars"),
        (n_chars / F.greatest(F.size(toks), F.lit(1))).cast("double").alias("chars_per_token"),
    ).withColumn("chars_per_token", F.round("chars_per_token", 4))


# GPT-2-style pre-tokenizer, restricted to the Java-regex/RE2 dialect
# intersection (the real pattern's \s+(?!\S) lookahead is not RE2-safe):
# contractions, space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs. Counting matches of this regex approximates BPE token
# counts the way data-pipeline budgeting does it.
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting (the brief's second token-counting mode):
    pre-tokenizer match count + the tokens-per-whitespace-word ratio that
    LLM data budgeting tracks. One regexp pass per doc, O(len), pure
    codegen."""
    toks = tokens_col()
    bpe_n = F.size(F.regexp_extract_all(F.coalesce(F.col("text"), F.lit("")), F.lit(BPE_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        bpe_n.alias("n_bpe_tokens"),
        F.size(toks).alias("n_ws_tokens"),
        F.round(bpe_n / F.greatest(F.size(toks), F.lit(1)), 4).alias(
            "bpe_per_word"
        ),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/alpha/stopword ratio heuristics (rounded for oracle parity).
    Null text scores as the empty document (all-zero ratios, len_ok
    false), not as a null row."""
    toks = tokens_col()
    text = F.coalesce(F.col("text"), F.lit(""))
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    sw = F.size(F.filter(tokens_col(F.lower(F.col("text"))), lambda x: x.isin(STOPWORDS["en"])))
    return docs.select(
        "doc_id",
        F.round(alpha / F.greatest(F.length(text), F.lit(1)), 4).alias("alpha_ratio"),
        F.round(sw / F.greatest(F.size(toks), F.lit(1)), 4).alias("stopword_ratio"),
        (F.length(text) >= 64).alias("len_ok"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID. Ties break by language name order, which
    the SQL oracle reproduces with the same CASE ordering."""
    toks = tokens_col(F.lower(F.col("text")))

    def _hit(ws):
        # NB: a 2-arg lambda (even with defaults) makes F.filter pass the
        # element INDEX as the second arg — keep arity 1 via this closure
        return F.size(F.filter(toks, lambda x: x.isin(ws)))

    hits = {lang: _hit(ws) for lang, ws in STOPWORDS.items()}
    best = (
        F.when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]), F.lit("en"))
        .when(hits["de"] >= hits["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id",
        hits["en"].alias("hits_en"),
        hits["de"].alias("hits_de"),
        hits["fr"].alias("hits_fr"),
        best.alias("lang_guess"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: sha256 prefix of the lowercased text."""
    return docs.select(
        "doc_id",
        F.substring(F.sha2(F.lower(F.coalesce(F.col("text"), F.lit(""))), 256), 1, 16).alias("fp"),
    )


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 50, overlap: int = 10
) -> DataFrame:
    """Token-bounded document chunking with overlap — the training-data
    prep step between cleaning and tokenization. Chunk i covers tokens
    [i·stride, i·stride + chunk_tokens) with stride = chunk_tokens −
    overlap; the tail chunk may be shorter; empty documents yield no
    chunks. All codegen (split → sequence of starts → explode → slice →
    array_join): per-row cost O(len), output rows ≈ n_tokens/stride —
    no shuffle at all until the caller aggregates.

    Returns (doc_id, chunk_id, chunk_n_tokens, chunk_text)."""
    assert 0 < overlap < chunk_tokens
    stride = chunk_tokens - overlap
    toks = docs.select("doc_id", tokens_col().alias("tk")).filter(F.size("tk") > 0)
    starts = toks.select(
        "doc_id",
        "tk",
        F.explode(
            F.sequence(F.lit(0), F.size("tk") - 1, F.lit(stride))
        ).alias("s"),
    )
    chunk = F.slice(F.col("tk"), F.col("s") + 1, chunk_tokens)
    return starts.select(
        "doc_id",
        (F.col("s") / stride).cast("int").alias("chunk_id"),
        F.size(chunk).alias("chunk_n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Word-repetition quality signals (Gopher-style repetition filters):
    per document, total / distinct word counts, the duplicate-word ratio
    and the most-frequent-word share. Two map-side-combinable aggregations
    — (doc_id, word) counts then a per-doc rollup — so the plan is two
    partial-agg shuffles and no per-row Python at any corpus size.
    Returns (doc_id, n_words, n_distinct_words, dup_word_ratio,
    top_word_share)."""
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("w"))
    per_word = toks.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    agg = per_word.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct_words"),
        F.max("c").alias("top_c"),
    )
    return agg.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.round(1 - F.col("n_distinct_words") / F.col("n_words"), 4).alias(
            "dup_word_ratio"
        ),
        F.round(F.col("top_c") / F.col("n_words"), 4).alias("top_word_share"),
    )


# PII patterns shared by Spark (Java regex) and the DuckDB oracle (RE2):
# restricted to syntax with identical semantics in both dialects — no
# lookaround, no backrefs; \b, \d and {m,} behave the same.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d\-]{7,}\d"


def redact_pii(docs: DataFrame) -> DataFrame:
    """Training-data PII scrub: replace emails / IPv4 addresses /
    international-format phone numbers with typed placeholder tokens, and
    count each category (counted on the ORIGINAL text, so counts are
    independent of replacement order). Pure regexp codegen — the standard
    pre-tokenization scrub pass of an LLM data pipeline, O(len) per doc.
    Emails are redacted before phones so a '+'-digit sequence inside a
    local-part can't double-fire. Returns (doc_id, redacted, n_emails,
    n_ipv4, n_phones)."""
    n = lambda pat: F.size(F.regexp_extract_all(F.coalesce(F.col("text"), F.lit("")), F.lit(pat), F.lit(0)))  # noqa: E731
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        n(EMAIL_RE).alias("n_emails"),
        n(IPV4_RE).alias("n_ipv4"),
        n(PHONE_RE).alias("n_phones"),
    )


def c4_line_filter(
    docs: DataFrame, min_line_words: int = 3, min_kept_lines: int = 3
) -> DataFrame:
    """C4-style line/page cleaning (Raffel et al. 2020, §2.2 — the
    heuristics behind the C4 corpus): a LINE survives iff it ends in
    terminal punctuation and has >= min_line_words whitespace words; a
    PAGE survives iff it keeps >= min_kept_lines lines, contains no
    "lorem ipsum" (any case) and no '{' (code/markup tell). Everything is
    one split + higher-order array filter per document — pure codegen,
    O(len), no shuffle, so at 100 TB this is a map-only pass fused into
    whatever scan precedes it.

    Returns one row per input doc: (doc_id, n_lines, n_kept, keep_page,
    clean_text) with clean_text = surviving lines rejoined for kept
    pages, NULL for dropped ones (the caller filters on keep_page; stats
    stay available for the drop-rate dashboards every corpus run keeps).
    A null text is an empty page: 1 empty line, 0 kept, dropped —
    not a null stats row (see tokens_col on null poisoning).
    """
    text = F.coalesce(F.col("text"), F.lit(""))
    lines = F.split(text, "\n")

    def _good(line):
        t = F.trim(line)
        words = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
        return t.rlike("[.!?\"']$") & (words >= min_line_words)

    # materialize the kept-lines array ONCE in its own projection: five
    # downstream expressions reference it, and CollapseProject would
    # otherwise inline the higher-order filter (a regex pass over every
    # line) into each of them — 4x the per-row CPU at any scale
    staged = docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.filter(lines, _good).alias("_kept"),
        (
            ~F.lower(text).contains("lorem ipsum")
            & ~text.contains("{")
        ).alias("_page_ok"),
    )
    keep_page = (F.size("_kept") >= min_kept_lines) & F.col("_page_ok")
    return staged.select(
        "doc_id",
        "n_lines",
        F.size("_kept").alias("n_kept"),
        keep_page.alias("keep_page"),
        F.when(keep_page, F.array_join("_kept", "\n")).alias("clean_text"),
    )


def clean_corpus(docs: DataFrame, min_alpha: float = 0.6, min_len: int = 64) -> DataFrame:
    """Composite training-data cleaning pipeline — the shape a pretraining
    corpus pass actually runs, as ONE declarative plan Catalyst can fuse:

      1. quality gate: alpha ratio ≥ min_alpha AND length ≥ min_len
         (pure codegen predicates, pushed to the scan),
      2. language gate: stopword-vote English,
      3. exact dedup: keep the min-doc_id canonical per identical text
         (one hash shuffle on sha256(text)).

    Returns (doc_id, n_chars, lang_guess) for the surviving documents.
    At 100 TB the only shuffle is the dedup groupBy on the 64-hex key;
    gates 1-2 run map-side and prune before it."""
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    toks = tokens_col(F.lower(F.col("text")))

    def _hit(ws):
        return F.size(F.filter(toks, lambda x: x.isin(ws)))

    hits = {lang: _hit(ws) for lang, ws in STOPWORDS.items()}
    is_en = (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"])
    gated = docs.filter(
        (alpha / F.greatest(F.length("text"), F.lit(1)) >= min_alpha)
        & (F.length("text") >= min_len)
        & is_en
    )
    canon = (
        gated.groupBy(F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("_sha"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        gated.join(canon, "doc_id", "left_semi")
        .select("doc_id", F.length("text").alias("n_chars"), F.lit("en").alias("lang_guess"))
    )
