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
    """Non-empty whitespace tokens (JVM split + filter)."""
    if text is None:
        text = F.col("text")
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_stats(docs: DataFrame) -> DataFrame:
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        (F.length("text") / F.greatest(F.size(toks), F.lit(1))).cast("double").alias("chars_per_token"),
    ).withColumn("chars_per_token", F.round("chars_per_token", 4))


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/alpha/stopword ratio heuristics (rounded for oracle parity)."""
    toks = tokens_col()
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    sw = F.size(F.filter(tokens_col(F.lower(F.col("text"))), lambda x: x.isin(STOPWORDS["en"])))
    return docs.select(
        "doc_id",
        F.round(alpha / F.greatest(F.length("text"), F.lit(1)), 4).alias("alpha_ratio"),
        F.round(sw / F.greatest(F.size(toks), F.lit(1)), 4).alias("stopword_ratio"),
        (F.length("text") >= 64).alias("len_ok"),
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
        F.substring(F.sha2(F.lower(F.col("text")), 256), 1, 16).alias("fp"),
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
        gated.groupBy(F.sha2(F.col("text"), 256).alias("_sha"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        gated.join(canon, "doc_id", "left_semi")
        .select("doc_id", F.length("text").alias("n_chars"), F.lit("en").alias("lang_guess"))
    )
