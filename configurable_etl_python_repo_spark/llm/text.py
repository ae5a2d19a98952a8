"""Text analysis operators: language ID, quality stats, token counting,
document fingerprinting.

All pure Column expressions (JVM-side, codegen'd) — at 100 TB these run
inside the scan stage with zero shuffles; nothing here touches Python
per-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the n-gram/stopword heuristic.
# Deliberately small + hardcoded so the DuckDB oracle can replicate exactly.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "une"),
    "es": ("el", "la", "los", "que", "es", "por", "con", "una"),
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]

#: BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(col: Column) -> Column:
    """Whitespace tokens of the lowercased, trimmed text (empty → [])."""
    return F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda w: w != F.lit(""))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature columns: length, word count, punctuation
    ratio, stopword ratio, mean word length. Used to filter low-quality
    documents before training-data export."""
    c = F.col(text_col)
    words = _words(c)
    n_words = F.size(words)
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*ENGLISH_STOPWORDS))
    )
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    n_chars = F.length(c)
    return df.withColumns(
        {
            "n_chars_measured": n_chars.cast("long"),
            "n_words": n_words.cast("long"),
            "punct_ratio": (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))),
            "stopword_ratio": (
                n_stop.cast("double") / F.greatest(n_words, F.lit(1))
            ),
            "mean_word_len": (
                F.aggregate(
                    words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
                ).cast("double")
                / F.greatest(n_words, F.lit(1))
            ),
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: score each language by function-word
    hits; argmax wins, ties broken alphabetically, zero hits → 'und'
    (undetermined). Deterministic so the SQL oracle can reproduce it."""
    words = _words(F.col(text_col))

    def _hits(sw):
        # single-arg closure: a 2-arg lambda would make F.filter pass the
        # element index as the second argument
        return lambda w: w.isin(*sw)

    scores = {
        lang: F.size(F.filter(words, _hits(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }
    # argmax by (score desc, lang asc) via a sorted array of structs
    pairs = F.array(
        *[
            F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_STOPWORDS)
        ]
    )
    best = F.array_sort(pairs)[0]
    return df.withColumn(
        "lang_pred",
        F.when(-best["neg"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_pred_hits", (-best["neg"]).cast("long"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lowercased text. Stable across engines (the DuckDB oracle computes the
    identical digest), used as the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("doc_fp", F.md5(norm))


def token_count_bpe_ish(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Approximate LLM token count: BPE-ish pre-tokenization (word / number /
    symbol pieces) — the standard cheap proxy when the real tokenizer isn't
    on the cluster."""
    return df.withColumn(
        "n_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)).cast(
            "long"
        ),
    )
