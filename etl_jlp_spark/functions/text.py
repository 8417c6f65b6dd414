"""Shared text constants and portable (Spark ⟷ DuckDB) expression helpers.

The reference builds its keyword pipeline on NLTK stopwords + regex
cleaning (dwh_lab/dwh/preprocessing_streaming_incremental_load.py:188-251).
Here the stopword list is a single Python constant interpolated into both
the Spark plan and the DuckDB oracle SQL, so both engines tokenize and
filter identically — no NLTK, no UDFs: everything is `split`/`explode`/
`regexp_*` inside whole-stage codegen.

Portability rules used across the engine:
- tokenisation: lower → strip non [a-zA-Z0-9_ -] → split on \\s+
- hashing: md5 hex strings (identical in Spark and DuckDB); "min over
  md5(x)" is our engine-independent minhash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Compact stopword list (reference: NLTK english + additional_stop_words at
# preprocessing_streaming_incremental_load.py:240-250). Single source of
# truth for Spark AND oracle SQL.
STOPWORDS: tuple[str, ...] = (
    "a", "an", "the", "and", "or", "but", "if", "then", "else", "when",
    "is", "are", "was", "were", "be", "been", "am",
    "to", "of", "in", "on", "for", "with", "as", "at", "by", "from",
    "it", "this", "that", "these", "those",
    "i", "you", "he", "she", "we", "they",
    "not", "no", "nor", "so", "too", "very",
    "can", "could", "will", "would", "shall", "should",
    "do", "does", "did", "have", "has", "had",
    "here", "there", "now", "ever", "never", "also",
    "what", "which", "who", "how", "where", "why",
    "all", "any", "both", "each", "few", "more", "most", "other", "some", "such", "own", "same", "only",
)

# Tiny function-word marker lists for the n-gram language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "fr": ("le", "les", "des", "et", "une", "que", "pour", "dans", "est", "sur"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"),
}

CLEAN_PATTERN = "[^a-zA-Z0-9_ -]"  # keep \\w-ish + space + dash (reference clean_text)
SPLIT_PATTERN = r"\s+"


def sql_stopword_list() -> str:
    """'( 'a','an',... )' literal for oracle SQL IN-lists."""
    return "(" + ",".join(f"'{w}'" for w in STOPWORDS) + ")"


def clean_text_col(col: Column) -> Column:
    """lower + strip punctuation — reference clean_text (line 188-191)."""
    return F.regexp_replace(F.lower(col), CLEAN_PATTERN, "")


def tokens_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode docs into (id, tok) rows; drops empty tokens.

    Stays entirely JVM-side (split/explode), so at 100 TB this is a
    narrow map stage feeding whatever aggregation follows.
    """
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.trim(clean_text_col(F.col(text_col))), SPLIT_PATTERN)).alias("tok"),
        )
        .filter(F.length("tok") > 0)
    )


def filtered_tokens_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Tokens with stopwords and 1-char tokens removed (reference line 202)."""
    return tokens_df(docs, text_col, id_col).filter(
        (F.length("tok") > 1) & (~F.col("tok").isin(*STOPWORDS))
    )
