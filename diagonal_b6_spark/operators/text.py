"""Text-analysis operators for training-data pipelines: token counting,
language-ID heuristic, quality scoring, document fingerprinting.

All JVM-side column expressions except the rolling-hash fingerprint,
which is an Arrow-batched pandas UDF (sequential per string, vectorized
across the batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EN_STOPWORDS = ["the", "and", "of", "to", "in"]
DE_STOPWORDS = ["der", "die", "und", "das", "ist"]
FR_STOPWORDS = ["le", "la", "et", "les", "des"]


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count (the BPE-ish regex variant adds word/punct
    splitting; both stay JVM-side)."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
    )


def _stopword_hits(text_col, stopwords: list[str]):
    """Occurrences of ' w ' patterns via the length-difference trick
    (exact integer arithmetic, portable to any SQL engine)."""
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    total = None
    for w in stopwords:
        pat = f" {w} "
        hits = (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit("")))) / len(pat)
        total = hits if total is None else total + hits
    return total.cast("long")


def language_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: stopword hits per candidate
    language; guess = argmax (en/de/fr demo set)."""
    en = _stopword_hits(F.col(text_col), EN_STOPWORDS)
    de = _stopword_hits(F.col(text_col), DE_STOPWORDS)
    fr = _stopword_hits(F.col(text_col), FR_STOPWORDS)
    out = df.select(F.col(id_col), en.alias("en_hits"), de.alias("de_hits"), fr.alias("fr_hits"))
    guess = (
        F.when((F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")), "en")
        .when(F.col("de_hits") >= F.col("fr_hits"), "de")
        .otherwise("fr")
    )
    return out.withColumn("lang_guess", guess)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality heuristics: length, punctuation density, stopword ratio,
    mean token length -- the standard corpus-filter features."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    n_punct = n_chars - F.length(F.regexp_replace(txt, r"[.,!?;:]", ""))
    n_tokens = F.size(F.split(F.trim(txt), r"\s+"))
    sw = _stopword_hits(txt, EN_STOPWORDS)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        n_tokens.alias("n_tokens"),
        sw.alias("stopword_hits"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(sw / n_tokens, 6).alias("stopword_ratio"),
    )


@F.pandas_udf(T.LongType())
def rolling_fingerprint_udf(text: pd.Series) -> pd.Series:
    """Polynomial rolling-hash fingerprint of the whole document
    (mod 2^61-1, base 257), computed per Arrow batch."""
    MOD = (1 << 61) - 1
    BASE = 257
    out = np.zeros(len(text), dtype=np.int64)
    for i, s in enumerate(text):
        h = 0
        for b in (s or "").encode("utf-8", errors="replace"):
            h = (h * BASE + b) % MOD
        out[i] = h
    return pd.Series(out)


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col), rolling_fingerprint_udf(F.col(text_col)).alias("fingerprint"))
