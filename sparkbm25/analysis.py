"""Text analysis: the tokenizer and analyzer chain.

The reference's per-row transform is a pluggable scalar map
(``AbstractInterpreter.translate``, interpreters/abstract.py:158-171);
our engine's per-row transform is tokenization. It is implemented ONCE
in vectorized pandas string ops and reused by (a) the Spark build
pipeline via ``pandas_udf`` and (b) the numpy reference scorer — so
index-side and oracle-side analysis agree by construction (the same
way the reference reuses one ``translate`` for all execution paths).

No per-row Python: everything is ``pandas.Series.str`` vectorized and
crosses the JVM boundary in Arrow batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

DEFAULT_TOKEN_PATTERN = "[a-z0-9]+"


def tokenize_series(
    texts: pd.Series,
    token_pattern: str = DEFAULT_TOKEN_PATTERN,
    max_content_length: int = 0,
) -> pd.Series:
    """text -> list[str] terms. Lowercase, extract token_pattern runs.

    Nulls tokenize to []. Optional truncation mirrors the reference's
    --max-content-length (es_translator/es.py:120-121).
    """
    s = texts.fillna("")
    if max_content_length and max_content_length > 0:
        s = s.str.slice(0, max_content_length)
    return s.str.lower().str.findall(token_pattern)


def make_tokens_udf(token_pattern: str = DEFAULT_TOKEN_PATTERN, max_content_length: int = 0):
    """Vectorized Arrow UDF: text:string -> tokens:array<string>."""

    @F.pandas_udf(ArrayType(StringType()))
    def tokens_udf(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts, token_pattern, max_content_length)

    return tokens_udf


def tokenize_one(text: str | None, token_pattern: str = DEFAULT_TOKEN_PATTERN,
                 max_content_length: int = 0) -> list[str]:
    """Driver-side single-string tokenize (query analysis)."""
    return tokenize_series(pd.Series([text], dtype=object),
                           token_pattern, max_content_length).iloc[0]
