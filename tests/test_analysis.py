"""Tokenizer golden cases (SURVEY §5.2.1). The tokenizer is the shared
analysis contract between the index build and the parity oracle
(analysis is the engine analog of the reference's single `translate`
transform reused across all execution paths, interpreters/abstract.py:158)."""

import pandas as pd

from sparkbm25.analysis import tokenize_one, tokenize_series


def test_basic():
    assert tokenize_one("Hello, World!") == ["hello", "world"]


def test_digits_and_mixed():
    assert tokenize_one("GPT-4 runs 2x faster") == ["gpt", "4", "runs", "2x", "faster"]


def test_empty_and_null():
    assert tokenize_one("") == []
    assert tokenize_one(None) == []
    s = tokenize_series(pd.Series(["a b", None, ""]))
    assert s.tolist() == [["a", "b"], [], []]


def test_punctuation_only():
    assert tokenize_one("...!!!,,,") == []


def test_truncation():
    # mirrors --max-content-length (es_translator/es.py:120-121)
    assert tokenize_one("abcdef ghij", max_content_length=6) == ["abcdef"]
    assert tokenize_one("abcdef ghij", max_content_length=8) == ["abcdef", "g"]


def test_unicode_folded_out():
    # [a-z0-9]+ analyzer: non-ascii letters act as separators
    assert tokenize_one("café naïve") == ["caf", "na", "ve"]
