"""Deterministic synthetic fixtures (FIXTURES.md §1-2).

Generates the `transcripts` input table (BASELINE.json input_hint
shape) and the reference query set, seedable (seed=42 convention).
Used by pytest, bench.py and the scaling runs — no external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000
HOT_TERM = "alpha"  # deliberately hot: appears in >=30% of turns (skew test)
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "calculator", "browser", "python"])


def _vocab(n: int = VOCAB_SIZE) -> np.ndarray:
    return np.array([f"w{i:04d}" for i in range(n)])


def make_transcripts(n_turns: int = 5000, seed: int = SEED) -> pd.DataFrame:
    """Synthetic multi-turn transcripts, deterministic for a given seed.

    Columns: conv_id:str, turn_idx:int32, role:str, text:str,
    tool:str(nullable), ts:datetime64[us]. Zipfian vocabulary, one hot
    term in ~35% of turns, empty strings, punctuation, mixed case,
    digits (tokenizer edge cases).
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    # Zipfian term distribution over the vocab
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = 1.0 / ranks ** 1.1
    probs /= probs.sum()

    # conversation lengths 1..40, Zipf-ish (many short, few long)
    lengths = []
    total = 0
    while total < n_turns:
        ln = min(40, 1 + int(rng.zipf(1.6)))
        lengths.append(ln)
        total += ln
    lengths[-1] -= total - n_turns
    if lengths[-1] == 0:
        lengths.pop()
    lengths = np.array(lengths, dtype=np.int64)
    n_conv = lengths.size

    conv_ids = np.repeat([f"conv_{i:08d}" for i in range(n_conv)], lengths)
    turn_idx = np.concatenate([np.arange(ln, dtype=np.int32) for ln in lengths])
    n = conv_ids.size

    # text: 3..30 words sampled from the zipf vocab (vectorized —
    # bench generates millions of turns through this path)
    n_words = rng.integers(3, 31, size=n)
    flat = rng.choice(vocab, size=int(n_words.sum()), p=probs)
    bounds = np.concatenate(([0], np.cumsum(n_words)))
    texts = pd.Series(
        [" ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(n)], dtype=object)

    hot_mask = rng.random(n) < 0.35       # the skew hot term
    upper_mask = rng.random(n) < 0.10
    punct_mask = rng.random(n) < 0.30
    digit_mask = rng.random(n) < 0.15
    empty_mask = rng.random(n) < 0.01
    digits = rng.integers(0, 10000, size=n)

    texts = texts.where(~hot_mask, HOT_TERM + " " + texts)
    texts = texts.where(
        ~digit_mask, texts + " " + pd.Series(digits.astype(str), dtype=object))
    punct = texts[punct_mask].str.replace(" ", ", ", n=1, regex=False) + "."
    texts.loc[punct_mask] = punct
    texts.loc[upper_mask] = texts[upper_mask].str.upper()
    texts.loc[empty_mask] = ""
    texts = texts.tolist()

    role = ROLES[rng.integers(0, 4, size=n)]
    tool = np.where(role == "tool", TOOLS[rng.integers(0, 4, size=n)], None)
    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base + (np.repeat(np.cumsum(lengths) - lengths, lengths) * 60_000_000
                 + turn_idx.astype(np.int64) * 1_000_000).astype("timedelta64[us]")

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )


def make_queries(seed: int = SEED, k: int = 10) -> pd.DataFrame:
    """The fixed reference query set (FIXTURES.md §2): single common
    term, single rare term, multi-term mixes, absent term, repeated
    term, hot term, mixed case + punctuation."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    rows = [
        "w0000",                       # most common term
        "w4721",                       # rare term
        f"{HOT_TERM}",                 # the deliberately hot term
        "w0001 w0005 w0100",           # multi-term mix
        f"{HOT_TERM} w0002 w3999",     # hot + common + rare
        "zzznotaterm",                 # absent from corpus
        "w0003 w0003",                 # repeated term (qtf=2)
        "W0004, w0010!",               # mixed case + punctuation
        " ".join(rng.choice(vocab[:200], size=4)),
        " ".join(rng.choice(vocab, size=5)),
    ]
    return pd.DataFrame(
        {
            "query_id": np.arange(len(rows), dtype=np.int32),
            "query_text": rows,
            "k": np.full(len(rows), k, dtype=np.int32),
        }
    )
