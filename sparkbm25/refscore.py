"""Brute-force numpy BM25 reference scorer — the parity oracle.

Plays the role of the reference's golden-output micro-tests
(tests/interpreters/apertium/test_apertium.py:62-67: exact expected
output on small input): the engine's top-k must be rank-identical with
scores equal to <=1e-6 vs this scorer on the fixed query set
(BASELINE.json north_rule).

Pure pandas/numpy — no Spark — so it is an independent execution path
from the engine, sharing ONLY the tokenizer (analysis.tokenize_series,
shared deliberately: parity by construction, SURVEY §7.0).

BM25 (ES/Lucene flavor, k1=1.2 b=0.75):
    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d)   = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(q,d)= sum_t qtf(t) * w(t, d)      (OR semantics; AND mode
                keeps only docs matching every distinct query term)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sparkbm25.analysis import tokenize_series
from sparkbm25.config import IndexConfig


def bm25_idf(N: int, df: np.ndarray | int) -> np.ndarray | float:
    return np.log(1.0 + (N - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def bm25_reference_topk(
    transcripts: pd.DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    config: IndexConfig = IndexConfig(),
    mode: str = "or",
) -> pd.DataFrame:
    """Score every query against every turn, brute force.

    transcripts: columns (conv_id, turn_idx, text, ...)
    queries:     columns (query_id, query_text[, k])
    returns:     (query_id, rank, conv_id, turn_idx, score) — rank is
                 1-based, ties broken (score desc, conv_id asc,
                 turn_idx asc); per-query k column wins over the k arg.
    """
    t = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    toks = tokenize_series(t["text"], config.token_pattern, config.max_content_length)
    N = len(t)
    dl = toks.str.len().to_numpy(dtype=np.float64)
    avgdl = float(dl.mean()) if N else 0.0

    # per-doc term frequency maps (small corpora only — this is the oracle)
    tf_maps = [dict(zip(*np.unique(lst, return_counts=True))) if len(lst) else {} for lst in toks]
    # document frequency per term
    df_map: dict[str, int] = {}
    for m in tf_maps:
        for term in m:
            df_map[term] = df_map.get(term, 0) + 1

    k1, b = config.k1, config.b
    out_rows = []
    for q in queries.itertuples(index=False):
        q_k = int(getattr(q, "k", k) or k)
        q_terms = tokenize_series(pd.Series([q.query_text]), config.token_pattern).iloc[0]
        if len(q_terms) == 0:
            continue
        uniq, qtf = np.unique(q_terms, return_counts=True)
        scores = np.zeros(N, dtype=np.float64)
        matched = np.zeros(N, dtype=np.int64)
        # fixed term order (sorted) => deterministic summation order
        for term, qt in zip(uniq, qtf):
            dfc = df_map.get(term, 0)
            if dfc == 0:
                continue
            idf = float(bm25_idf(N, dfc))
            tf = np.array([m.get(term, 0) for m in tf_maps], dtype=np.float64)
            has = tf > 0
            denom = tf + k1 * (1.0 - b + b * dl / avgdl)
            with np.errstate(invalid="ignore", divide="ignore"):
                w = np.where(has, idf * tf * (k1 + 1.0) / denom, 0.0)
            scores += qt * w
            matched += has.astype(np.int64)
        keep = matched > 0 if mode == "or" else matched == len(uniq)
        idx = np.flatnonzero(keep)
        if idx.size == 0:
            continue
        cand = pd.DataFrame(
            {
                "conv_id": t["conv_id"].to_numpy()[idx],
                "turn_idx": t["turn_idx"].to_numpy()[idx],
                "score": scores[idx],
            }
        ).sort_values(
            ["score", "conv_id", "turn_idx"], ascending=[False, True, True], kind="mergesort"
        ).head(q_k)
        cand.insert(0, "rank", np.arange(1, len(cand) + 1, dtype=np.int32))
        cand.insert(0, "query_id", q.query_id)
        out_rows.append(cand)
    if not out_rows:
        return pd.DataFrame(columns=["query_id", "rank", "conv_id", "turn_idx", "score"])
    return pd.concat(out_rows, ignore_index=True)
