"""Adversarial hot-term skew (SURVEY §7.3: the named hard problem).

Corpus where one term appears in ~55% of turns: the salted build must
(a) split that term's postings across all salt buckets with
doc_ord-range disjointness, (b) keep parity, (c) never concentrate
the merge back into one reducer's row."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkbm25 import IndexConfig, Searcher, bm25_reference_topk, build_index, search_batch
from sparkbm25.codec import decode_blocks

HOT = "megahot"
N = 3000


@pytest.fixture(scope="module")
def skew_corpus():
    rng = np.random.default_rng(7)
    rows = []
    for i in range(N):
        words = [f"w{rng.integers(0, 300):03d}" for _ in range(10)]
        if rng.random() < 0.55:
            words.insert(0, HOT)
        rows.append((f"conv_{i:06d}", 0, "user", " ".join(words), None,
                     pd.Timestamp("2026-01-01")))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                       "tool", "ts"])


@pytest.fixture(scope="module", params=["checkpoint", "direct"])
def skew_index(spark, skew_corpus, tmp_path_factory, request):
    cfg = IndexConfig(
        n_term_buckets=8, n_salt_buckets=8, n_build_chunks=1,
        checkpoint_runs=(request.param == "checkpoint"))
    d = str(tmp_path_factory.mktemp("skew") / request.param)
    build_index(spark, spark.createDataFrame(skew_corpus), d, cfg,
                input_desc=request.param)
    return d, cfg


def test_hot_term_salted_across_buckets(spark, skew_index, skew_corpus):
    d, cfg = skew_index
    seg = (
        spark.read.parquet(f"{d}/segments")
        .where(F.col("term") == HOT)
        .select("salt", "n_docs", "blocks")
        .collect()
    )
    n_hot = skew_corpus["text"].str.startswith(HOT).sum()
    # split across ALL salt buckets, none empty, none dominant
    salts = {r["salt"] for r in seg}
    assert salts == set(range(cfg.n_salt_buckets))
    counts = {r["salt"]: r["n_docs"] for r in seg}
    assert sum(counts.values()) == n_hot
    assert max(counts.values()) < 2.5 * min(counts.values())
    # doc_ord ranges are disjoint and ordered by salt
    ranges = []
    for r in sorted(seg, key=lambda r: r["salt"]):
        docs, _, _ = decode_blocks([b.asDict() for b in r["blocks"]])
        ranges.append((docs.min(), docs.max()))
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_skew_parity(spark, skew_index, skew_corpus):
    d, _ = skew_index
    q = pd.DataFrame({"query_id": [0, 1], "query_text": [HOT, f"{HOT} w001"],
                      "k": [10, 10]})
    exp = bm25_reference_topk(skew_corpus, q, k=10)
    got = (search_batch(spark, d, q, k=10).toPandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    exps = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["conv_id"].tolist() == exps["conv_id"].tolist()
    np.testing.assert_allclose(got["score"].astype(float),
                               exps["score"].astype(float), rtol=1e-9)
    s = Searcher(spark, d)
    wand = s.search(HOT, k=10)
    e0 = exps[exps.query_id == 0]
    assert wand["conv_id"].tolist() == e0["conv_id"].tolist()
