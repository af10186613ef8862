"""Incremental indexing (T1 queue-consumption analog): generations
must merge to EXACT BM25 parity with a single-shot build over the
concatenated corpus, and the Structured Streaming entry must drain a
directory with availableNow."""

import os
import time

import numpy as np
import pandas as pd
import pytest

from sparkbm25 import IndexConfig, Searcher, build_index, search_batch
from sparkbm25.fixtures import make_queries, make_transcripts
from sparkbm25.streaming import stream_index, update_index

CFG = IndexConfig(n_term_buckets=8, n_salt_buckets=4, n_build_chunks=1)


@pytest.fixture(scope="module")
def corpus():
    # two halves, conv ranges disjoint and ordered so the single-shot
    # doc_ord order equals arrival order (tie-break parity holds)
    t = make_transcripts(3000)
    convs = sorted(t["conv_id"].unique())
    half = convs[len(convs) // 2]
    return t[t["conv_id"] < half].reset_index(drop=True), \
        t[t["conv_id"] >= half].reset_index(drop=True)


def test_generations_match_single_shot(spark, corpus, tmp_path):
    first, second = corpus
    full = pd.concat([first, second], ignore_index=True)

    mono = str(tmp_path / "mono")
    build_index(spark, spark.createDataFrame(full), mono, CFG, input_desc="full")

    root = str(tmp_path / "incr")
    r1 = update_index(spark, spark.createDataFrame(first), root, CFG)
    r2 = update_index(spark, spark.createDataFrame(second), root, CFG)
    assert r1.n_docs == len(first) and r2.n_docs == len(second)
    assert os.path.isdir(f"{root}/gen=0") and os.path.isdir(f"{root}/gen=1")

    q = make_queries()
    a = search_batch(spark, mono, q, k=10).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = search_batch(spark, root, q, k=10).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert a["conv_id"].tolist() == b["conv_id"].tolist()
    assert a["turn_idx"].tolist() == b["turn_idx"].tolist()
    np.testing.assert_allclose(a["score"].astype(float),
                               b["score"].astype(float), rtol=1e-9)

    # WAND path over generations (block-max inflation must stay lossless)
    s_mono, s_incr = Searcher(spark, mono), Searcher(spark, root)
    for qt in q["query_text"]:
        ga = s_mono.search(qt, k=10)
        gb = s_incr.search(qt, k=10)
        assert ga["conv_id"].tolist() == gb["conv_id"].tolist(), qt
        np.testing.assert_allclose(ga["score"].astype(float),
                                   gb["score"].astype(float), rtol=1e-9)


def test_stream_index_available_now(spark, corpus, tmp_path):
    first, second = corpus
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(first).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(second).coalesce(1).write.mode("append").parquet(src)

    root = str(tmp_path / "sidx")
    q = stream_index(spark, src, root, CFG,
                     checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)
    assert not q.isActive

    searcher = Searcher(spark, root)
    total = searcher.n_docs
    assert total == len(first) + len(second)
    hits = searcher.search("alpha", k=5)
    assert len(hits) == 5
