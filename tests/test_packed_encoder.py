"""encoder='packed' (round 5): map-side SPIMI combine.

The packed path shuffles one varint row per (term, salt, input
partition) instead of one row per token occurrence, then merge-
concatenates on the reduce side (input-partition doc ranges are
disjoint and min_doc-ordered). The contract: segments come out
BYTE-IDENTICAL to the 'stream' path — same groups, same blocks, same
varint payloads, same per-block max_impact — with and without the
positions stream, so every downstream consumer (search, compaction,
annotate, terms dict) is automatically covered by the existing suite.
"""

import os
import shutil

import pytest

from sparkbm25 import IndexConfig, Searcher, build_index
from sparkbm25.fixtures import make_queries, make_transcripts

N_TURNS = 3000


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts(N_TURNS)


def _build(spark, corpus, root, encoder, store_positions):
    idx = os.path.join(root, f"idx_{encoder}_{int(store_positions)}")
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(
        n_term_buckets=8, n_salt_buckets=4, n_build_chunks=1,
        n_doc_partitions=4, checkpoint_runs=False, build_terms_dict=False,
        encoder=encoder, store_positions=store_positions,
    )
    res = build_index(spark, spark.createDataFrame(corpus), idx, cfg)
    assert res.n_docs == N_TURNS
    return idx


def _read_segments(spark, idx):
    df = (
        spark.read.parquet(os.path.join(idx, "segments"))
        .toPandas()
        .sort_values(["term", "salt"])
        .reset_index(drop=True)
    )
    return df


@pytest.mark.parametrize("store_positions", [False, True])
def test_packed_segments_byte_identical(spark, corpus, tmp_path_factory,
                                        store_positions):
    root = str(tmp_path_factory.mktemp("packed_parity"))
    a = _read_segments(spark, _build(spark, corpus, root, "stream",
                                     store_positions))
    b = _read_segments(spark, _build(spark, corpus, root, "packed",
                                     store_positions))
    assert len(a) == len(b)
    for col in ("term", "salt", "n_docs", "term_bucket"):
        assert (a[col].values == b[col].values).all(), col
    for i in range(len(a)):
        ba, bb = a["blocks"].iloc[i], b["blocks"].iloc[i]
        assert len(ba) == len(bb), a["term"].iloc[i]
        for x, y in zip(ba, bb):
            assert dict(x) == dict(y), a["term"].iloc[i]


def test_packed_index_searchable(spark, corpus, tmp_path_factory):
    """End-to-end: a packed-built index answers the fixed query set
    identically to a stream-built one on both engine paths."""
    root = str(tmp_path_factory.mktemp("packed_search"))
    idx_s = _build(spark, corpus, root, "stream", False)
    idx_p = _build(spark, corpus, root, "packed", False)
    queries = make_queries()
    s_s, s_p = Searcher(spark, idx_s), Searcher(spark, idx_p)
    for q in queries["query_text"]:
        exp = s_s.search(q, k=10)
        got = s_p.search(q, k=10)
        for col in ("rank", "conv_id", "turn_idx"):
            assert exp[col].tolist() == got[col].tolist(), (q, col)
        assert len(exp) == 0 or (exp["score"] - got["score"]).abs().max() < 1e-12


def test_packed_rejects_checkpoint_runs(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("packed_cfg"))
    cfg = IndexConfig(encoder="packed", checkpoint_runs=True)
    with pytest.raises(ValueError, match="packed"):
        build_index(spark, spark.createDataFrame(corpus.head(50)),
                    os.path.join(root, "idx"), cfg)
