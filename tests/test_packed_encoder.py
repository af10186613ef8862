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


def test_packed_edge_corpus_byte_identical(spark, tmp_path_factory):
    """Adversarial corpus: null/empty/whitespace texts (tokenize to []
    and must vanish from postings while staying in the forward table),
    a single hot term repeated many times in one doc (tf run-length),
    unicode terms (dictionary-encode + crc32 bucketing on non-ASCII),
    and a one-doc tail partition."""
    import pandas as pd

    texts = (
        [None, "", "   ", "!!!"]
        + ["spark " * 50]                      # tf=50 in one doc
        + ["über naïve café 北京 données"] * 3   # unicode
        + [f"w{i % 7} common w{i % 3}" for i in range(200)]
        + ["lonely"]                            # tail
    )
    pdf = pd.DataFrame({
        "conv_id": [f"c{i:06d}" for i in range(len(texts))],
        "turn_idx": [0] * len(texts),
        "role": ["user"] * len(texts),
        "text": texts,
        "tool": [None] * len(texts),
    })
    root = str(tmp_path_factory.mktemp("packed_edge"))
    segs = {}
    for enc in ("stream", "packed"):
        idx = os.path.join(root, enc)
        cfg = IndexConfig(n_term_buckets=4, n_salt_buckets=3,
                          n_build_chunks=1, n_doc_partitions=5,
                          checkpoint_runs=False, build_terms_dict=False,
                          encoder=enc, store_positions=True)
        res = build_index(spark, spark.createDataFrame(pdf), idx, cfg)
        assert res.n_docs == len(texts)  # empties stay in the forward table
        segs[enc] = _read_segments(spark, idx)
    a, b = segs["stream"], segs["packed"]
    assert len(a) == len(b) and len(a) > 0
    for col in ("term", "salt", "n_docs", "term_bucket"):
        assert (a[col].values == b[col].values).all(), col
    for i in range(len(a)):
        for x, y in zip(a["blocks"].iloc[i], b["blocks"].iloc[i]):
            assert dict(x) == dict(y), a["term"].iloc[i]
    # the tf=50 run survived run-length counting
    spk = a[a["term"] == "spark"]
    assert int(spk["n_docs"].sum()) >= 1


def test_packed_incremental_append_and_compact(spark, corpus,
                                               tmp_path_factory):
    """The packed encoder through the generational pipeline: two
    update_index appends (disjoint doc_ord_base ranges exercise the
    pack kernel's absolute-first-doc encoding at a nonzero base) plus
    an auto-compact fold must answer queries identically to a one-shot
    stream build over the full corpus."""
    from sparkbm25.streaming import update_index

    root = str(tmp_path_factory.mktemp("packed_gen") / "idx")
    cfg = IndexConfig(n_term_buckets=8, n_salt_buckets=4, n_build_chunks=1,
                      n_doc_partitions=4, checkpoint_runs=False,
                      build_terms_dict=False, encoder="packed")
    half = N_TURNS // 2
    update_index(spark, spark.createDataFrame(corpus.iloc[:half]), root, cfg)
    res = update_index(spark, spark.createDataFrame(corpus.iloc[half:]),
                       root, cfg, auto_compact_after=2)
    assert res.n_docs == N_TURNS - half

    one_shot = _build(spark, corpus,
                      str(tmp_path_factory.mktemp("packed_gen_ref")),
                      "stream", False)
    s_gen, s_ref = Searcher(spark, root), Searcher(spark, one_shot)
    for q in make_queries()["query_text"]:
        got, exp = s_gen.search(q, k=10), s_ref.search(q, k=10)
        assert got["conv_id"].tolist() == exp["conv_id"].tolist(), q
        assert len(exp) == 0 or (exp["score"] - got["score"]).abs().max() < 1e-9


def test_packed_rejects_checkpoint_runs(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("packed_cfg"))
    cfg = IndexConfig(encoder="packed", checkpoint_runs=True)
    with pytest.raises(ValueError, match="packed"):
        build_index(spark, spark.createDataFrame(corpus.head(50)),
                    os.path.join(root, "idx"), cfg)
