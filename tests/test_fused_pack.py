"""The fused tokenize+pack scan (verify-order packed builds keep token
lists out of stage 1 and re-derive (doc_ord, tokens) inside the pack
kernel) must produce results identical to the stream encoder for every
tokenizer path: ASCII fast path, non-ASCII pandas fallback, truncation,
and null text."""

import os
import shutil

import pandas as pd
import pytest

from sparkbm25 import IndexConfig, Searcher, build_index


def _mixed_corpus(n: int = 400) -> pd.DataFrame:
    rows = []
    for i in range(n):
        if i % 7 == 0:
            text = f"héllo wörld Ünïcode w{i % 13:04d} straße"  # non-ASCII
        elif i % 11 == 0:
            text = None                                         # null text
        else:
            text = f"w{i % 13:04d} W{i % 5:04d}! and-some MIXED text {i}"
        rows.append({"conv_id": f"c{i:06d}", "turn_idx": 0,
                     "role": "user" if i % 2 else "agent",
                     "text": text, "tool": None})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("maxlen", [0, 24])
def test_fused_pack_matches_stream(spark, tmp_path_factory, maxlen):
    corpus = _mixed_corpus()
    root = str(tmp_path_factory.mktemp(f"fused_{maxlen}"))
    # sorted single parquet file so input_order='verify' accepts it
    src = os.path.join(root, "src")
    spark.createDataFrame(corpus).coalesce(1).write.parquet(src)
    sdf = spark.read.parquet(src)
    ref_dir, got_dir = os.path.join(root, "ref"), os.path.join(root, "got")
    base = dict(n_term_buckets=4, n_salt_buckets=2, n_build_chunks=1,
                n_doc_partitions=2, checkpoint_runs=False,
                build_terms_dict=False, max_content_length=maxlen)
    build_index(spark, sdf, ref_dir,
                IndexConfig(encoder="stream", input_order="shuffle", **base))
    build_index(spark, sdf, got_dir,
                IndexConfig(encoder="packed", input_order="verify", **base))
    a = (spark.read.parquet(os.path.join(ref_dir, "segments")).toPandas()
         .sort_values(["term", "salt"]).reset_index(drop=True))
    b = (spark.read.parquet(os.path.join(got_dir, "segments")).toPandas()
         .sort_values(["term", "salt"]).reset_index(drop=True))
    assert a["term"].tolist() == b["term"].tolist()
    assert a["n_docs"].tolist() == b["n_docs"].tolist()
    for i in range(len(a)):
        blks_a = [dict(x) for x in a["blocks"].iloc[i]]
        blks_b = [dict(x) for x in b["blocks"].iloc[i]]
        assert blks_a == blks_b, a["term"].iloc[i]
    # unicode-bearing query answers identically (fallback tokenization)
    sa, sb = Searcher(spark, ref_dir), Searcher(spark, got_dir)
    for q in ("w0001", "stra", "mixed text"):
        ga, gb = sa.search(q, k=10), sb.search(q, k=10)
        pd.testing.assert_frame_equal(ga.reset_index(drop=True),
                                      gb.reset_index(drop=True))
