"""Similarity search (brute/LSH/IVF) + multimodal plumbing stubs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkbm25 import ann, multimodal

DIM = 16
N = 400


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(1)
    M = rng.standard_normal((N, DIM)).astype(np.float32)
    # plant 5 vectors nearly identical to row 0
    for i in range(1, 6):
        M[i] = M[0] + rng.standard_normal(DIM).astype(np.float32) * 0.01
    rows = [(i, M[i].tolist()) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").cache()
    return df, M


def test_bruteforce_topk_exact(spark, emb):
    df, M = emb
    q = M[0].astype(np.float64)
    got = ann.cosine_topk_bruteforce(df, q.tolist(), k=6).toPandas()
    # numpy oracle
    Md = M.astype(np.float64)
    cos = (Md @ q) / (np.linalg.norm(Md, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(N), -cos))[:6]
    assert got["vec_id"].tolist() == order.tolist()
    np.testing.assert_allclose(got["cos"], cos[order], rtol=1e-6)


def test_lsh_recall_on_planted_neighbors(spark, emb):
    df, M = emb
    got = ann.cosine_topk_lsh(df, M[0].astype(float).tolist(), k=6,
                              n_planes=10, probe_hamming=2).toPandas()
    # the planted near-identical vectors must be found
    assert set(range(6)) & set(got["vec_id"].tolist()) >= {0, 1, 2, 3, 4, 5} - set(), \
        got["vec_id"].tolist()
    assert 0 in got["vec_id"].tolist()
    found = set(got["vec_id"].tolist()) & set(range(6))
    assert len(found) >= 4  # high recall on near-dups


def test_ivf_probe(spark, emb):
    df, M = emb
    got = ann.cosine_topk_ivf(df, M[0].astype(float).tolist(), k=6,
                              n_centroids=8, n_probe=4).toPandas()
    assert 0 in got["vec_id"].tolist()
    assert len(set(got["vec_id"]) & set(range(6))) >= 4


def test_multimodal_features(spark):
    assets = multimodal.make_fake_assets(spark, n=32)
    feats = multimodal.extract_features(assets, dim=8).toPandas()
    assert len(feats) == 32
    assert all(len(v) == 8 for v in feats["feature"])
    # deterministic: same payload -> same feature
    feats2 = multimodal.extract_features(assets, dim=8).toPandas()
    a = [list(v) for v in feats.sort_values("asset_id")["feature"]]
    b = [list(v) for v in feats2.sort_values("asset_id")["feature"]]
    assert a == b


def test_multimodal_resize_and_frames(spark):
    assets = multimodal.make_fake_assets(spark, n=32)
    kinds = {r["asset_id"]: r["kind"] for r in assets.select("asset_id", "kind").collect()}
    thumbs = multimodal.resize_images(assets, 16, 16).toPandas()
    assert set(thumbs["asset_id"]) == {a for a, k in kinds.items() if k == "image"}
    assert all(len(t) == 256 for t in thumbs["thumb"])
    frames = multimodal.sample_frames(assets, every_n=30).toPandas()
    assert set(frames["asset_id"]) == {a for a, k in kinds.items() if k == "video"}
    n_frames = {r["asset_id"]: r["meta"]["n_frames"]
                for r in assets.select("asset_id", "meta").collect()}
    for aid, grp in frames.groupby("asset_id"):
        assert len(grp) == max(n_frames[aid] // 30, 1)
