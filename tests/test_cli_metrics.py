"""CLI entry points (X3 spark-submit analog) + manifest metrics (X5/X6
monitor analog)."""

import json

import pytest

from sparkbm25 import IndexConfig, build_index
from sparkbm25.fixtures import make_transcripts
from sparkbm25 import cli, metrics


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli") / "idx")
    df = spark.createDataFrame(make_transcripts(1000))
    build_index(spark, df, d, IndexConfig(n_build_chunks=2), input_desc="cli1000")
    return d


def test_cli_search(built, capsys):
    rc = cli.main(["search", "--index", built, "--query", "alpha w0001", "-k", "5"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 5
    assert out[0].strip().startswith("1")


def test_cli_monitor(built, capsys):
    rc = cli.main(["monitor", "--index", built])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert data["n_turns"] == 1000
    assert data["turns_per_sec"] > 0
    assert set(data["per_chunk_postings_per_sec"]) == {"0", "1"}  # json keys


def test_metrics_series(built):
    s = metrics.throughput_series(built)
    assert {"rate", "rate_avg3", "rate_peak"} <= set(s.columns)
    assert (s["rate_peak"].diff().fillna(0) >= 0).all()  # peak is monotone
    assert metrics.eta_seconds(100, 50, 10.0) == 5.0
    assert metrics.eta_seconds(100, 50, 0.0) == float("inf")


def test_cli_build_and_search_roundtrip(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    spark.createDataFrame(make_transcripts(500)).write.parquet(src)
    idx = str(tmp_path / "idx")
    rc = cli.main(["build", "--input", src, "--index", idx,
                   "--term-buckets", "8", "--salt-buckets", "2", "--chunks", "1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 500
    rc = cli.main(["search", "--index", idx, "--query", "alpha", "-k", "3"])
    assert rc == 0


def test_cli_dry_run_writes_nothing(spark, tmp_path, capsys):
    import os

    src = str(tmp_path / "src2")
    spark.createDataFrame(make_transcripts(300)).write.parquet(src)
    idx = str(tmp_path / "idx2")
    rc = cli.main(["build", "--input", src, "--index", idx, "--dry-run"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dry_run"] is True and out["n_docs"] == 300
    assert not os.path.exists(idx)  # S6: nothing written
