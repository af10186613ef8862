"""Banded multi-term expansion (VERDICT r4 item 3): prefix leaves
compile to a term-range predicate pushed to the parquet scan of the
term-SORTED dictionary (row-group min/max pruning — the columnar
analog of Lucene's FST prefix walk); fuzzy leaves prefilter on the
stored length column and run threshold-banded levenshtein. Plus
parity: the banded scan returns exactly the brute-force expansion."""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkbm25 import IndexConfig, build_index
from sparkbm25.fixtures import make_transcripts
from sparkbm25.search import (_expand_multiterm, _expand_terms_source,
                              _levenshtein, _prefix_upper)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    t = make_transcripts(800, seed=21)
    d = str(tmp_path_factory.mktemp("expband") / "idx")
    build_index(spark, spark.createDataFrame(t), d,
                IndexConfig(checkpoint_runs=False), input_desc="exp800")
    vocab = set()
    for txt in t["text"]:
        vocab.update(re.findall("[a-z0-9]+", txt.lower()))
    return d, sorted(vocab)


def test_prefix_upper():
    assert _prefix_upper("alp") == "alq"
    assert _prefix_upper("az") == "a{"          # codepoint, not alphabet
    assert _prefix_upper("a" + chr(0x10FFFF)) == "b"
    assert _prefix_upper(chr(0x10FFFF)) is None


def test_expansion_parity_banded(spark, built):
    d, vocab = built
    exp = _expand_multiterm(spark, d, ["alp", "w00"],
                            [("alpha", 1), ("gamma", 2), ("beta", 0)])
    assert exp["p:alp"] == sorted(v for v in vocab if v.startswith("alp"))
    assert exp["p:w00"] == sorted(v for v in vocab if v.startswith("w00"))
    assert exp["f:alpha~1"] == sorted(
        v for v in vocab if _levenshtein(v, "alpha") <= 1)
    assert exp["f:gamma~2"] == sorted(
        v for v in vocab if _levenshtein(v, "gamma") <= 2)
    assert exp["f:beta~0"] == sorted(v for v in vocab if v == "beta")


def test_prefix_range_pushed_to_scan(spark, built):
    """The prefix leaf's scan must carry the range predicates in
    PushedFilters (parquet row-group min/max pruning over the sorted
    dictionary) — not just a post-scan startswith."""
    d, _ = built
    src = _expand_terms_source(spark, d)
    plan = (
        src.where((F.col("term") >= "alp") & (F.col("term") < "alq")
                  & F.col("term").startswith("alp"))
        ._jdf.queryExecution().executedPlan().toString())
    assert "GreaterThanOrEqual(term,alp)" in plan
    assert "LessThan(term,alq)" in plan
    # the dictionary read stays narrow: term+length only
    assert "struct<term:string,length:int>" in plan


def test_terms_dict_sorted_with_length(spark, built):
    """build.py stage 3 writes the dictionary term-sorted with a
    length column — the physical precondition for range pruning."""
    from sparkbm25 import catalog

    d, _ = built
    tdir = catalog.terms_dir(d)
    tdf = spark.read.parquet(tdir)
    assert "length" in tdf.columns
    pdf = tdf.toPandas()
    assert (pdf["length"] == pdf["term"].str.len()).all()
    # sorted within each parquet file (row-group stats monotone)
    import glob
    import os

    import pyarrow.parquet as pq

    for f in glob.glob(os.path.join(tdir, "*.parquet")):
        col = pq.read_table(f, columns=["term"]).column("term").to_pylist()
        assert col == sorted(col), f


def test_fuzzy_length_band_in_plan(spark, built):
    """Fuzzy expansion evaluates the cheap length band and the
    THRESHOLD form of levenshtein (banded O(d·n), early bail)."""
    d, _ = built
    src = _expand_terms_source(spark, d)
    cond = ((F.col("length") >= 3) & (F.col("length") <= 7)
            & (F.levenshtein(F.col("term"), F.lit("alpha"), 2) >= 0))
    plan = src.where(cond)._jdf.queryExecution().executedPlan().toString()
    assert "levenshtein(term" in plan and "2)" in plan
    assert "GreaterThanOrEqual(length,3)" in plan  # band pushed to scan
