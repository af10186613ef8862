"""End-to-end curation pipeline: dedup + quality + lang filtering into
an index that still answers searches."""

import datetime

import pytest

from sparkbm25 import Searcher
from sparkbm25.config import IndexConfig
from sparkbm25.pipeline import CurationConfig, curate, curate_and_index


@pytest.fixture(scope="module")
def dirty_corpus(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again"
    for i in range(40):
        # each doc gets enough unique trailing tokens that distinct
        # docs stay below the 0.8 jaccard near-dup threshold
        uniq = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        rows.append((f"conv_{i:04d}", 0, "user", f"{base} {uniq}", None,
                     datetime.datetime(2026, 1, 1)))
    # exact dups of conv_0000
    for j in range(3):
        rows.append((f"dup_{j}", 0, "user",
                     f"{base} alpha0 beta0 gamma0 delta0 epsilon0 zeta0", None,
                     datetime.datetime(2026, 1, 1)))
    # near dup of conv_0001 (one word appended)
    rows.append(("near_0", 0, "user",
                 f"{base} alpha1 beta1 gamma1 delta1 epsilon1 zeta1 extra", None,
                 datetime.datetime(2026, 1, 1)))
    # junk: empty and punctuation-only
    rows.append(("junk_0", 0, "user", "", None, datetime.datetime(2026, 1, 1)))
    rows.append(("junk_1", 0, "user", "!!! ??? ...", None, datetime.datetime(2026, 1, 1)))
    # non-english
    rows.append(("fr_0", 0, "user",
                 "le chat est sur la table et il est content de la vie", None,
                 datetime.datetime(2026, 1, 1)))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")


def test_curate_stages(spark, dirty_corpus):
    survivors, stats = curate(spark, dirty_corpus, CurationConfig(
        jaccard_threshold=0.8, min_quality=0.2, keep_langs=("en",),
        stage_counts=True))
    assert stats["n_input"] == 47
    # 3 exact dups removed (keep one of the 4 identical texts)
    assert stats["n_after_exact"] == 44
    # near-dup pass removes at least the planted near_0 or its twin
    assert stats["n_after_near"] < stats["n_after_exact"]
    assert stats["n_after_quality"] < stats["n_after_near"]
    assert stats["n_after_lang"] < stats["n_after_quality"]
    kept = {r["conv_id"] for r in survivors.select("conv_id").collect()}
    # the planted near-dup cluster lost a member
    assert not {"near_0", "conv_0001"} <= kept
    # junk killed by quality, french by lang filter
    assert "junk_0" not in kept and "junk_1" not in kept and "fr_0" not in kept
    # exactly one survivor of the 4 identical texts
    assert len({"dup_0", "dup_1", "dup_2", "conv_0000"} & kept) == 1


def test_curate_and_index_searchable(spark, dirty_corpus, tmp_path):
    res = curate_and_index(
        spark, dirty_corpus, str(tmp_path / "cidx"),
        CurationConfig(jaccard_threshold=0.8, min_quality=0.2, keep_langs=("en",)),
        IndexConfig(n_term_buckets=4, n_salt_buckets=2, n_build_chunks=1),
    )
    assert res.build.n_docs == res.n_after_lang
    s = Searcher(spark, str(tmp_path / "cidx"))
    hits = s.search("quick fox", k=5)
    assert len(hits) == 5


def test_annotate_rewrites_only_affected_blocks(spark, tmp_path):
    """The doc_block-partitioned forward table makes annotate a TRUE
    partial update: block dirs without matched keys keep their exact
    files (same paths, same mtimes) — only affected partitions swap."""
    import os

    from pyspark.sql import functions as F

    from sparkbm25.annotate import annotate_docs, read_annotations
    from sparkbm25.build import build_index
    from sparkbm25.fixtures import make_transcripts

    t = make_transcripts(400, seed=21)
    d = str(tmp_path / "blkidx")
    build_index(spark, spark.createDataFrame(t), d,
                IndexConfig(n_term_buckets=4, n_salt_buckets=2,
                            n_build_chunks=1, doc_block_size=64),
                input_desc="blk400")
    docs_dir = os.path.join(d, "docs")
    blocks = sorted(x for x in os.listdir(docs_dir) if x.startswith("doc_block="))
    assert len(blocks) >= 4  # 400 docs / 64 per block

    def snapshot(block):
        p = os.path.join(docs_dir, block)
        return {f: os.stat(os.path.join(p, f)).st_mtime_ns
                for f in os.listdir(p) if f.endswith(".parquet")}

    before = {b: snapshot(b) for b in blocks}
    # annotate the FIRST 10 turns only -> they live in doc_block=0
    first10 = t.sort_values(["conv_id", "turn_idx"]).head(10)
    upd = spark.createDataFrame(
        first10[["conv_id", "turn_idx"]].assign(value="x"))
    n = annotate_docs(spark, d, upd, "tag")
    assert n == 10
    after = {b: snapshot(b) for b in blocks}
    assert before["doc_block=0"] != after["doc_block=0"]
    for b in blocks[1:]:
        assert before[b] == after[b], f"{b} was rewritten needlessly"
    got = read_annotations(spark, d).toPandas()
    assert len(got) == 10 and set(got["name"]) == {"tag"}


def test_pair_graph_and_pipeline_interpreter():
    """Reference parity for the intermediary machinery
    (apertium.py:105-114 pairs_pipeline, :264-311 lang_tree/
    first_pairs_path; test_apertium.py:33 builds por->eng via cat):
    direct pairs stay one hop, missing pairs auto-select the first
    DFS intermediary, and PipelineInterpreter folds the hops."""
    import pandas as pd
    import pytest as _pytest

    from sparkbm25.translate import (PipelineInterpreter,
                                     ReverseTokenInterpreter,
                                     find_intermediary, lang_tree,
                                     first_pairs_path, pairs_pipeline)

    pairs = ["eng-spa", "spa-eng", "por-cat", "cat-eng", "por-glg"]
    # direct pair available -> single hop, alpha-3 formatted
    assert pairs_pipeline("en", "es", pairs) == ["eng-spa"]
    # no direct por-eng: the pair graph picks cat (first DFS path)
    assert find_intermediary("por", "eng", pairs) == "cat"
    assert pairs_pipeline("pt", "en", pairs) == ["por-cat", "cat-eng"]
    # an explicit intermediary short-circuits the search
    assert pairs_pipeline("pt", "en", [], intermediary="cat") == [
        "por-cat", "cat-eng"]
    # tree shape matches the reference traversal (undirected edges,
    # pair-list order, bounded depth)
    tree = lang_tree("por", [p.split("-") for p in pairs])
    assert list(tree["children"]) == ["cat", "glg"]
    assert first_pairs_path(tree, "eng") == ["cat"]
    with _pytest.raises(ValueError, match="no path"):
        find_intermediary("por", "zho", pairs)
    # two reverse hops compose to the identity on analyzed text
    p2 = PipelineInterpreter(
        [ReverseTokenInterpreter(), ReverseTokenInterpreter()], name="rev2")
    out = p2.translate_batch(pd.Series(["Hello, World 42", ""]))
    assert out.tolist() == ["hello world 42", ""]
    assert PipelineInterpreter([ReverseTokenInterpreter()]).name == "rev"
    with _pytest.raises(ValueError, match="at least one"):
        PipelineInterpreter([])


def test_annotate_swap_crash_window_repairs(spark, tmp_path):
    """ADVICE r3: a crash between rename(dst -> aside) and
    rename(src -> dst) leaves a doc_block partition missing from the
    forward table with its only copy in the aside dir. The next
    annotate (or repair_annotate_swap) must restore it — and must NOT
    clobber blocks whose partition already exists."""
    import os
    import shutil

    from sparkbm25.annotate import annotate_docs, read_annotations, repair_annotate_swap
    from sparkbm25.build import build_index
    from sparkbm25.fixtures import make_transcripts
    from sparkbm25 import catalog

    t = make_transcripts(300, seed=23)
    d = str(tmp_path / "crashidx")
    build_index(spark, spark.createDataFrame(t), d,
                IndexConfig(n_term_buckets=4, n_salt_buckets=2,
                            n_build_chunks=1, doc_block_size=64),
                input_desc="crash300")
    docs_dir = os.path.join(d, "docs")
    # simulate the crash window: block 0 moved aside, replacement never
    # landed
    old_root = catalog.staging_dir(d, "docs_annotate_old")
    os.makedirs(old_root, exist_ok=True)
    os.rename(os.path.join(docs_dir, "doc_block=0"),
              os.path.join(old_root, "doc_block=0"))
    # a stale aside copy of a block that DOES exist must be dropped,
    # not restored over the live partition
    shutil.copytree(os.path.join(docs_dir, "doc_block=1"),
                    os.path.join(old_root, "doc_block=1"))
    restored = repair_annotate_swap(d)
    assert restored == ["doc_block=0"]
    assert os.path.isdir(os.path.join(docs_dir, "doc_block=0"))
    assert not os.path.exists(old_root)
    # the table reads whole again and a follow-up annotate works
    assert catalog.read_docs(spark, d).count() == 300
    first5 = t.sort_values(["conv_id", "turn_idx"]).head(5)
    upd = spark.createDataFrame(first5[["conv_id", "turn_idx"]].assign(value="x"))
    assert annotate_docs(spark, d, upd, "tag") == 5
    assert len(read_annotations(spark, d).toPandas()) == 5


def test_translate_into_index_partial_resume(spark, tmp_path):
    """The reference's end-to-end job with its is_translated gate:
    translate half the corpus, then run over the WHOLE corpus — only
    the untranslated half processes; values are the interpreter's."""
    from sparkbm25.annotate import read_annotations
    from sparkbm25.build import build_index
    from sparkbm25.fixtures import make_transcripts
    from sparkbm25.translate import ReverseTokenInterpreter, translate_into_index

    t = make_transcripts(200, seed=31)
    d = str(tmp_path / "xidx")
    build_index(spark, spark.createDataFrame(t), d,
                IndexConfig(n_term_buckets=4, n_salt_buckets=2,
                            n_build_chunks=1), input_desc="x200")
    interp = ReverseTokenInterpreter()
    half = spark.createDataFrame(t.iloc[:100])
    n1 = translate_into_index(spark, d, half, interp)
    assert n1 == 100
    n2 = translate_into_index(spark, d, spark.createDataFrame(t), interp)
    assert n2 == 100  # only the remaining half
    got = read_annotations(spark, d).where("name = 'rev'").toPandas()
    assert len(got) == 200
    # spot-check the translation content
    row = t.iloc[5]
    val = got[(got.conv_id == row.conv_id)
              & (got.turn_idx == row.turn_idx)]["value"].iloc[0]
    import re
    expect = " ".join(w[::-1] for w in re.findall("[a-z0-9]+", row.text.lower()))
    assert val == expect


def test_annotate_duplicate_update_keys_no_row_multiplication(spark, tmp_path):
    """Round-2 ADVICE: duplicate (conv_id, turn_idx) rows in a
    caller-supplied updates frame multiplied forward-table rows via the
    left join, permanently corrupting the docs table. Updates now
    pre-aggregate per key: ALL values append (sorted), row count stays
    fixed."""
    from pyspark.sql import functions as F

    from sparkbm25.annotate import annotate_docs, read_annotations
    from sparkbm25.build import build_index
    from sparkbm25.catalog import read_docs
    from sparkbm25.fixtures import make_transcripts

    t = make_transcripts(100, seed=41)
    d = str(tmp_path / "dupidx")
    build_index(spark, spark.createDataFrame(t), d,
                IndexConfig(n_term_buckets=4, n_salt_buckets=2,
                            n_build_chunks=1), input_desc="dup100")
    n_docs_before = read_docs(spark, d).count()
    key = t.sort_values(["conv_id", "turn_idx"]).iloc[0]
    upd = spark.createDataFrame(
        [(key.conv_id, int(key.turn_idx), "b"),
         (key.conv_id, int(key.turn_idx), "a"),
         (key.conv_id, int(key.turn_idx), "a")],
        "conv_id string, turn_idx int, value string")
    n = annotate_docs(spark, d, upd, "multi")
    assert n == 1                      # one doc matched
    docs_after = read_docs(spark, d)
    assert docs_after.count() == n_docs_before            # no multiplication
    assert docs_after.groupBy("doc_ord").count().where("count > 1").count() == 0
    got = read_annotations(spark, d).where("name = 'multi'").toPandas()
    assert sorted(got["value"]) == ["a", "a", "b"]        # all values kept


def test_translate_converges_when_transcripts_outgrow_index(spark, tmp_path):
    """pending_turns scopes to turns the INDEX holds: a transcripts
    table that grew past the index previously re-translated the
    unindexed tail on EVERY run and silently dropped the output —
    pending never reached zero (final-round review)."""
    from sparkbm25.build import build_index
    from sparkbm25.fixtures import make_transcripts
    from sparkbm25.translate import (ReverseTokenInterpreter,
                                     pending_turns, translate_into_index)

    t = make_transcripts(120, seed=13)
    d = str(tmp_path / "growidx")
    indexed = spark.createDataFrame(t.iloc[:80])
    build_index(spark, indexed, d,
                IndexConfig(n_term_buckets=4, n_salt_buckets=2,
                            n_build_chunks=1), input_desc="grow80")
    interp = ReverseTokenInterpreter()
    grown = spark.createDataFrame(t)          # 40 turns not indexed
    assert pending_turns(spark, d, grown, interp).count() == 80
    n = translate_into_index(spark, d, grown, interp)
    assert n == 80
    # convergence: the second run has NOTHING pending (previously 40
    # unindexed turns stayed pending forever)
    assert pending_turns(spark, d, grown, interp).count() == 0
    assert translate_into_index(spark, d, grown, interp) == 0
