"""Training-pipeline text ops: dedup family, text analysis (engine
variants; SQL-checkable twins live in oracle_suite)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkbm25 import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),        # exact dup of 0
        (2, "the quick brown fox jumped over the lazy dog"),       # near dup
        (3, "completely different text about spark and indexes"),
        (4, "le chat est sur la table et il est content"),
        (5, "el gato es un animal que vive en la casa"),
        (6, ""),
        (7, "zzz " * 50),                                           # repetitive
        (8, "the of and is a to in that it for"),                   # stopword soup
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string").cache()


def test_exact_dedup(spark, docs):
    out = textops.exact_dedup(docs).collect()
    assert len(out) == 1
    assert out[0]["n_dups"] == 2 and out[0]["canonical_id"] == 0


def test_exact_dedup_member_cap_defuses_boilerplate(spark):
    """VERDICT r3 item 3: one text duplicated 10^5 times must NOT
    build a 10^5-element member array (the cap keeps the max_members
    smallest ids; n_dups stays exact)."""
    n = 100_000
    big = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("boilerplate text").alias("text"))
    out = textops.exact_dedup(big, max_members=16).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_dups"] == n
    assert row["canonical_id"] == 0
    assert row["member_ids"] == list(range(16))


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = textops.minhash_lsh_pairs(docs, bands=6, n_hashes=12).toPandas()
    got = set(map(tuple, pairs[["id1", "id2"]].values.tolist()))
    assert (0, 1) in got  # exact dups always collide
    # verify stage: exact jaccard keeps real near-dups, kills noise
    verified = textops.ngram_jaccard(docs, spark.createDataFrame(
        pairs), threshold=0.5).toPandas()
    vgot = set(map(tuple, verified[["id1", "id2"]].values.tolist()))
    assert (0, 1) in vgot
    assert all(j >= 0.5 for j in verified["jaccard"])


def test_simhash_pairs(spark, docs):
    out = textops.simhash_pairs(docs, max_hamming=3).toPandas()
    got = set(map(tuple, out[["id1", "id2"]].values.tolist()))
    assert (0, 1) in got          # identical text => hamming 0
    assert out[(out.id1 == 0) & (out.id2 == 1)]["hamming"].iloc[0] == 0


def test_lang_id(spark, docs):
    out = {r["id"]: r["lang_pred"] for r in textops.lang_id(docs).collect()}
    assert out[0] == "en" and out[8] == "en"
    assert out[4] == "fr"
    assert out[5] == "es"
    assert out[6] == "und"


def test_quality_score(spark, docs):
    out = textops.quality_score(docs).toPandas().set_index("id")
    assert 0.0 <= out["quality"].min() and out["quality"].max() <= 1.0
    # empty doc scores worst; repetitive doc scores below normal prose
    assert out.loc[6, "quality"] == out["quality"].min()
    assert out.loc[7, "quality"] < out.loc[0, "quality"]


def test_token_count(spark, docs):
    out = textops.token_count(docs).toPandas().set_index("id")
    assert out.loc[0, "ws_tokens"] == 9
    assert out.loc[0, "bpeish_tokens"] >= 9


def test_fingerprint_stability_and_sensitivity(spark, docs):
    out = {r["id"]: r["fingerprint"] for r in textops.fingerprint64(docs).collect()}
    assert out[0] == out[1]        # identical text, identical fingerprint
    assert out[0] != out[3]


def test_lsh_bucket_cap_defuses_degenerate_bucket(spark):
    """A degenerate bucket (many identical/boilerplate docs sharing a
    signature) must NOT explode into B(B-1)/2 pairs: buckets above
    max_bucket are dropped before pairing (VERDICT item 7)."""
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    rows = [(i, boiler) for i in range(300)]          # 300 identical docs
    rows += [(1000 + i, f"unique doc {i} alpha beta gamma delta epsilon zeta eta")
             for i in range(50)]
    sdf = __import__("pyspark").sql.SparkSession.getActiveSession().createDataFrame(
        rows, "doc_id bigint, text string")
    pairs = textops.minhash_lsh_pairs(sdf, max_bucket=64)
    # uncapped, the boilerplate bucket alone is 300*299/2 = 44850 pairs
    assert pairs.count() < 5000
    # with a cap large enough, the pairs come back
    pairs_big = textops.minhash_lsh_pairs(sdf, max_bucket=1000)
    assert pairs_big.count() >= 300 * 299 / 2


def test_minhash_no_cartesian(spark):
    """LSH banding on dissimilar docs must not explode into ~n^2 pairs."""
    rng = np.random.default_rng(0)
    vocab = [f"t{i}" for i in range(2000)]
    rows = [(i, " ".join(rng.choice(vocab, 12, replace=False))) for i in range(200)]
    docs = rng.permutation  # noqa: F841  (keep rng used)
    sdf = __import__("pyspark").sql.SparkSession.getActiveSession().createDataFrame(
        rows, "doc_id bigint, text string")
    pairs = textops.minhash_lsh_pairs(sdf, bands=4, n_hashes=12)
    assert pairs.count() < 200 * 10  # far below 200*199/2


def test_simhash_bucket_cap_defuses_boilerplate(spark):
    """Round-2 VERDICT item 1: simhash bands are only ~13-16 bits wide,
    so a boilerplate corpus floods one band key and the self-join goes
    quadratic. Buckets over max_bucket drop before pairing — same
    guard as minhash_lsh_pairs. Near-dups outside the hot bucket are
    still found."""
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    rows = [(i, boiler) for i in range(300)]          # one hot simhash
    rows += [(1000, "spark shuffles data across the executors tonight"),
             (1001, "spark shuffles data across the executors tonight"),
             (1002, "a completely unrelated sentence about gardening tools")]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = textops.simhash_pairs(sdf, max_hamming=3, max_bucket=64).toPandas()
    # uncapped, the boilerplate bucket alone is 300*299/2 = 44850 pairs
    boiler_pairs = pairs[(pairs.id1 < 1000) & (pairs.id2 < 1000)]
    assert len(boiler_pairs) == 0
    got = set(map(tuple, pairs[["id1", "id2"]].values.tolist()))
    assert (1000, 1001) in got       # dup outside the hot bucket survives
    # cap disabled: the quadratic (but exact) small-scale mode returns
    pairs_all = textops.simhash_pairs(sdf, max_hamming=3, max_bucket=0)
    assert pairs_all.where("id1 < 1000 and id2 < 1000").count() == 300 * 299 / 2


def test_token_count_null_and_empty(spark):
    """NULL and empty/whitespace-only text count 0 tokens (final-round
    review: split(NULL) propagated NULL/-1 and split('') counted 1)."""
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "two words")],
        "doc_id bigint, text string")
    out = textops.token_count(df).toPandas().set_index("id")
    assert out.loc[0, "ws_tokens"] == 0 and out.loc[0, "bpeish_tokens"] == 0
    assert out.loc[1, "ws_tokens"] == 0 and out.loc[1, "bpeish_tokens"] == 0
    assert out.loc[2, "ws_tokens"] == 0
    assert out.loc[3, "ws_tokens"] == 2


def test_minhash_lsh_bands_validated(spark, docs):
    """bands > n_hashes silently returned ZERO pairs (r=0 makes every
    band key md5('') and every bucket degenerate); a non-divisor
    silently ignored trailing signature elements. Both raise now
    (final-round review)."""
    import pytest

    with pytest.raises(ValueError, match="must divide n_hashes"):
        textops.minhash_lsh_pairs(docs, n_hashes=12, bands=16)
    with pytest.raises(ValueError, match="must divide n_hashes"):
        textops.minhash_lsh_pairs(docs, n_hashes=12, bands=5)


def test_minhash_signatures_match_catalyst_form(spark):
    """The round-6 Arrow kernel must produce signatures bit-identical
    to the TRUE-family Catalyst expression — family i prefixes every
    shingle with '<i>:' like the DuckDB oracle twin does. (The round-5
    Catalyst form wrote `lambda s, i=i:` — a two-argument lambda that
    Spark's transform() feeds (element, ARRAY INDEX), silently
    overriding the family id with the shingle position, so all
    n_hashes signature elements were identical and the Spark banding
    diverged from its own oracle's; the corpora never exposed a
    candidate-set difference, which is why the hash checks passed.
    The kernel restores the oracle's actual semantics.) Edge cases:
    whole-doc shingle for short docs, '' shingle for empty/null docs,
    unicode through the pandas tokenizer fallback."""
    from pyspark.sql import functions as F

    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "short doc"),                       # < shingle width
        (2, ""),                                # empty -> '' shingle
        (3, None),                              # null -> '' shingle
        (4, "rep rep rep rep rep"),             # repeated tokens
        (5, "MIXED Case! punct-uation 123"),
        (6, "héllo wörld über tokens straße x"),  # unicode fallback
        (7, "a b c a b c a b c"),               # repeated shingles
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = (textops.minhash_signatures(df, n_hashes=5, shingle=3)
           .toPandas().sort_values("id").reset_index(drop=True))
    sh = textops.shingles_col(textops.tokens_col("text"), 3)

    def family(i):
        # single-argument lambda: transform() passes the ELEMENT only
        return F.array_min(F.transform(
            sh, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))))

    sig = F.array(*[family(i) for i in range(5)])
    exp = (df.select(F.col("doc_id").alias("id"), sig.alias("sig"))
           .toPandas().sort_values("id").reset_index(drop=True))
    assert got["id"].tolist() == exp["id"].tolist()
    for g, e in zip(got["sig"], exp["sig"]):
        assert list(g) == list(e)
    # the families are genuinely distinct now (the old degenerate form
    # made every element equal whenever a doc had >= 2 shingles)
    assert len(set(got["sig"].iloc[0])) > 1
