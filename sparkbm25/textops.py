"""Training-data pipeline text operators (engine-native forms).

The oracle_suite exposes the SQL-checkable variants; these are the
scale-path implementations a 100 TB curation pipeline would call:
everything vectorized Arrow/pandas, shuffles keyed to avoid skew.

Dedup family:
  exact_dedup           md5(text) hash-groupBy
  minhash_lsh_pairs     b bands × r rows MinHash-LSH over token
                        shingles — candidate pairs via band-bucket
                        join (never a cartesian)
  simhash64             64-bit SimHash per doc + banded near-dup pairs
  ngram_jaccard         exact Jaccard verify on candidate pairs

Text analysis:
  lang_id               stopword-profile heuristic language ID
  quality_score         length/punct/stopword-ratio features + score
  token_count           whitespace + BPE-ish regex token counts
  fingerprint64         rolling (Rabin-Karp) content fingerprint
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from sparkbm25.analysis import tokenize_series

# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash (hash-groupBy; the
    canonical id is the min id). Scale: one shuffle on a 128-bit hash —
    uniform by construction, no skew handling needed."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
            F.collect_list(id_col).alias("member_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def _shingle_hashes_udf(shingle: int):
    @F.pandas_udf(ArrayType(LongType()))
    def shingles(texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)

        def hash_row(lst):
            if len(lst) < shingle:
                lst = lst + [""] * (shingle - len(lst))
            joined = [" ".join(lst[i:i + shingle]) for i in range(len(lst) - shingle + 1)]
            return pd.util.hash_array(np.asarray(joined, dtype=object)).astype(np.int64)

        return toks.map(hash_row)

    return shingles


# 64-bit odd multipliers for the universal-hash family h_i(x) = a_i*x + b_i
_MINHASH_A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                       0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5 | 1, 0x27D4EB2F165667C5,
                       0x9E3779B97F4A7C15 ^ 0xFF, 0xC2B2AE3D27D4EB4F ^ 0xFF0,
                       0x165667B19E3779F9 ^ 0xF00, 0xD6E8FEB86659FD93 ^ 0xF000,
                       0xBF58476D1CE4E5B9, 0x94D049BB133111EB], dtype=np.uint64)
_MINHASH_B = np.arange(1, 13, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    shingle: int = 3,
) -> DataFrame:
    """(id, sig: array<long>[n_hashes]) MinHash over token 3-gram
    shingles — one vectorized Arrow pass, no explode/shuffle."""
    assert n_hashes <= _MINHASH_A.size
    a = _MINHASH_A[:n_hashes]
    b = _MINHASH_B[:n_hashes]
    sh_udf = _shingle_hashes_udf(shingle)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash(hashes: pd.Series) -> pd.Series:
        def sig(arr):
            x = np.asarray(arr, dtype=np.uint64)
            if x.size == 0:
                return np.zeros(n_hashes, dtype=np.int64)
            # h_i(x) = a_i * x + b_i (mod 2^64), min over shingles
            m = (x[None, :] * a[:, None] + b[:, None]).min(axis=1)
            return m.astype(np.int64)

        return hashes.map(sig)

    return docs.select(
        F.col(id_col).alias("id"), minhash(sh_udf(F.col(text_col))).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    bands: int = 4,
    shingle: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs via b bands × r rows LSH banding:
    explode per band (bounded ×bands blowup), groupBy band-key, pair
    within buckets. A bucket with B members yields B(B-1)/2 pairs —
    candidates only, verify with ngram_jaccard. The band-key join is
    the scale path: candidates never require doc × doc."""
    r = n_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, n_hashes, shingle)
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.hash(*[F.col("sig")[j] for j in range(i * r, (i + 1) * r)]).alias("key"),
        )
        for i in range(bands)
    ]
    banded = sigs.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = banded.alias("x")
    right = banded.alias("y")
    return (
        left.join(right, ["band", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id1"), F.col("y.id").alias("id2"))
        .distinct()
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verify stage of
    the LSH pipeline). Joins shingle sets only for candidate ids —
    semi-join pruned."""
    sh_udf = _shingle_hashes_udf(shingle)
    ids = pairs.select(F.col("id1").alias("id")).union(
        pairs.select(F.col("id2"))).distinct()
    sh = (
        docs.join(ids, docs[id_col] == ids["id"], "left_semi")
        .select(F.col(id_col).alias("id"),
                F.array_distinct(sh_udf(F.col(text_col))).alias("sh"))
    )
    j = (
        pairs.join(sh.withColumnRenamed("id", "id1").withColumnRenamed("sh", "sh1"), "id1")
        .join(sh.withColumnRenamed("id", "id2").withColumnRenamed("sh", "sh2"), "id2")
        .select(
            "id1", "id2",
            (F.size(F.array_intersect("sh1", "sh2"))
             / F.size(F.array_union("sh1", "sh2"))).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= threshold)


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc (token-level) + the 4 16-bit bands used
    for near-dup blocking (docs within Hamming distance 3 share at
    least one band)."""

    @F.pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)

        def one(lst):
            if not lst:
                return 0
            h = pd.util.hash_array(np.asarray(lst, dtype=object)).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
                       .astype(np.int64))

        return toks.map(one)

    out = docs.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("simhash"))
    for i in range(4):
        out = out.withColumn(
            f"band{i}",
            F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).cast("int"),
        )
    return out


def simhash_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: band-join (pigeonhole: hamming<=3 over 4
    bands ⇒ one band equal), then exact popcount filter."""
    s = simhash64(docs, id_col, text_col)
    cands = None
    for i in range(4):
        l = s.select(F.col("id").alias("id1"), F.col("simhash").alias("h1"), f"band{i}")
        rgt = s.select(F.col("id").alias("id2"), F.col("simhash").alias("h2"), f"band{i}")
        c = l.join(rgt, f"band{i}").where(F.col("id1") < F.col("id2")).select(
            "id1", "id2", "h1", "h2")
        cands = c if cands is None else cands.unionByName(c)
    return (
        cands.distinct()
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_STOPWORD_PROFILES = {
    "en": {"the", "a", "of", "and", "is", "to", "in", "that", "it", "for"},
    "fr": {"le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"},
    "es": {"el", "la", "de", "y", "es", "un", "una", "que", "por", "en"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
}


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """n-gram/stopword heuristic language ID: argmax of per-language
    stopword hit ratio; 'und' (undetermined) when no profile hits."""
    profiles = {k: frozenset(v) for k, v in _STOPWORD_PROFILES.items()}
    langs = sorted(profiles)

    @F.pandas_udf(StringType())
    def lid(texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)

        def one(lst):
            if not lst:
                return "und"
            best, best_hits = "und", 0
            for lang in langs:
                hits = sum(1 for t in lst if t in profiles[lang])
                if hits > best_hits:
                    best, best_hits = lang, hits
            return best

        return toks.map(one)

    return docs.select(F.col(id_col).alias("id"), lid(F.col(text_col)).alias("lang_pred"))


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality features + a [0,1] score: length, alpha ratio, stopword
    ratio, mean word length, repetition (distinct/total tokens). Pure
    column expressions + one Arrow pass for token features."""

    @F.pandas_udf("n_tokens long, n_distinct long, n_stop long, mean_wlen double")
    def tok_feats(texts: pd.Series) -> pd.DataFrame:
        toks = tokenize_series(texts)
        en = _STOPWORD_PROFILES["en"]
        n = toks.str.len().astype("int64")
        nd = toks.map(lambda l: len(set(l))).astype("int64")
        ns = toks.map(lambda l: sum(1 for t in l if t in en)).astype("int64")
        mw = toks.map(lambda l: float(np.mean([len(t) for t in l])) if l else 0.0)
        return pd.DataFrame({"n_tokens": n, "n_distinct": nd, "n_stop": ns, "mean_wlen": mw})

    out = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t"),
        tok_feats(F.col(text_col)).alias("f"),
        F.length(text_col).alias("n_chars"),
    ).select(
        "id", "n_chars", "f.n_tokens", "f.n_distinct", "f.n_stop", "f.mean_wlen",
        (F.length(F.regexp_replace(F.lower("_t"), "[^a-z]", "")) /
         F.greatest(F.length("_t"), F.lit(1))).alias("alpha_ratio"),
    )
    return out.withColumn(
        "quality",
        F.round(
            F.least(F.col("n_tokens") / 20.0, F.lit(1.0)) * 0.25
            + F.col("alpha_ratio") * 0.25
            + F.least(F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1)) * 5.0,
                      F.lit(1.0)) * 0.2
            + (F.col("n_distinct") / F.greatest(F.col("n_tokens"), F.lit(1))) * 0.3,
            4,
        ),
    )


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword count (regex split on
    common subword boundaries — a deterministic proxy for a real
    tokenizer's token count)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.size(F.split(F.lower(F.col(text_col)),
                       r"(?=[^a-z0-9])|(?<=[^a-z0-9])|(?<=[a-z]{4})(?=[a-z]{3})")
               ).alias("bpeish_tokens"),
    )


def fingerprint64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  window: int = 8) -> DataFrame:
    """Rolling Rabin-Karp fingerprint: min of the rolling hashes over
    token windows (a winnowing-style document fingerprint, robust to
    local edits)."""
    B = np.uint64(1099511628211)

    @F.pandas_udf(LongType())
    def fp(texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)

        def one(lst):
            if not lst:
                return 0
            h = pd.util.hash_array(np.asarray(lst, dtype=object)).astype(np.uint64)
            if h.size <= window:
                acc = np.uint64(0)
                for x in h:
                    acc = acc * B + x
                return int(acc.astype(np.int64))
            # rolling: hash of each window, vectorized via cumulative trick
            pw = B ** np.arange(window, dtype=np.uint64)
            wins = np.lib.stride_tricks.sliding_window_view(h, window)
            vals = (wins * pw[::-1]).sum(axis=1)
            return int(vals.min().astype(np.int64))

        return toks.map(one)

    return docs.select(F.col(id_col).alias("id"), fp(F.col(text_col)).alias("fingerprint"))
