"""BM25 top-k query engine over the segment index.

The capability the reference delegates to Elasticsearch with
``search.query('query_string', query=...)`` (es_translator/
es_translator.py:313-323) — analyzed full-text retrieval with BM25
ranking — implemented natively:

  * batch path (`search_batch`): the whole query set as one DataFrame
    job — query terms broadcast-joined to the term dictionary and the
    pruned segment scan, blocks decoded + scored in a vectorized Arrow
    stage, per-partition partial top-k, then a final window. This is
    the path the DuckDB oracle checks.
  * interactive path (`Searcher.search`): one query on the driver over
    batch-decoded flat posting arrays — chunked vectorized MaxScore
    (default) or its block-max WAND verification twin (OR mode,
    `or_algo=`), vectorized intersection (AND mode); all pruning
    lossless. Only the posting blocks of the query's terms are fetched
    (term_bucket partition pruning + term predicate pushdown — the
    analog of ES routing a query to the right shard), and bounded LRU
    caches (decoded postings / df map / doc resolve) make warm
    repeats run without any Spark job.

Ranking contract (parity with refscore.bm25_reference_topk):
  score(q,d) = Σ_t qtf·idf·(k1+1)·tf / (tf + k1(1-b+b·dl/avgdl)),
  idf = ln(1+(N-df+0.5)/(df+0.5)); ties (score desc, conv_id asc,
  turn_idx asc) ≡ (score desc, doc_ord asc) because doc_ord is the
  dense rank of (conv_id, turn_idx).
"""

from __future__ import annotations

import heapq
import json
import os
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkbm25 import catalog, localio
from sparkbm25.analysis import tokenize_one
from sparkbm25.codec import decode_blocks
from sparkbm25.config import IndexConfig
from sparkbm25.querystring import filter_columns as qs_filter_columns


def _load_stats(index_dir: str) -> tuple[int, float, IndexConfig, list[dict]]:
    """Global corpus stats (summed across generations for an
    incrementally-built index) + per-generation info for WAND
    upper-bound correction."""
    stats = catalog.global_stats(index_dir)
    cfg = (IndexConfig.from_json(stats["config"])
           if isinstance(stats["config"], str)
           else IndexConfig(**json.loads(stats["config"])))
    return int(stats["n_docs"]), float(stats["avgdl"]), cfg, stats["generations"]


def _read_segments(spark: SparkSession, index_dir: str):
    """Union the segment tables of all generations (each generation is
    its own partitioned-parquet root, so a single multi-path read would
    see conflicting partition structures)."""
    dfs = [spark.read.parquet(p) for p in catalog.segments_paths(index_dir)]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d.select(out.columns))
    return out


class _QueryPlan:
    """One query's compiled form: slot-numbered leaves + an acceptance
    function over the per-doc matched-leaf bitmask."""

    __slots__ = ("qid", "k", "filters", "neg_filters", "leaves", "accept",
                 "accept_empty", "accept_trivial")

    def __init__(self, qid, k, filters, neg_filters, leaves, accept,
                 accept_empty=False, accept_trivial=False):
        self.qid = qid
        self.k = k
        self.filters = filters
        self.neg_filters = neg_filters
        self.leaves = leaves      # list of dicts: slot/kind/terms/weight
        self.accept = accept      # mask Column -> Column(bool), or None
        # the boolean tree evaluated at the EMPTY mask: True means a doc
        # matching no leaf at all is accepted (pure-negative trees like
        # 'NOT spam') — such docs have no posting rows and must come
        # from the forward table instead (ES/Lucene semantics)
        self.accept_empty = accept_empty
        # accept is PROVABLY true for every emitted posting row (the
        # implicit-OR `mask != 0` — every row matched >= 1 leaf by
        # construction): lets the batch path skip the mask machinery
        # entirely for plain disjunctions
        self.accept_trivial = accept_trivial

    @property
    def has_positive(self) -> bool:
        return any(l["weight"] > 0.0 for l in self.leaves)


def _compile_queries(queries: pd.DataFrame, cfg: IndexConfig, mode: str,
                     default_k: int) -> list[_QueryPlan]:
    """Compile each query_string to slot-numbered leaves + acceptance.

    Implicit queries (no boolean operators / NOT / phrase) keep the
    legacy semantics: mode='or' accepts any matched term, mode='and'
    requires all; duplicate terms keep their qtf weight. Explicit
    queries evaluate the boolean tree over the matched-leaf bitmask;
    the score is the sum of matched POSITIVE leaves (NOT leaves weigh
    0 and only set their mask bit)."""
    from sparkbm25 import querystring as qs

    def eval_empty(n) -> bool:
        """The boolean tree at the empty mask (no leaf matched)."""
        if isinstance(n, (qs.Term, qs.Phrase, qs.Prefix, qs.Fuzzy,
                          qs.Wildcard, qs.Regexp)):
            return False
        if isinstance(n, qs.Not):
            return not eval_empty(n.child)
        if isinstance(n, qs.And):
            return all(eval_empty(c) for c in n.children)
        if isinstance(n, qs.Or):
            return any(eval_empty(c) for c in n.children)
        raise TypeError(type(n))

    plans: list[_QueryPlan] = []
    for q in queries.itertuples(index=False):
        qid = int(q.query_id)
        k = int(getattr(q, "k", default_k) or default_k)
        parsed = qs.parse_query_string(q.query_text, cfg.token_pattern)
        accept_empty = False
        accept_trivial = False
        leaves: list[dict] = []
        if not parsed.explicit:
            counts = Counter(tokenize_one(parsed.text, cfg.token_pattern))
            for term, qtf in sorted(counts.items()):
                leaves.append({"slot": len(leaves), "kind": "term",
                               "terms": [term], "weight": float(qtf)})
            nslots = len(leaves)
            if mode == "and":
                full = (1 << nslots) - 1
                accept = (lambda m, full=full:
                          m.bitwiseAND(F.lit(full)) == F.lit(full))
            else:
                accept = (lambda m: m != 0)
                # every posting row matched >= 1 leaf by construction
                accept_trivial = nslots > 0
            if nslots == 0:
                accept = None
        else:
            pos, neg = qs.collect_leaves(parsed.tree)
            slot_of: dict[int, int] = {}
            for leaf in list(pos) + list(neg):
                slot = len(leaves)
                slot_of[id(leaf)] = slot
                max_edits = 0
                slop = 0
                if isinstance(leaf, qs.Phrase):
                    terms = list(leaf.terms)
                    kind = "phrase"
                    slop = int(leaf.slop)
                elif isinstance(leaf, qs.Prefix):
                    # placeholder: the execution layer expands against
                    # the term dictionary (all expansions share this
                    # leaf's slot — Lucene scoring_boolean rewrite)
                    terms = [leaf.prefix]
                    kind = "prefix"
                elif isinstance(leaf, qs.Fuzzy):
                    terms = [leaf.term]
                    kind = "fuzzy"
                    max_edits = leaf.max_edits
                elif isinstance(leaf, qs.Wildcard):
                    # placeholder pattern: expands against the term
                    # dictionary like prefix/fuzzy (scoring_boolean)
                    terms = [leaf.pattern]
                    kind = "wildcard"
                elif isinstance(leaf, qs.Regexp):
                    # anchored full-term regexp — expands against the
                    # dictionary like prefix/wildcard
                    terms = [leaf.pattern]
                    kind = "regexp"
                else:
                    terms = [leaf.text]
                    kind = "term"
                # clause boost multiplies the leaf's BM25 contribution
                # (Lucene ^boost); NOT leaves never score
                leaves.append({
                    "slot": slot, "kind": kind, "terms": terms,
                    "max_edits": max_edits, "slop": slop,
                    "weight": (float(leaf.boost)
                               if any(leaf is p for p in pos) else 0.0),
                })
            if not pos and not (parsed.filters or parsed.neg_filters):
                raise ValueError(
                    f"query {qid}: pure-negative queries need a positive "
                    "clause or a structured predicate (Lucene semantics)")
            accept_empty = (eval_empty(parsed.tree)
                            if parsed.tree is not None else False)

            def make_accept(tree, slot_map):
                def bit(m, s):
                    return m.bitwiseAND(F.lit(1 << s)) != 0

                def walk(n, m):
                    if isinstance(n, (qs.Term, qs.Phrase, qs.Prefix,
                                      qs.Fuzzy, qs.Wildcard, qs.Regexp)):
                        return bit(m, slot_map[id(n)])
                    if isinstance(n, qs.Not):
                        return ~walk(n.child, m)
                    if isinstance(n, qs.And):
                        out = F.lit(True)
                        for c in n.children:
                            out = out & walk(c, m)
                        return out
                    if isinstance(n, qs.Or):
                        out = F.lit(False)
                        for c in n.children:
                            out = out | walk(c, m)
                        return out
                    raise TypeError(type(n))

                return lambda m: walk(tree, m)

            accept = (make_accept(parsed.tree, slot_of)
                      if parsed.tree is not None else None)
        if len(leaves) > 62:
            raise ValueError(f"query {qid}: more than 62 leaves")
        plans.append(_QueryPlan(qid, k, parsed.filters, parsed.neg_filters,
                                leaves, accept, accept_empty,
                                accept_trivial))
    return plans


def _levenshtein(a: str, b: str) -> int:
    """Plain unit-cost edit distance — must agree with Spark's
    F.levenshtein (used in the expansion scan) and DuckDB's
    levenshtein (used by the SQL oracle)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _sloppy_exists(lists: list[np.ndarray], tidxs: np.ndarray,
                   slop: int) -> bool:
    """Sloppy-phrase match test over one doc's per-slot position lists.

    lists[i] holds the ADJUSTED positions of phrase slot i (raw token
    position minus the slot index), so an exact phrase is all slots
    agreeing on one adjusted value. Semantics implemented: the doc
    matches iff one adjusted position can be chosen per slot with
      max(chosen) - min(chosen) <= slop
    and all RAW positions (adjusted + slot index) distinct — the same
    physical token never fills two slots (only possible when the
    phrase repeats a term). For TWO-term phrases this is exactly
    Lucene's sloppy-phrase edit-distance slop (the ES `"a b"~N`
    semantics: reversed adjacency needs N>=2); for longer phrases it
    is the span approximation — Lucene's m>2 matcher charges the SUM
    of per-term displacements in some arrangements where the span
    charges the max, so this accepts a superset at equal slop. The
    deviation is documented here and in querystring's grammar table.

    An optimal window's lower edge is always one of the adjusted
    values, so anchoring candidate windows at each value is complete.
    Per-doc occurrence counts are small (tf per term), so the scan is
    cheap; the distinct-assignment backtracking only does real work
    when the phrase repeats a term."""
    m = len(lists)
    if m == 1:
        return lists[0].size > 0
    allvals = np.unique(np.concatenate(lists))
    for lo in allvals.tolist():
        hi = lo + slop
        wins = []
        for arr in lists:
            w = arr[(arr >= lo) & (arr <= hi)]
            if w.size == 0:
                break
            wins.append(w)
        if len(wins) < m:
            continue
        if _distinct_assignment(wins, tidxs):
            return True
    return False


def _distinct_assignment(wins: list[np.ndarray], tidxs) -> bool:
    """System-of-distinct-representatives check on RAW positions: one
    raw position per slot, all distinct. Raw collisions across slots
    are only possible between slots holding the SAME term (a token
    position appears in a term's posting positions only if the token
    IS that term), so for repeat-free phrases this returns True
    immediately after the trivial size check."""
    raw = [set((np.asarray(w) + int(t)).tolist())
           for w, t in zip(wins, tidxs)]
    order = sorted(range(len(raw)), key=lambda i: len(raw[i]))
    used: set[int] = set()

    def bt(j: int) -> bool:
        if j == len(order):
            return True
        for p in raw[order[j]]:
            if p not in used:
                used.add(p)
                if bt(j + 1):
                    return True
                used.discard(p)
        return False

    return bt(0)


def _verify_phrase_sets(slot_csr: list, tidxs: np.ndarray,
                        slop: int, repeated: bool) -> np.ndarray:
    """Vectorized phrase verification over n candidate docs at once.

    slot_csr[s] = (flat, offs): CSR of phrase slot s's ADJUSTED
    positions (raw - tidxs[s]) across the SAME n docs in the SAME doc
    order — flat holds doc i's values in offs[i]:offs[i+1], ascending
    within each doc. Returns a bool keep-mask of length n.

    The per-doc loops this replaces (np.intersect1d / _sloppy_exists
    per candidate) cost ~20-30µs of numpy-call overhead per doc — at
    a stopword phrase's ~10^5-survivor intersection that was seconds
    of driver (and minutes of applyInPandas-per-group) time. Here
    every doc's values fold into ONE sorted int64 key stream per slot
    (doc_row * BIG + adjusted + OFF with BIG wide enough that windows
    of ±slop can never cross a row boundary), so:
      * exact (slop 0): iterative sorted-stream intersection via
        searchsorted — identical semantics to per-doc intersect1d,
        including repeated-term phrases (distinct raw tokens are
        implied by distinct adjusted values at slop 0);
      * slop>0, two DISTINCT terms (the dominant sloppy shape): a doc
        matches iff some |a0 - a1| <= slop — two searchsorted calls
        bound each slot-0 key's window in slot 1's stream; raw
        distinctness is free (different terms never share a token
        position);
      * slop>0, m>2 DISTINCT terms: a matching window's lower edge is
        always one of the adjusted values (the same anchoring
        argument _sloppy_exists documents), so every key is tested as
        a lower edge with one searchsorted per slot over all
        candidates at once — the span-approximation semantics,
        vectorized; raw distinctness is again free for distinct
        terms;
      * repeated-term sloppy phrases only: the documented
        _sloppy_exists scan per doc, unchanged — the
        distinct-assignment backtracking has no vector form and the
        shape is rare.
    """
    n = slot_csr[0][1].size - 1
    if n == 0:
        return np.zeros(0, dtype=bool)
    m = len(slot_csr)
    mask = np.zeros(n, dtype=bool)
    if slop == 0 or not repeated:
        maxv = 0
        for flat, _ in slot_csr:
            if flat.size:
                maxv = max(maxv, int(flat.max()))
        off = m  # adjusted values reach down to -(m-1)
        big = maxv + off + slop + 2
        keys = []
        for flat, offs in slot_csr:
            if flat.size == 0:
                return mask
            rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
            keys.append(rows * big + (flat + off))
        if slop == 0:
            cur = keys[0]
            for s in range(1, m):
                ks = keys[s]
                pos = np.searchsorted(ks, cur)
                np.minimum(pos, ks.size - 1, out=pos)
                cur = cur[ks[pos] == cur]
                if cur.size == 0:
                    return mask
            mask[cur // big] = True
            return mask
        if m == 2:
            k0, k1 = keys
            lo = np.searchsorted(k1, k0 - slop, side="left")
            hi = np.searchsorted(k1, k0 + slop, side="right")
            mask[k0[hi > lo] // big] = True
            return mask
        cand = np.concatenate(keys)
        ok = np.ones(cand.size, dtype=bool)
        for ks in keys:
            pos = np.searchsorted(ks, cand, side="left")
            np.minimum(pos, ks.size - 1, out=pos)
            v = ks[pos]
            # pos clamped past the end shows up as v < cand -> fails.
            # big > maxv + off + slop + 1 keeps cand + slop inside the
            # candidate's own row band, so a hit can't leak across docs
            ok &= (v >= cand) & (v <= cand + slop)
        mask[cand[ok] // big] = True
        return mask
    for i in range(n):
        lists = [flat[offs[i]:offs[i + 1]] for flat, offs in slot_csr]
        mask[i] = _sloppy_exists(lists, tidxs, slop)
    return mask


def _expand_terms_source(spark: SparkSession, index_dir: str) -> DataFrame:
    """One-row-per-term source for multi-term expansion: the terms
    dictionary when every generation built one (build_terms_dict=True,
    the default) — one row per term instead of term × salt × generation
    segment rows — else the pruned segment scan (term column only;
    parquet column pruning keeps the blocks bytes out). Always carries
    a `length` column: read from the dictionary when the generation
    wrote one (build.py stage 3, term-sorted layout), derived on the
    fly for pre-round-5 indexes and the segment fallback."""
    tdirs = [catalog.terms_dir(g)
             for g in catalog.generation_dirs(index_dir)]
    if tdirs and all(os.path.isdir(d) and os.listdir(d) for d in tdirs):
        dfs = []
        for d in tdirs:
            one = spark.read.parquet(d)
            if "length" not in one.columns:
                one = one.withColumn("length", F.length("term").cast("int"))
            dfs.append(one.select("term", "length"))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
    return (_read_segments(spark, index_dir)
            .select("term")
            .withColumn("length", F.length("term").cast("int")))


def _wildcard_parts(pat: str) -> tuple[str, str, int, int | None]:
    """Compile a Lucene wildcard pattern (`*` any run, `?` one char)
    into SQL-LIKE form plus its pruning bands:
    (like_pattern, literal_prefix, min_length, exact_length_or_None).
    SQL metachars in literal runs are escaped (default backslash
    escape in both Spark and DuckDB)."""
    import re as _re

    like = (pat.replace("\\", "\\\\").replace("%", r"\%")
            .replace("_", r"\_").replace("*", "%").replace("?", "_"))
    prefix = _re.match(r"^[^*?]*", pat).group(0)
    min_len = len(pat.replace("*", ""))
    exact_len = len(pat) if "*" not in pat else None
    return like, prefix, min_len, exact_len


def _has_toplevel_alt(pat: str, i: int = 0) -> bool:
    """True when the pattern has a `|` OUTSIDE every group / class /
    quoted run from position i on — a top-level alternation means NO
    leading literal is required of every match, so any banding prefix
    collected before it must be voided. Conservative on malformed
    syntax (returns True -> full scan, always safe)."""
    n = len(pat)
    depth = 0
    while i < n:
        c = pat[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            j = pat.find('"', i + 1)
            if j < 0:
                return True
            i = j + 1
            continue
        if c == "[":
            i += 1
            if i < n and pat[i] == "^":
                i += 1
            if i < n and pat[i] == "]":
                i += 1
            while i < n and pat[i] != "]":
                i += 2 if pat[i] == "\\" else 1
            i += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif c == "|" and depth == 0:
            return True
        i += 1
    return False


def _regexp_literal_prefix(pat: str) -> str:
    """The longest leading LITERAL run of a Lucene-dialect regexp —
    the prefix every match must start with, used to band the
    dictionary scan exactly like a wildcard's literal head (Lucene
    extracts the same prefix from its compiled automaton).
    Conservative: stops at the first metacharacter, and a literal
    unit immediately followed by a quantifier (`ab*` — the `b` is
    optional) is not part of the prefix. Walks THROUGH `\\X` escapes
    and `"..."` quoted runs (both are literal units in the Lucene
    dialect, round 5), and a TOP-LEVEL `|` anywhere voids the whole
    head — `/ab|cd/` requires no leading `ab` of its `cd` branch
    (late round 5: the head was previously kept, so the band
    silently dropped every match of the right alternative)."""
    out = []
    i = 0
    n = len(pat)
    # Lucene-dialect metacharacters: the regex set plus the Lucene
    # operators `@ # < > ~ &` — stopping at any of them keeps the
    # band a true lower bound on every match
    metas = set(".?*+()[]{}|^$@#<>~&")
    while i < n:
        ch = pat[i]
        if ch == "\\" and i + 1 < n:
            if i + 2 < n and pat[i + 2] in "*?+{":
                break                      # escaped literal quantified
            out.append(pat[i + 1])
            i += 2
            continue
        if ch == '"':
            j = pat.find('"', i + 1)
            if j < 0:
                break                      # malformed: stop collecting
            if j + 1 < n and pat[j + 1] in "*?+{":
                break                      # whole quoted run quantified
            out.append(pat[i + 1:j])
            i = j + 1
            continue
        if ch in metas or ch == "\\":
            break
        if i + 1 < n and pat[i + 1] in "*?+{":
            break
        out.append(ch)
        i += 1
    if _has_toplevel_alt(pat, i):
        return ""
    return "".join(out)


def _prefix_upper(p: str) -> str | None:
    """Smallest string greater than every string starting with `p`:
    increment the last codepoint, carrying over maximal ones. None
    means no finite upper bound exists (all-U+10FFFF prefix)."""
    for i in range(len(p) - 1, -1, -1):
        o = ord(p[i])
        if o < 0x10FFFF:
            return p[:i] + chr(o + 1)
    return None


def _expand_multiterm(spark: SparkSession, index_dir: str,
                      prefixes: list[str],
                      fuzzies: list[tuple[str, int]],
                      wildcards: list[str] = (),
                      regexps: list[str] = (),
                      max_expansions: int = 128) -> dict[str, list[str]]:
    """Expand `foo*` prefix and `foo~N` fuzzy leaves against the term
    dictionary (Lucene multi-term rewrite). No bucket pruning is
    possible (crc32 routing hashes whole terms), which matches Lucene:
    multi-term queries walk the term dict — but the walk is BANDED,
    not a full vocabulary scan (VERDICT r4 item 2 'weak'):

      * prefix `p*` compiles to the range predicate
        term >= p AND term < next(p) (plus startswith for exactness).
        The dictionary is written term-sorted (build.py stage 3), so
        parquet row-group min/max statistics prune the scan to the row
        groups actually containing the prefix range — the columnar
        analog of Lucene's FST prefix walk.
      * fuzzy `q~d` prefilters on the stored length column
        (len(q)-d <= length <= len(q)+d — edit distance can never be
        under the length difference) and then runs JVM levenshtein
        WITH the threshold argument, which switches Spark to the
        banded O(d·n) algorithm and bails early instead of filling
        the full DP matrix per candidate. d=0 degenerates to an
        equality probe (range-prunable like a prefix).
      * wildcard `te*t` / `t?st` compiles to a JVM LIKE over the
        dictionary, banded by the literal-prefix range (row-group
        pruning when the pattern has a non-empty literal head) and a
        length bound (exact length for ?-only patterns, minimum
        literal+? count otherwise). A LEADING wildcard has no prefix
        band and scans the dictionary — the cost Lucene documents for
        leading wildcards.

    Each leaf's subquery carries limit(max_expansions+1) pushed below
    the collect, so the driver NEVER materializes more than
    max_expansions+1 terms per leaf even for a one-letter prefix over
    a web-scale vocabulary (round-3 collected the full match set
    before the guard — VERDICT r3 item 2); the (max_expansions+1)-th
    row is the sentinel that fires the too-many-clauses guard. All
    leaves union into ONE job. Keys: 'p:<prefix>' / 'f:<term>~<n>'."""
    src = _expand_terms_source(spark, index_dir)
    parts = []
    for p in prefixes:
        cond = (F.col("term") >= F.lit(p)) & F.col("term").startswith(p)
        up = _prefix_upper(p)
        if up is not None:
            cond = cond & (F.col("term") < F.lit(up))
        parts.append(
            src.where(cond).select("term").distinct()
            .limit(max_expansions + 1)
            .select(F.lit(f"p:{p}").alias("key"), "term"))
    for t, d in fuzzies:
        if d == 0:
            cond = F.col("term") == F.lit(t)
        else:
            cond = (
                (F.col("length") >= F.lit(len(t) - d))
                & (F.col("length") <= F.lit(len(t) + d))
                & (F.levenshtein(F.col("term"), F.lit(t), d) >= 0)
            )
        parts.append(
            src.where(cond).select("term").distinct()
            .limit(max_expansions + 1)
            .select(F.lit(f"f:{t}~{d}").alias("key"), "term"))
    for w in wildcards:
        like, prefix, min_len, exact_len = _wildcard_parts(w)
        cond = F.col("term").like(like)
        if prefix:
            cond = cond & (F.col("term") >= F.lit(prefix))
            up = _prefix_upper(prefix)
            if up is not None:
                cond = cond & (F.col("term") < F.lit(up))
        if exact_len is not None:
            cond = cond & (F.col("length") == F.lit(exact_len))
        elif min_len:
            cond = cond & (F.col("length") >= F.lit(min_len))
        parts.append(
            src.where(cond).select("term").distinct()
            .limit(max_expansions + 1)
            .select(F.lit(f"w:{w}").alias("key"), "term"))
    for rx in regexps:
        # Lucene regexp: anchored full-term match (rlike is a substring
        # search, hence the wrap); banded by the pattern's literal head
        # when it has one — a prefix-less regexp scans the dictionary,
        # the cost Lucene documents for such patterns. The pattern is
        # stored in the LUCENE dialect and compiles through
        # lucenere.to_portable so the JVM regex engine keeps Lucene
        # semantics (`\d` literal, `^`/`$` literal, `.` spans all,
        # `@`/`#` operators)
        from sparkbm25.lucenere import to_portable
        # \A/\z, not ^/$ — Java `$` also matches before a trailing
        # newline; dictionary terms can't contain one under the
        # default token pattern, but a custom token_pattern could,
        # and the python-twin paths use fullmatch (exact-end) — keep
        # the two engines bit-identical (final-round review, same fix
        # as the keyword-field rlike in querystring._one_predicate)
        cond = F.col("term").rlike("\\A(?:" + to_portable(rx) + ")\\z")
        pref = _regexp_literal_prefix(rx)
        if pref:
            cond = (F.col("term") >= F.lit(pref)) & cond
            up = _prefix_upper(pref)
            if up is not None:
                cond = cond & (F.col("term") < F.lit(up))
        parts.append(
            src.where(cond).select("term").distinct()
            .limit(max_expansions + 1)
            .select(F.lit(f"x:{rx}").alias("key"), "term"))
    u = parts[0]
    for q in parts[1:]:
        u = u.unionByName(q)
    out: dict[str, list[str]] = {}
    for p in prefixes:
        out[f"p:{p}"] = []
    for t, d in fuzzies:
        out[f"f:{t}~{d}"] = []
    for w in wildcards:
        out[f"w:{w}"] = []
    for rx in regexps:
        out[f"x:{rx}"] = []
    for r in u.collect():
        out[r["key"]].append(r["term"])
    for key, matched in out.items():
        if len(matched) > max_expansions:
            raise ValueError(
                f"multi-term leaf '{key[2:]}' expands to more than "
                f"max_expansions={max_expansions} terms; narrow it")
        matched.sort()
    return out


def _union_sum(alldocs: np.ndarray, allsc: np.ndarray,
               n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Union-sum concatenated (doc, contribution) streams into
    (unique docs, per-doc score sums) — the shared tail of the hot-OR
    exhaustive path and _merge_parts (the two copies had drifted to
    different positivity guards; final-round review). Dense
    bincount+flatnonzero when the corpus is small enough relative to
    the stream — but flatnonzero(dense) == the matched-doc set only
    when every contribution is strictly positive (BM25 contribs are,
    unless a pathological ^0 boost zeroes one — the min() check
    catches exactly that); otherwise the sparse unique + add.at
    reduction. Module-level (n_docs passed in) so duck-typed test
    stubs of the driver algorithms need no extra surface."""
    if (n_docs <= max(8 * alldocs.size, 1 << 20)
            and float(allsc.min(initial=1.0)) > 0.0):
        dense = np.bincount(alldocs, weights=allsc, minlength=n_docs)
        uniq = np.flatnonzero(dense)
        return uniq, dense[uniq]
    uniq, inv = np.unique(alldocs, return_inverse=True)
    sums = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(sums, inv, allsc)
    return uniq, sums


def _flatten_tree(tree) -> tuple[dict[str, float], str] | None:
    """Flatten an explicit boolean tree into (term -> summed boost,
    'or'|'and') when — and only when — the tree is a bag of positive
    Term leaves under one OR or one AND (or a single Term). These are
    exactly the shapes the interactive driver algorithms already
    implement (union scoring / intersection), so such queries need no
    distributed batch detour (VERDICT r4 item 6). Phrases, prefixes,
    fuzzies, NOT, and nested mixed trees return None → batch path."""
    from sparkbm25 import querystring as qs

    if isinstance(tree, qs.Term):
        return {tree.text: float(tree.boost)}, "or"
    if isinstance(tree, (qs.Or, qs.And)):
        w: dict[str, float] = {}
        for c in tree.children:
            if not isinstance(c, qs.Term):
                return None
            w[c.text] = w.get(c.text, 0.0) + float(c.boost)
        if not w:
            return None
        return w, ("or" if isinstance(tree, qs.Or) else "and")
    return None


def _flatten_or_leaves(tree):
    """OR-of-leaves (or a single leaf) where leaves may be multi-term
    (Prefix/Fuzzy/Wildcard) besides plain Terms: returns
    [(kind, payload, boost)] or None. Under OR, every dictionary
    expansion of a multi-term leaf scores independently with the
    leaf's boost and the candidate set is the union — exactly the
    flat-weights shape the driver OR algorithms implement, so these
    queries need no batch detour once expanded (the expansion itself
    is one banded dictionary job, cached per leaf). AND trees with
    multi-term leaves stay on the batch path (AND-of-ORs is not a
    flat intersection)."""
    from sparkbm25 import querystring as qs

    out = []
    stack = [tree]
    while stack:
        c = stack.pop(0)
        if isinstance(c, qs.Or):
            # nested ORs flatten (OR is associative)
            stack = list(c.children) + stack
            continue
        if isinstance(c, qs.Term):
            out.append(("term", c.text, float(c.boost)))
        elif isinstance(c, qs.Prefix):
            out.append(("prefix", c.prefix, float(c.boost)))
        elif isinstance(c, qs.Fuzzy):
            out.append(("fuzzy", (c.term, c.max_edits), float(c.boost)))
        elif isinstance(c, qs.Wildcard):
            out.append(("wildcard", c.pattern, float(c.boost)))
        elif isinstance(c, qs.Regexp):
            out.append(("regexp", c.pattern, float(c.boost)))
        elif isinstance(c, qs.Phrase):
            # positions verify driver-side (_eval_phrase): under OR a
            # phrase is just another leaf whose (docs, scores) pair
            # merges into the union
            out.append(("phrase", (tuple(c.terms), int(c.slop)),
                        float(c.boost)))
        elif isinstance(c, qs.And) and not c.children:
            # the MatchAll sentinel (querystring._match_all): this OR
            # group came from a `+` required-clause rewrite — it
            # matches every doc, so as a conjunct it does NOT gate;
            # its other leaves still score (Lucene SHOULD-under-MUST)
            out.append(("matchall", None, 0.0))
        else:
            return None
    return out or None


def _flatten_cnf(tree):
    """One-level CNF with negation: a single leaf, an OR of leaves,
    or an AND whose children are leaves / OR-of-leaves / NOT-of-those
    (nested ANDs/ORs flatten by associativity). Returns
    (positive_groups, negative_groups) of leaf-spec lists, or None
    for deeper mixed nesting (NOT under OR, NOT of AND, double NOT) —
    those keep the batch path's full mask algebra. At least one
    positive group is required (pure-negative semantics — constant
    score under a filter — live in the batch path)."""
    from sparkbm25 import querystring as qs

    if isinstance(tree, qs.And):
        pos, neg = [], []
        stack = list(tree.children)
        while stack:
            c = stack.pop(0)
            if isinstance(c, qs.And):
                stack = list(c.children) + stack
                continue
            if isinstance(c, qs.Not):
                g = _flatten_or_leaves(c.child)
                if g is None:
                    return None
                neg.append(g)
                continue
            g = _flatten_or_leaves(c)
            if g is None:
                return None
            pos.append(g)
        if not pos:
            return None
        return pos, neg
    g = _flatten_or_leaves(tree)
    return ([g], []) if g is not None else None


def _plans_to_rows(plans: list[_QueryPlan]) -> pd.DataFrame:
    """Leaf/term rows for the broadcast join:
    (query_id, term, slot, tidx, weight, is_phrase, n_terms, slop, k)."""
    rows = []
    for p in plans:
        for leaf in p.leaves:
            for tidx, term in enumerate(leaf["terms"]):
                rows.append((p.qid, term, leaf["slot"], tidx, leaf["weight"],
                             leaf["kind"] == "phrase", len(leaf["terms"]),
                             int(leaf.get("slop", 0)), p.k))
    return pd.DataFrame(rows, columns=[
        "query_id", "term", "slot", "tidx", "weight", "is_phrase",
        "n_terms", "slop", "k"])


def _scored_rows(spark: SparkSession, index_dir: str, qp: pd.DataFrame,
                 cfg: IndexConfig, n_docs: int, avgdl: float,
                 lean: bool = False,
                 single_leaf_k: dict[int, int] | None = None) -> DataFrame:
    """The posting-derived scoring pipeline: pruned segment scan →
    vectorized block decode + BM25 (plan and idf ride one broadcast) →
    (phrase verification) → per-(query, doc) rollup. Returns
    (query_id, doc_ord, score, mask) — every doc matching >=1 leaf.

    lean=True (no phrase leaves, no caller use of the mask — plain
    disjunction batches): the kernel emits only (query_id, doc_ord,
    score) and the rollup skips the bit_or — ~30% fewer bytes across
    the Python boundary and through the one exchange, score values
    bitwise identical (same rows, same order, same summation)."""
    any_phrase = bool(qp["is_phrase"].any())
    if any_phrase and not cfg.store_positions:
        raise ValueError(
            "phrase queries need an index built with "
            "IndexConfig(store_positions=True)")

    uniq_terms = sorted(qp["term"].unique().tolist())
    # client-side routing: term -> bucket is a pure hash (ES _routing
    # analog) — NO dictionary scan; df comes from the segment rows
    # themselves (sum of per-salt n_docs via a tiny window).
    buckets = sorted({cfg.term_bucket_of(t) for t in uniq_terms})

    pruned_segs = (
        _read_segments(spark, index_dir)
        .where(F.col("term_bucket").isin(buckets))     # partition pruning
        .where(F.col("term").isin(uniq_terms))         # rowgroup pushdown
    )
    # df per term: for a LOCAL index root, ONE column-pruned pyarrow
    # read of (term, n_docs) on the driver — the ES-coordinator shape
    # (term stats come from shard metadata, not from a cluster job) —
    # and idf ships to the decode kernels inside the same broadcast as
    # the plan; the blocks column then flows scan → decode with no
    # join node at all. Non-local roots keep the round-5 shape: a
    # NARROW aggregate broadcast back to the scan — NOT a
    # Window.partitionBy(term) over the segment rows, whose exchange
    # would shuffle the blocks payload itself (round-2 did; at 960k
    # turns that one exchange made a 1-query batch cost the same ~7s
    # as a 10-query batch). The agg subplan reads only (term, n_docs)
    # — parquet column pruning keeps the blocks bytes out.
    idf_map: dict[str, float] | None = None
    seg_roots = [localio.local_path(p)
                 for p in catalog.segments_paths(index_dir)]
    if all(r is not None for r in seg_roots):
        import pyarrow.compute as pc

        df_by_term: dict[str, int] = {}
        filt = pc.field("term").isin(uniq_terms)
        for root in seg_roots:
            ix = localio.LocalParquetIndex(root, "term_bucket")
            tb = ix.read(buckets, ["term", "n_docs"], filter=filt)
            if tb is None:
                continue
            for t, nd in zip(tb.column("term").to_pylist(),
                             tb.column("n_docs").to_pylist()):
                df_by_term[t] = df_by_term.get(t, 0) + int(nd)
        idf_map = {
            t: float(np.log(1.0 + (float(n_docs) - df + 0.5) / (df + 0.5)))
            for t, df in df_by_term.items()}
        dfs = None
    else:
        dfs = (
            pruned_segs.groupBy("term")
            .agg(F.sum("n_docs").alias("df"))
            .withColumn(
                "idf",
                F.log(1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            )
            .select("term", "idf")
        )
    # one (term -> leaf list) map broadcast to the decode kernels: the
    # round-5 plan joined qdf onto the segment rows BEFORE the decode,
    # so a term referenced by L query leaves shipped its blocks bytes
    # through Arrow L times and decoded them L times (the bench set's
    # hot terms appear in 2-3 queries each — measured ~25%% of the
    # whole-batch decode stage wasted on duplicate decodes). Now the
    # scan stays one row per segment row, each row decodes ONCE, and
    # the kernel fans the decoded arrays out per leaf from the
    # broadcast map. Leaf rows emit in qp order per segment row; the
    # per-leaf float expression is kept verbatim, so every emitted
    # score is bitwise identical to the joined plan's.
    leaf_map: dict[str, list[tuple]] = {}
    for row in qp.itertuples(index=False):
        leaf_map.setdefault(row.term, []).append(
            (int(row.query_id), int(row.slot), int(row.tidx),
             float(row.weight), bool(row.is_phrase), int(row.n_terms),
             int(row.slop)))
    leaf_bc = spark.sparkContext.broadcast((leaf_map, idf_map))

    hits = pruned_segs.select("term", "blocks")
    if dfs is not None:
        hits = hits.join(F.broadcast(dfs), "term")

    k1, b = cfg.k1, cfg.b

    lean_cols = ("query_id", "doc_ord", "score")
    full_cols = ("query_id", "doc_ord", "slot", "tidx", "n_terms",
                 "score", "is_phrase")
    slk = single_leaf_k if lean else None

    def decode_score(batches):
        lm, idfs = leaf_bc.value
        cols = lean_cols if lean else full_cols
        # single-leaf (unfiltered) queries: a doc's whole score is ONE
        # contribution from one block row, so a per-partition exact
        # top-k is a valid pre-reduction regardless of file layout —
        # these queries then ship k rows per partition through the
        # rollup/reduce instead of millions (the hot single-term bench
        # queries were ~1/3 of the sf1 rollup volume)
        single: dict[int, list] = {}
        for pdf in batches:
            out = {c: [] for c in cols}
            for row in pdf.itertuples(index=False):
                leaves = lm.get(row.term)
                if not leaves:
                    continue
                docs, tfs, dls = decode_blocks(row.blocks)
                if docs.size == 0:
                    continue
                idf = idfs[row.term] if idfs is not None else row.idf
                denom = tfs + k1 * (1.0 - b + b * (dls / avgdl))
                n = docs.size
                for (query_id, slot, tidx, weight, is_phrase, n_terms,
                     _slop) in leaves:
                    w = weight * idf * (k1 + 1.0) * tfs / denom
                    if slk is not None and query_id in slk:
                        single.setdefault(query_id, []).append((docs, w))
                        continue
                    out["query_id"].append(np.full(n, query_id, dtype=np.int32))
                    out["doc_ord"].append(docs)
                    out["score"].append(w)
                    if not lean:
                        out["slot"].append(np.full(n, slot, dtype=np.int32))
                        out["tidx"].append(np.full(n, tidx, dtype=np.int32))
                        out["n_terms"].append(
                            np.full(n, n_terms, dtype=np.int32))
                        out["is_phrase"].append(
                            np.full(n, is_phrase, dtype=bool))
            if out["query_id"]:
                yield pd.DataFrame(
                    {c: np.concatenate(v) for c, v in out.items()})
        if single:
            out = {c: [] for c in lean_cols}
            for query_id, parts_q in single.items():
                d = np.concatenate([p[0] for p in parts_q])
                s = np.concatenate([p[1] for p in parts_q])
                kq = slk[query_id]
                if d.size > kq:
                    head = np.lexsort((d, -s))[:kq]
                    d, s = d[head], s[head]
                out["query_id"].append(
                    np.full(d.size, query_id, dtype=np.int32))
                out["doc_ord"].append(d)
                out["score"].append(s)
            yield pd.DataFrame(
                {c: np.concatenate(v) for c, v in out.items()})

    parts = hits.mapInPandas(
        decode_score,
        schema=("query_id int, doc_ord bigint, score double" if lean else
                "query_id int, doc_ord bigint, slot int, tidx int, "
                "n_terms int, score double, is_phrase boolean"))
    if lean:
        # plain-disjunction fast shape: no mask, no phrase branch
        return parts.groupBy("query_id", "doc_ord").agg(
            F.sum("score").alias("score"))

    if any_phrase:
        term_rows = parts.where(~F.col("is_phrase")).select(
            "query_id", "doc_ord", "slot", "score")

        # JVM-side prefilter (round-2 VERDICT item 2): only docs
        # matching ALL of a phrase's terms can be phrase matches, so
        # the completeness check aggregates NARROW columns first —
        # position payloads never shuffle for the (often huge) set of
        # docs that matched just one hot term of the phrase. The
        # survivor set is bounded by the rarest phrase term's df
        # (intersection), so it broadcasts; a phrase of pure stopwords
        # is the worst case and still only ships survivors' positions.
        survivors = (
            parts.where(F.col("is_phrase"))
            .groupBy("query_id", "doc_ord", "slot")
            .agg(F.countDistinct("tidx").alias("nt"),
                 F.max("n_terms").alias("m"))
            .where(F.col("nt") == F.col("m"))
            .select("query_id", "doc_ord", "slot")
        )

        def decode_pos(batches):
            # positions stage: each block decoded ONCE (docs/tfs feed
            # both the score and the occurrence-count split — round-2
            # decoded twice, VERDICT item 3), and — like decode_score —
            # once per SEGMENT ROW, fanned out per phrase leaf from the
            # broadcast map (a term shared by P phrase leaves no longer
            # re-decodes its blocks P times)
            from sparkbm25.codec import decode_block, decode_block_positions

            lm, idfs = leaf_bc.value
            for pdf in batches:
                out = {c: [] for c in ("query_id", "doc_ord", "slot",
                                       "tidx", "slop", "score", "positions")}
                for row in pdf.itertuples(index=False):
                    leaves = [l for l in lm.get(row.term, ()) if l[4]]
                    if not leaves:
                        continue
                    idf = idfs[row.term] if idfs is not None else row.idf
                    for blk in row.blocks:
                        docs, tfs, dls = decode_block(blk)
                        if docs.size == 0:
                            continue
                        denom = tfs + k1 * (1.0 - b + b * (dls / avgdl))
                        flat, occ = decode_block_positions(blk, tfs)
                        plists = np.split(flat, occ[1:-1])
                        # explicit object array: np.array() would build
                        # a 2-D matrix when every posting has equal tf
                        parr = np.empty(len(plists), dtype=object)
                        parr[:] = plists
                        n = docs.size
                        for (query_id, slot, tidx, weight, _isp,
                             _n_terms, slop) in leaves:
                            w = weight * idf * (k1 + 1.0) * tfs / denom
                            out["query_id"].append(
                                np.full(n, query_id, dtype=np.int32))
                            out["doc_ord"].append(docs)
                            out["slot"].append(np.full(n, slot, dtype=np.int32))
                            out["tidx"].append(np.full(n, tidx, dtype=np.int32))
                            out["slop"].append(np.full(n, slop, dtype=np.int32))
                            out["score"].append(w)
                            out["positions"].append(parr)
                if out["query_id"]:
                    yield pd.DataFrame(
                        {c: np.concatenate(v) for c, v in out.items()})

        phrase_terms = sorted({
            t for t, leaves in leaf_map.items() if any(l[4] for l in leaves)})
        pos_rows = hits.where(F.col("term").isin(phrase_terms)).mapInPandas(
            decode_pos,
            schema="query_id int, doc_ord bigint, slot int, tidx int, "
                   "slop int, score double, positions array<bigint>")
        pruned = pos_rows.join(
            F.broadcast(survivors), ["query_id", "doc_ord", "slot"],
            "left_semi")

        def verify_leaf(pdf: pd.DataFrame) -> pd.DataFrame:
            # applyInPandas delivers ONE phrase leaf's WHOLE survivor
            # set (round-2 grouped within Arrow batches, silently
            # dropping matches whose rows straddled a 10k-row batch
            # boundary — ADVICE r2 high; round-5 regrouped from
            # per-(query,doc,slot) to per-(query,slot): a stopword
            # phrase's ~10^5 surviving docs cost ~1ms of Python each
            # as separate groups ≈ minutes — one group + the
            # vectorized _verify_phrase_sets kernel is ~10^5× fewer
            # interpreter crossings. Group memory is bounded by the
            # rarest member term's df (the intersection), the same
            # bound the survivors broadcast above already accepts.
            no_match = pd.DataFrame({
                "query_id": pd.Series(dtype="int32"),
                "doc_ord": pd.Series(dtype="int64"),
                "slot": pd.Series(dtype="int32"),
                "score": pd.Series(dtype="float64")})
            if len(pdf) == 0:
                return no_match
            slop = int(pdf["slop"].iloc[0])
            tidx = pdf["tidx"].to_numpy()
            uniq_t = np.unique(tidx)
            m = uniq_t.size
            # survivors guarantee every doc carries all m tidx rows
            # exactly once, so lexsort (tidx major, doc minor) yields
            # m equal slices over an identical doc order
            order = np.lexsort((pdf["doc_ord"].to_numpy(), tidx))
            doc_sorted = pdf["doc_ord"].to_numpy()[order]
            n = len(pdf) // m
            docs = doc_sorted[:n]
            if len(pdf) != n * m or not np.array_equal(
                    doc_sorted.reshape(m, n)[1:],
                    np.broadcast_to(docs, (m - 1, n))):
                # one row per (doc, tidx) is the survivor-join
                # invariant; loud failure beats silent misalignment
                raise AssertionError(
                    "phrase survivor rows are not one-per-(doc,tidx)")
            pos_sorted = pdf["positions"].to_numpy()[order]
            slot_csr = []
            for s in range(m):
                chunk = pos_sorted[s * n:(s + 1) * n]
                lens = np.fromiter((len(p) for p in chunk),
                                   dtype=np.int64, count=n)
                offs = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(lens, out=offs[1:])
                flat = (np.concatenate(chunk).astype(np.int64)
                        if offs[-1] else np.empty(0, dtype=np.int64))
                slot_csr.append((flat - int(uniq_t[s]), offs))
            repeated = False  # distinct tidx by construction; the
            # repeated-TERM case is what matters for the sloppy
            # kernel: two slots of the same term share raw positions.
            # ALL slot pairs are checked, not just m==2 (final-round
            # review finding: '"foo bar foo"~2' skipped the distinct-
            # assignment path and accepted a doc with ONE foo token
            # filling both slots, diverging from the driver path's
            # len(set(terms)) < m). Identical raw streams ⇔ same term:
            # one doc position holds one token, so two DIFFERENT terms
            # can never produce equal streams (the first flat element
            # of a pair always belongs to the same doc).
            if slop > 0 and m >= 2:
                raws = [slot_csr[s][0] + int(uniq_t[s]) for s in range(m)]
                repeated = any(
                    raws[i].size == raws[j].size
                    and bool(np.array_equal(raws[i], raws[j]))
                    for i in range(m) for j in range(i + 1, m))
            keep = _verify_phrase_sets(slot_csr, uniq_t, slop, repeated)
            if not keep.any():
                return no_match
            score = pdf["score"].to_numpy()[order].reshape(m, n).sum(axis=0)
            return pd.DataFrame({
                "query_id": np.full(int(keep.sum()),
                                    int(pdf["query_id"].iloc[0]),
                                    dtype="int32"),
                "doc_ord": docs[keep],
                "slot": np.full(int(keep.sum()),
                                int(pdf["slot"].iloc[0]), dtype="int32"),
                "score": score[keep]})

        verified = pruned.groupBy("query_id", "slot").applyInPandas(
            verify_leaf,
            schema="query_id int, doc_ord bigint, slot int, score double")
        leaf_rows = term_rows.unionByName(verified)
    else:
        leaf_rows = parts.select("query_id", "doc_ord", "slot", "score")

    # doc-level rollup: BM25 sum + matched-leaf bitmask in ONE shuffle.
    # bit_or, NOT sum: a doc matching several expansions of one prefix
    # leaf has multiple rows with the same slot, and summing 1<<slot
    # would carry into other bits
    return leaf_rows.groupBy("query_id", "doc_ord").agg(
        F.sum("score").alias("score"),
        F.expr("bit_or(shiftleft(cast(1 as bigint), slot))").alias("mask"),
    )


def search_batch(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    k: int = 10,
    mode: str = "or",
) -> DataFrame:
    """Top-k for a whole query set; returns
    (query_id, rank, conv_id, turn_idx, score).

    query_text may use the full query_string grammar (OR / AND / NOT /
    "phrases" / field:value — querystring.py). Every query compiles to
    slot-numbered leaves; matched leaves per doc aggregate into a
    bitmask, and the boolean tree evaluates as a Catalyst expression
    over that mask (legacy implicit queries compile to mask!=0 /
    mask==full, so v1 behavior is unchanged). Scores are the sum of
    matched positive leaves; NOT leaves weigh 0. Phrase leaves add a
    position-verification stage over the positions stream."""
    n_docs, avgdl, cfg, _gens = _load_stats(index_dir)
    plans = _compile_queries(queries, cfg, mode, k)
    # prefix/fuzzy leaves expand against the term dictionary before
    # the posting join; every expansion shares its leaf's slot, so the
    # boolean mask and the disjunction-sum score fall out of the
    # existing machinery (scoring_boolean rewrite)
    prefixes = sorted({l["terms"][0] for p in plans for l in p.leaves
                       if l["kind"] == "prefix"})
    fuzzies = sorted({(l["terms"][0], l["max_edits"]) for p in plans
                      for l in p.leaves if l["kind"] == "fuzzy"})
    wildcards = sorted({l["terms"][0] for p in plans for l in p.leaves
                        if l["kind"] == "wildcard"})
    regexps = sorted({l["terms"][0] for p in plans for l in p.leaves
                      if l["kind"] == "regexp"})
    if (prefixes or fuzzies or wildcards or regexps) and n_docs > 0:
        expansions = _expand_multiterm(spark, index_dir, prefixes, fuzzies,
                                       wildcards, regexps)
        for p in plans:
            for l in p.leaves:
                if l["kind"] == "prefix":
                    l["terms"] = expansions.get(f"p:{l['terms'][0]}", [])
                elif l["kind"] == "fuzzy":
                    l["terms"] = expansions.get(
                        f"f:{l['terms'][0]}~{l['max_edits']}", [])
                elif l["kind"] == "wildcard":
                    l["terms"] = expansions.get(f"w:{l['terms'][0]}", [])
                elif l["kind"] == "regexp":
                    l["terms"] = expansions.get(f"x:{l['terms'][0]}", [])
    qp = _plans_to_rows(plans)
    empty = spark.createDataFrame(
        [], "query_id int, rank int, conv_id string, turn_idx int, score double")
    if n_docs == 0:
        return empty

    from sparkbm25.querystring import filter_condition

    # ---- classification from PRE-expansion plan shape (ADVICE r3
    # high): round-3 classified filter-only queries from post-expansion
    # qp rows, so a positive prefix/fuzzy leaf that expanded to zero
    # dictionary terms ('zzz* AND role:user') fell into the filter-only
    # path and returned match-all-under-filter. Lucene semantics: a
    # required clause matching nothing yields zero hits — such queries
    # keep their (never-satisfiable) boolean acceptance instead. ----
    fonly = [p for p in plans if not p.leaves and (p.filters or p.neg_filters)]
    negonly = [p for p in plans if p.leaves and not p.has_positive]
    neg_qids = {int(p.qid) for p in negonly}
    scored_plans = [p for p in plans if p.leaves and p.has_positive]
    # mixed trees accepting the EMPTY mask ('apple OR NOT banana'):
    # docs matching no leaf at all are accepted through the NOT branch
    # with constant score 0.0 (no scoring clause matched) — round-3
    # only handled accept_empty on plans with no positive leaf,
    # silently dropping the no-term docs (ADVICE r3 medium)
    empty_ok = [p for p in scored_plans if p.accept_empty]

    docs_cache: list[DataFrame] = []

    def _docs() -> DataFrame:
        if not docs_cache:
            docs_cache.append(catalog.read_docs(spark, index_dir))
        return docs_cache[0]

    # constant-score candidate stream (ES filter-context semantics:
    # score 1.0, rank by doc order). Filter-only queries (e.g.
    # 'role:en' — the reference's primary documented usage,
    # docs/usage.md:94-103) compile to ONE forward-table pass: the
    # per-query predicates evaluate as one projected array + explode,
    # so scan count and Catalyst plan size stay O(1) in the number of
    # filter-only queries (round-3 built one sub-plan + union per
    # query — linear plan cost, VERDICT r3 item 7)
    # predicate-array legs are CHUNKED: Catalyst's expression
    # optimizer is superlinear in one giant CASE array (measured 19 s
    # plan-compile for a single 200-branch array at 100 queries), so
    # each leg carries <= _FILTER_LEG predicates — plan legs grow
    # n/_FILTER_LEG while each stays cheap to optimize, and every leg
    # is still ONE forward-table pass for its whole query group
    def _const_legs(items):
        legs = None
        for lo in range(0, len(items), _FILTER_LEG):
            group = items[lo:lo + _FILTER_LEG]
            arr = F.array(*[
                F.when(cond, F.lit(int(qid)).cast("int"))
                for qid, cond in group])
            leg = (_docs().select("doc_ord",
                                  F.explode(arr).alias("query_id"))
                   .where(F.col("query_id").isNotNull())
                   .select("query_id", "doc_ord"))
            legs = leg if legs is None else legs.unionByName(leg)
        return legs

    const_rows = None
    if fonly:
        const_rows = _const_legs(
            [(p.qid, filter_condition(p.filters, p.neg_filters))
             for p in fonly])

    # lean shape: no phrase leaves and no consumer of the mask column
    # (plain disjunctions with trivially-true acceptance — the common
    # bulk-scoring batch). _scored_rows then skips the mask machinery
    # end to end.
    lean = (not bool(qp["is_phrase"].any()) if not qp.empty else False) \
        and not negonly and not empty_ok \
        and all(p.accept is None or p.accept_trivial for p in scored_plans)
    # single-leaf unfiltered queries are eligible for the kernel's
    # exact per-partition top-k pre-reduction (see decode_score)
    single_leaf_k = {
        int(p.qid): int(p.k) for p in scored_plans
        if len(p.leaves) == 1 and p.leaves[0]["kind"] == "term"
        and len(p.leaves[0]["terms"]) == 1
        and not p.filters and not p.neg_filters} if lean else None
    if qp.empty:
        scored = spark.createDataFrame(
            [], "query_id int, doc_ord bigint, score double, mask bigint")
        persisted = None
    else:
        scored = _scored_rows(spark, index_dir, qp, cfg, n_docs, avgdl,
                              lean=lean, single_leaf_k=single_leaf_k)
        persisted = None
        if negonly or empty_ok:
            # `scored` is referenced a second time below (posting masks
            # for negated candidates / the matched-doc anti-join);
            # persist so the decode pipeline runs once, not per branch
            scored = persisted = scored.persist()

    # pure-negative text + structured filter ('role:user AND NOT spam',
    # ADVICE r2 high): docs matching NO leaf never enter `scored` (no
    # posting rows), so candidates come from the forward table; the
    # posting-derived mask then removes docs the boolean tree rejects
    # (anti-join on the negated terms' postings). Constant score 1.0
    # (ES filter-context), rank by doc order — the filter-only
    # semantics extended by the negation.
    for p in negonly:
        cand = (_docs().where(filter_condition(p.filters, p.neg_filters))
                .select("doc_ord"))
        if p.accept is not None:
            pm = scored.where(F.col("query_id") == F.lit(int(p.qid)))
            if p.accept_empty:
                bad = pm.where(~p.accept(F.col("mask"))).select("doc_ord")
                cand = cand.join(bad, "doc_ord", "left_anti")
            else:
                ok = pm.where(p.accept(F.col("mask"))).select("doc_ord")
                cand = cand.join(ok, "doc_ord", "left_semi")
        part = cand.select(
            F.lit(int(p.qid)).cast("int").alias("query_id"), "doc_ord")
        const_rows = part if const_rows is None else const_rows.unionByName(part)
    if negonly:
        scored = scored.where(~F.col("query_id").isin(list(neg_qids)))

    # empty-mask candidates for mixed accept_empty trees: forward-table
    # docs (under the query's structured filter) with NO posting row
    # for this query, constant score 0.0, mask 0 — the boolean
    # acceptance below admits them because accept(0) == accept_empty
    for p in empty_ok:
        cand = (_docs().where(filter_condition(p.filters, p.neg_filters))
                .select("doc_ord"))
        matched = (scored.where(F.col("query_id") == F.lit(int(p.qid)))
                   .select("doc_ord"))
        extra = (cand.join(matched, "doc_ord", "left_anti")
                 .select(F.lit(int(p.qid)).cast("int").alias("query_id"),
                         "doc_ord",
                         F.lit(0.0).alias("score"),
                         F.lit(0).cast("bigint").alias("mask")))
        scored = scored.unionByName(extra)

    # boolean acceptance: the per-query tree over the matched bitmask,
    # compiled to one Catalyst predicate for the whole batch.
    # Trivially-true accepts (implicit-OR mask != 0) skip the mask
    # evaluation — their rows pass through the isin-negation leg, NOT
    # by omission from the per-query OR (omission would drop them) —
    # and in the all-trivial lean shape there is no mask column at all.
    if not lean:
        nontrivial = [p for p in scored_plans
                      if p.accept is not None and not p.accept_trivial]
        if nontrivial:
            conds = None
            for p in nontrivial:
                cond = (F.col("query_id") == p.qid) & p.accept(F.col("mask"))
                conds = cond if conds is None else (conds | cond)
            passthru = ~F.col("query_id").isin(
                [int(p.qid) for p in nontrivial])
            scored = scored.where(passthru | conds)
        scored = scored.drop("mask")

    qfilters = {p.qid: (p.filters, p.neg_filters) for p in scored_plans
                if p.filters or p.neg_filters}
    if qfilters:
        # structured query_string predicates (F1): restrict candidates
        # via the forward table — Catalyst pushes the predicates to the
        # parquet scan; BM25 stats stay index-wide (ES semantics). ONE
        # forward-table pass for the whole batch (predicate array +
        # explode), like the filter-only stream — a per-query
        # scan+union grew the plan and the scan count linearly in the
        # number of filtered queries (VERDICT r3 item 7)
        docs_df = _docs()
        missing = {c for fl, nfl in qfilters.values()
                   for c in qs_filter_columns(fl, nfl)
                   if c not in docs_df.columns}
        if missing:
            raise ValueError(
                f"query_string filter fields not in index forward table: {missing}")
        allowed = None
        items = [(qid, filter_condition(fl, nfl))
                 for qid, (fl, nfl) in qfilters.items()]
        for lo in range(0, len(items), _FILTER_LEG):
            group = items[lo:lo + _FILTER_LEG]
            qarr = F.array(*[
                F.when(cond, F.lit(int(qid)).cast("int"))
                for qid, cond in group])
            leg = (docs_df.select("doc_ord",
                                  F.explode(qarr).alias("query_id"))
                   .where(F.col("query_id").isNotNull())
                   .select("query_id", "doc_ord"))
            allowed = leg if allowed is None else allowed.unionByName(leg)
        f_ids = [int(q) for q in qfilters]
        scored = scored.where(~F.col("query_id").isin(f_ids)).unionByName(
            scored.where(F.col("query_id").isin(f_ids))
            .join(allowed, ["query_id", "doc_ord"], "left_semi")
        )

    # per-partition partial top-k before the per-query shuffle: the
    # final merge only sees <= k rows per (query, partition).
    kmax = max(p.k for p in plans)

    def partial_topk(batches):
        # one numpy pass per partition (round 5 ran a pandas
        # groupby+concat+sort PER BATCH — interpreter-bound at the
        # 36M-row sf1 rollup): buffer the narrow columns, one lexsort
        # (query asc, score desc, doc asc — a total order: (query,
        # doc) pairs are unique per partition after the rollup), keep
        # group-rank < kmax. Exact, like the sort it replaces.
        import pyarrow as pa

        qs, ds, ss = [], [], []
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ni = {n: i for i, n in enumerate(rb.schema.names)}
            qs.append(rb.column(ni["query_id"]).to_numpy(zero_copy_only=False))
            ds.append(rb.column(ni["doc_ord"]).to_numpy(zero_copy_only=False))
            ss.append(rb.column(ni["score"]).to_numpy(zero_copy_only=False))
        if not qs:
            return
        q = np.concatenate(qs)
        d = np.concatenate(ds)
        s = np.concatenate(ss)
        order = np.lexsort((d, -s, q))
        q, d, s = q[order], d[order], s[order]
        starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
        rank = (np.arange(q.size, dtype=np.int64)
                - np.repeat(starts, np.diff(np.r_[starts, q.size])))
        keep = rank < kmax
        yield pa.RecordBatch.from_arrays(
            [pa.array(q[keep].astype(np.int32), type=pa.int32()),
             pa.array(d[keep], type=pa.int64()),
             pa.array(s[keep], type=pa.float64())],
            names=["query_id", "doc_ord", "score"])

    reduced = scored.mapInArrow(
        partial_topk, schema="query_id int, doc_ord bigint, score double")

    # the constant-score stream (filter-only + pure-negative queries)
    # reduces through a JVM window of its own, NOT the Arrow partial
    # top-k: every row scores 1.0 so the ranking is doc_ord asc, and a
    # match-all filter over a large corpus emits millions of candidate
    # rows per query — narrow JVM shuffle+sort handles that ~10x
    # faster than shipping the rows through pandas (measured 23s ->
    # 2.5s for a 100-query filter-only batch at 960k docs)
    if const_rows is not None:
        wq = Window.partitionBy("query_id").orderBy("doc_ord")
        const_reduced = (
            const_rows.withColumn("rn", F.row_number().over(wq))
            .where(F.col("rn") <= F.lit(kmax))
            .select("query_id", "doc_ord", F.lit(1.0).alias("score")))
        reduced = reduced.unionByName(const_reduced)

    # final exact top-k merge over the reduced stream (<= kmax rows per
    # (query, partition) — thousands of rows, not millions). With no
    # constant-score stream the merge runs on the DRIVER in one numpy
    # pass instead of a per-query window: one whole Spark
    # shuffle+sort stage disappears from the common path, and the
    # collect moves the same <= q×k×P narrow rows the window's input
    # exchange already moved. The constant-score branch keeps the JVM
    # window (its pre-window row counts are unbounded).
    kbyq = {int(p.qid): int(p.k) for p in plans}
    if const_rows is None:
        pdf = reduced.toPandas()
        if len(pdf):
            q = pdf["query_id"].to_numpy()
            d = pdf["doc_ord"].to_numpy()
            s = pdf["score"].to_numpy()
            order = np.lexsort((d, -s, q))
            q, d, s = q[order], d[order], s[order]
            starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
            rank = (np.arange(q.size, dtype=np.int64)
                    - np.repeat(starts, np.diff(np.r_[starts, q.size])) + 1)
            kvec = np.asarray([kbyq.get(int(x), kmax) for x in q],
                              dtype=np.int64)
            keep = rank <= kvec
            topk_pdf = pd.DataFrame({
                "query_id": q[keep], "doc_ord": d[keep],
                "score": s[keep], "rank": rank[keep].astype(np.int32)})
        else:
            topk_pdf = pdf.assign(rank=pd.Series(dtype="int32"))
    else:
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_ord"))
        topk = (
            reduced.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= F.lit(kmax))
        )
        # per-query k (may differ): join and refilter
        kq = spark.createDataFrame(
            pd.DataFrame({"query_id": [p.qid for p in plans],
                          "k": [p.k for p in plans]}),
            schema="query_id int, k int")
        topk = topk.join(F.broadcast(kq), "query_id").where(
            F.col("rank") <= F.col("k")).drop("k")

        # resolve doc_ord -> (conv_id, turn_idx): collect the tiny
        # top-k once (<= k per query) so the expensive
        # decode/score/topk pipeline runs exactly ONE action, then
        # push the key set down to the forward-table scan (analog of
        # ES point GET by id+routing, es_translator.py:216-227).
        topk_pdf = topk.toPandas()
    if persisted is not None:
        persisted.unpersist()
    if topk_pdf.empty:
        return empty
    ords = sorted(topk_pdf["doc_ord"].unique().tolist())
    # doc_block partition pruning + doc_ord rowgroup pushdown: the
    # resolve touches only the partition dirs holding the top-k ords
    blocks = sorted({o // cfg.doc_block_size for o in ords})
    docs = (
        catalog.read_docs(spark, index_dir)
        .where(F.col("doc_block").isin(blocks))
        .where(F.col("doc_ord").isin(ords))
        .select("doc_ord", "conv_id", "turn_idx")
    )
    topk_df = spark.createDataFrame(
        topk_pdf[["query_id", "doc_ord", "score", "rank"]],
        schema="query_id int, doc_ord bigint, score double, rank int")
    out = (
        docs.join(F.broadcast(topk_df), "doc_ord")
        .select("query_id", "rank", "conv_id", F.col("turn_idx").cast("int").alias("turn_idx"), "score")
    )
    return out.orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Interactive driver path: Block-Max WAND
# ---------------------------------------------------------------------------


def _gather_ranges(data: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray) -> np.ndarray:
    """Concatenate data[starts[i]:starts[i]+lens[i]] for all i into one
    uint8 array — a single vectorized gather (no per-range Python)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    out_off = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    idx = (np.arange(total, dtype=np.int64)
           + np.repeat(starts - out_off[:-1], lens))
    return data[idx]


def _binary_child(arr) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64, data uint8) of a pyarrow BinaryArray,
    slice-offset aware."""
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + 1,
                        offset=arr.offset * 4).astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    return off, data


def _term_streams_from_arrow(tb, inflate: float) -> dict[str, list]:
    """Per-term block metadata + concatenated varint streams straight
    from a (term, n_docs, blocks) Arrow table — the no-Python-objects
    twin of the row-dict path (blocks ordered by first_doc; same
    min(1.0, max_impact*inflate) float semantics). Returns
    {term: [n_docs_sum, firsts, max, ns, {stream: (u8, lens)}]}."""
    import pyarrow as pa

    terms = tb.column("term").to_pylist()
    n_docs = tb.column("n_docs").to_pylist()
    blocks = tb.column("blocks")
    if isinstance(blocks, pa.ChunkedArray):
        blocks = (blocks.combine_chunks() if blocks.num_chunks != 1
                  else blocks.chunk(0))
    loff = np.frombuffer(blocks.buffers()[1], dtype=np.int32,
                         count=len(blocks) + 1,
                         offset=blocks.offset * 4).astype(np.int64)
    # flatten() returns the values trimmed to the logical slice, so
    # rebase the list offsets to it (slice-offset safe)
    vals = blocks.flatten()
    loff = loff - loff[0]
    fd = vals.field("first_doc").to_numpy(zero_copy_only=False)
    nn = vals.field("n").to_numpy(zero_copy_only=False)
    mi = vals.field("max_impact").to_numpy(zero_copy_only=False)
    stream_names = ["gaps", "tfs", "dls"]
    if "pos" in (f.name for f in vals.type):
        stream_names.append("pos")
    childs = {nm: _binary_child(vals.field(nm)) for nm in stream_names}
    rows_by_term: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        rows_by_term.setdefault(t, []).append(i)
    out: dict[str, list] = {}
    for t, rows in rows_by_term.items():
        idx = np.concatenate([np.arange(loff[i], loff[i + 1])
                              for i in rows])
        order = np.argsort(fd[idx], kind="stable")
        sidx = idx[order]
        maxi = mi[sidx]
        if inflate != 1.0:
            maxi = np.minimum(1.0, maxi * inflate)
        streams = {}
        for nm, (coff, cdata) in childs.items():
            lens = coff[sidx + 1] - coff[sidx]
            streams[nm] = (_gather_ranges(cdata, coff[sidx], lens), lens)
        out[t] = [sum(int(n_docs[i]) for i in rows),
                  fd[sidx], maxi, nn[sidx], streams]
    return out


def _merge_term_streams(parts: list[list]) -> "_TermPostings":
    """Merge one term's per-generation stream bundles (each internally
    first_doc-ordered) into a single _TermPostings."""
    if len(parts) == 1:
        _nd, firsts, maxi, ns, streams = parts[0]
        return _TermPostings.from_streams(
            firsts, maxi, ns, streams["gaps"][0], streams["tfs"][0],
            streams["dls"][0],
            pos=streams["pos"][0] if "pos" in streams else None)
    firsts = np.concatenate([p[1] for p in parts])
    maxi = np.concatenate([p[2] for p in parts])
    ns = np.concatenate([p[3] for p in parts])
    order = np.argsort(firsts, kind="stable")
    merged = {}
    for nm in parts[0][4]:
        data = np.concatenate([p[4][nm][0] for p in parts])
        lens = np.concatenate([p[4][nm][1] for p in parts])
        starts = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        merged[nm] = _gather_ranges(data, starts[:-1][order], lens[order])
    return _TermPostings.from_streams(
        firsts[order], maxi[order], ns[order], merged["gaps"],
        merged["tfs"], merged["dls"], pos=merged.get("pos"))


_INF_DOC = 2 ** 62
# max structured-filter predicates per one-pass explode leg (see the
# chunking comment in search_batch)
_FILTER_LEG = 16


class _TermPostings:
    """One term's postings, fully decoded into flat read-only arrays —
    the unit of the Searcher's posting cache, so decode happens once
    per TERM, not once per query.

    Block i covers doc_ords in [first_doc[i], first_doc[i+1]) — blocks
    are doc-range ordered because salt buckets are range-disjoint and
    blocks are emitted in doc order inside each salt run.

    Decode is EAGER and batched: all blocks' gaps/tfs/dls streams are
    concatenated and varint-decoded in ONE vectorized pass. Round-3
    decoded lazily per block, but at 128-doc granularity the per-call
    numpy overhead dominated (~100µs/block ≈ 1.3M postings/s) and
    became THE interactive latency once scoring was vectorized; one
    batched pass decodes the same postings ~50× faster, and caching
    the decoded arrays removes even that from warm queries. tfs/dls
    are stored float64 so scoring never pays a per-query astype copy.
    Per-block max_impact/first_doc metadata is kept for the BMW bound
    math."""

    __slots__ = ("firsts", "max_impacts", "firsts_np", "max_np",
                 "starts", "all_docs", "all_tfs", "all_dls", "total", "n",
                 "pos_blobs", "pos_bytes", "pos_flat", "pos_occ",
                 "unit", "unit_key")

    def __init__(self, blocks: list):
        self.unit = None
        self.unit_key = None
        blocks = sorted(blocks, key=lambda blk: blk["first_doc"] if isinstance(blk, dict) else blk.first_doc)
        get = ((lambda blk, k: blk[k]) if (blocks and isinstance(blocks[0], dict))
               else (lambda blk, k: getattr(blk, k)))
        # raw positions blobs (varint, ~1-2 B/occurrence) kept per
        # block when the index stores positions: the interactive
        # phrase path decodes ONLY the blocks its candidate docs live
        # in lazily (decode_positions_full). Kept compressed until a
        # phrase query touches the term — decoded positions would
        # several-fold the cache footprint for queries that never
        # verify a phrase (once decoded they persist and are charged
        # to the Searcher's budget via _charge_positions).
        self.pos_blobs = None
        self.pos_bytes = 0
        self.pos_flat = None
        self.pos_occ = None
        if blocks:
            try:
                first_pos = get(blocks[0], "pos")
            except (KeyError, AttributeError):
                first_pos = None
            if first_pos is not None:
                self.pos_blobs = [get(blk, "pos") for blk in blocks]
                self.pos_bytes = sum(len(b) for b in self.pos_blobs)
        self.firsts_np = np.asarray(
            [get(blk, "first_doc") for blk in blocks], dtype=np.int64)
        self.max_np = np.asarray(
            [float(get(blk, "max_impact")) for blk in blocks],
            dtype=np.float64)
        ns = np.array([get(blk, "n") for blk in blocks], dtype=np.int64)
        self._finish(ns,
                     b"".join(get(blk, "gaps") for blk in blocks),
                     b"".join(get(blk, "tfs") for blk in blocks),
                     b"".join(get(blk, "dls") for blk in blocks))

    @classmethod
    def from_streams(cls, firsts_np: np.ndarray, max_np: np.ndarray,
                     ns: np.ndarray, gaps, tfs, dls,
                     pos=None) -> "_TermPostings":
        """Construct from pre-gathered per-block metadata arrays plus
        CONCATENATED byte streams in first_doc block order — the
        zero-Python-object path the local pyarrow fetch uses (no
        per-block dicts/bytes; the streams are single gathers over the
        Arrow child buffers). Semantically identical to __init__ over
        the equivalent block dicts."""
        self = cls.__new__(cls)
        self.unit = None
        self.unit_key = None
        self.pos_blobs = None
        self.pos_bytes = 0
        self.pos_flat = None
        self.pos_occ = None
        if pos is not None:
            # one pre-concatenated blob behaves exactly like the
            # per-block list (decode_positions_full joins them anyway)
            blob = pos if isinstance(pos, bytes) else pos.tobytes()
            self.pos_blobs = [blob]
            self.pos_bytes = len(blob)
        self.firsts_np = np.asarray(firsts_np, dtype=np.int64)
        self.max_np = np.asarray(max_np, dtype=np.float64)
        self._finish(np.asarray(ns, dtype=np.int64), gaps, tfs, dls)
        return self

    def _finish(self, ns: np.ndarray, gaps, tfs, dls) -> None:
        self.firsts = self.firsts_np.tolist()
        self.max_impacts = self.max_np.tolist()
        self.n = self.firsts_np.size
        total = int(ns.sum()) if self.n else 0
        starts = np.zeros(self.n + 1, dtype=np.int64)
        if self.n:
            np.cumsum(ns, out=starts[1:])
        self.starts = starts
        self.total = total
        from sparkbm25.codec import varint_decode

        gaps = varint_decode(gaps, dtype=np.int64)
        self.all_tfs = varint_decode(tfs, dtype=np.float64)
        self.all_dls = varint_decode(dls, dtype=np.float64)
        # grouped cumsum with a reset at every block start: gfull holds
        # the absolute first_doc at starts and the gaps elsewhere, so
        # docs = cumsum(gfull) rebased per block
        gfull = np.empty(total, dtype=np.int64)
        bs = starts[:-1]
        if total:
            mask = np.ones(total, dtype=bool)
            mask[bs] = False
            gfull[mask] = gaps
            gfull[bs] = self.firsts_np
            cs = np.cumsum(gfull)
            base = (cs[bs] - gfull[bs]).astype(np.int64)
            self.all_docs = cs - np.repeat(base, ns)
        else:
            self.all_docs = np.empty(0, dtype=np.int64)

    def decode_positions_full(self) -> tuple[np.ndarray, np.ndarray]:
        """Decode the term's ENTIRE positions stream once and cache it
        on the object: (flat absolute positions int64, occ_offsets
        int64 len total+1 — posting i owns flat[occ[i]:occ[i+1]]).

        Per-block pos blobs concatenate into one valid varint stream
        (varints are self-delimiting and every blob starts at a
        posting boundary, whose first value is absolute), so this is
        ONE vectorized decode pass — the same shape as the eager
        gaps/tfs/dls decode in __init__, and ~50× cheaper than the
        per-block positions_of loop it replaced at stopword-phrase
        candidate counts. The decoded arrays stay on the object so a
        warm phrase query touches no varints at all; the Searcher
        charges the growth against its posting-cache budget
        (_charge_positions)."""
        if self.pos_flat is None:
            from sparkbm25.codec import varint_decode

            tfs = self.all_tfs.astype(np.int64)
            occ = np.zeros(self.total + 1, dtype=np.int64)
            np.cumsum(tfs, out=occ[1:])
            deltas = varint_decode(b"".join(self.pos_blobs)).astype(np.int64)
            if deltas.size:
                cs = np.cumsum(deltas)
                starts = occ[:-1]
                base = (cs[starts] - deltas[starts]).astype(np.int64)
                self.pos_flat = cs - np.repeat(base, tfs)
            else:
                self.pos_flat = deltas
            self.pos_occ = occ
        return self.pos_flat, self.pos_occ

    def positions_csr(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Absolute token positions of the postings at flat indices
        `idx`, as a CSR pair (flat, offs len(idx)+1): posting idx[j]'s
        positions are flat[offs[j]:offs[j+1]]. One vectorized gather
        from the cached full decode — no per-posting Python."""
        flat_all, occ_all = self.decode_positions_full()
        lens = self.all_tfs[idx].astype(np.int64)
        offs = np.zeros(idx.size + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        total = int(offs[-1])
        gather = (np.repeat(occ_all[idx] - offs[:-1], lens)
                  + np.arange(total, dtype=np.int64))
        return flat_all[gather], offs


    def unit_scores(self, k1: float, b: float, avgdl: float) -> np.ndarray:
        """The query-INDEPENDENT per-posting factor tf/(tf + k1*(1-b+
        b*dl/avgdl)) — every driver algorithm's score contribution is
        weight × this, so it computes ONCE per cached term instead of
        once per query (profiled round 5: the per-query vector math was
        ~60%% of warm filtered latency on a hot term). +8 B/posting on
        the cache footprint. k1/b are fixed per index config and avgdl
        per generation set; refresh() drops the cache, so the key check
        is belt-and-braces."""
        key = (k1, b, avgdl)
        if self.unit is None or self.unit_key != key:
            # EXACTLY the codec's max_impact association (codec.py:
            # impacts = tfs/(tfs + k1*(1-b+b*(dls/avgdl)))), so every
            # driver contribution weight*unit is bounded by
            # weight*max_impact with exact float semantics — the old
            # (weight*tf)/denom form could exceed the block bound by
            # an ulp
            denom = k1 * (1.0 - b + b * (self.all_dls / avgdl))
            self.unit = self.all_tfs / (self.all_tfs + denom)
            self.unit_key = key
        return self.unit


class _Cursor:
    """Per-query cursor over a (shared, read-only) _TermPostings.

    The cursor state is a single flat position `gpos` with `cur`
    mirroring all_docs[gpos] as a plain int attribute: the BMW outer
    loop reads the current doc millions of times, and property-call
    overhead on it measurably dominated skip-heavy queries.
    """

    __slots__ = ("weight", "firsts", "max_impacts", "firsts_np", "max_np",
                 "starts", "all_docs", "all_tfs", "all_dls", "total", "n",
                 "gpos", "cur", "tp")

    def __init__(self, postings, weight: float):
        tp = postings if isinstance(postings, _TermPostings) \
            else _TermPostings(postings)
        self.tp = tp          # shared: unit_scores caches on it
        self.weight = weight  # qtf * idf * (k1+1)
        self.firsts = tp.firsts
        self.max_impacts = tp.max_impacts
        self.firsts_np = tp.firsts_np
        self.max_np = tp.max_np
        self.starts = tp.starts
        self.all_docs = tp.all_docs
        self.all_tfs = tp.all_tfs
        self.all_dls = tp.all_dls
        self.total = tp.total
        self.n = tp.n
        self.gpos = 0
        self.cur = int(self.all_docs[0]) if self.total else _INF_DOC

    @property
    def exhausted(self) -> bool:
        return self.gpos >= self.total

    @property
    def cur_doc(self) -> int:
        return self.cur

    def shallow_info(self, target: int) -> tuple[float, int]:
        """(score upper bound, exclusive range end) of the block that
        would contain `target` — a BMW 'shallow advance': block pointer
        math only. A posting with doc_ord == target, if it exists,
        lies in the block whose range [first_i, first_{i+1}) covers
        target, so that block's max_impact bounds the term's
        contribution over the whole range."""
        import bisect

        bi = bisect.bisect_right(self.firsts, target) - 1
        if bi < 0:
            bi = 0
        end = int(self.firsts[bi + 1]) if bi + 1 < self.n else _INF_DOC
        return self.weight * self.max_impacts[bi], end

    def next_geq(self, target: int) -> int:
        """Advance to the first posting with doc >= target: one
        binary search over the flat doc array."""
        if target <= self.cur:
            return self.cur
        g = self.gpos
        g += int(np.searchsorted(self.all_docs[g:], target, side="left"))
        self.gpos = g
        self.cur = int(self.all_docs[g]) if g < self.total else _INF_DOC
        return self.cur

    def advance(self) -> None:
        g = self.gpos + 1
        self.gpos = g
        self.cur = int(self.all_docs[g]) if g < self.total else _INF_DOC

    def score_current(self, k1: float, b: float, avgdl: float) -> float:
        # weight × the cached query-independent unit factor: identical
        # association to every other driver site so exact ties stay
        # exact across path choices
        return self.weight * float(
            self.tp.unit_scores(k1, b, avgdl)[self.gpos])


class Searcher:
    """Interactive single-query search over driver-side flat posting
    arrays: chunked vectorized MaxScore by default, block-max WAND as
    its verification twin (`or_algo='wand'`), vectorized intersection
    for AND mode — all lossless.

    max_driver_postings bounds the driver-side block collect: a cheap
    column-pruned df probe (term + n_docs only — parquet never reads
    the blocks column) precedes the postings fetch, and a query whose
    total postings exceed the bound routes through the distributed
    batch path instead. Round-1 would collect GBs for a stopword query
    at scale (VERDICT item 10). The default (1e7 postings ≈ 30-80 MB
    of blocks) is a MEMORY-SAFETY bound, not a speed heuristic — below
    it the driver path is usually faster than a distributed job.
    self.last_path records which path ran
    ('maxscore' | 'wand' | 'and' | 'batch') for tests/observability.
    Bounded LRU caches (decoded postings, df map, doc resolve — see
    __init__) make warm repeats run with zero Spark jobs; call
    refresh() after the index grows or compacts."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 max_driver_postings: int = 10_000_000,
                 max_cached_dict_rows: int = 2_000_000,
                 or_algo: str = "maxscore"):
        if or_algo not in ("maxscore", "wand"):
            raise ValueError(f"or_algo must be maxscore|wand, got {or_algo!r}")
        self.spark = spark
        self.index_dir = index_dir
        self.max_driver_postings = max_driver_postings
        # OR-mode driver algorithm: 'maxscore' (chunked vectorized
        # MaxScore, default — see _maxscore_or) or 'wand' (block-max
        # WAND, the block-metadata verification twin)
        self.or_algo = or_algo
        # df-probe cache policy: when the segment dictionary (term ×
        # salt × generation rows) fits under this bound, the whole
        # (term -> df) map loads into the driver ONCE and every later
        # probe is a dict lookup instead of a Spark job (~0.15-0.5s
        # saved per interactive query). A web-scale vocabulary blows
        # the bound and keeps the per-query column-pruned probe scan.
        self.max_cached_dict_rows = max_cached_dict_rows
        self._df_cache: dict[str, int] | None = None
        self._df_cache_checked = False
        # LRU decoded-postings cache keyed by term: an interactive
        # session repeats vocabulary, and the per-query fetch is the
        # latency floor once scoring is vectorized. Bounded by TOTAL
        # CACHED POSTINGS (not terms), so one hot stopword can't blow
        # the driver; 0 disables. Default = 4× the per-query collect
        # bound (~24 bytes/posting decoded ⇒ 40M ≈ 1 GB): the budget
        # must hold the working set of a repeated query MIX, not one
        # query — at the 9.6M-turn scale a 10M budget (= the r5
        # default) evicted the warm pass's first hot term between
        # passes, turning a sub-ms warm repeat into a multi-second
        # re-fetch (BENCH_r05 queries_warm q0 4.7 s).
        self.cache_postings_budget = 4 * max_driver_postings
        self._post_cache: dict[str, tuple["_TermPostings | list", int, int]] = {}
        self._post_cache_postings = 0
        # doc_ord -> (conv_id, turn_idx, {attr: value}) forward-row
        # cache (LRU, bounded entries): each search resolves <= k
        # ords, interactive sessions re-hit the same heads, and the
        # filtered driver path evaluates structured predicates over
        # these rows in PYTHON (querystring.python_filter) — a warm
        # query, filtered or not, then runs ZERO Spark jobs
        self.doc_cache_max = 200_000
        self._doc_cache: dict[int, tuple] = {}
        # forward-table DataFrame cache (filtered driver path + doc
        # resolve): created lazily, rebound by refresh()
        self._docs_df: DataFrame | None = None
        # multi-term expansion cache (prefix/fuzzy/wildcard/regexp leaf key
        # -> sorted dictionary expansions): interactive sessions
        # repeat patterns, and the banded dictionary job is the only
        # Spark work a warm wildcard query would otherwise pay.
        # Budgeted by TOTAL cached expansion terms; refresh() clears.
        self.exp_cache_budget = 100_000
        self._exp_cache: dict[str, list[str]] = {}
        self._exp_cache_terms = 0
        # exhaustive-dense OR floor: below this many summed postings
        # MaxScore's pruning (or just its tiny input) is already
        # sub-millisecond and the dense scatter's O(n_docs) allocation
        # isn't worth dispatching; above it, hot multi-cursor unions
        # (expanded leaves, stopword ORs) score faster exhaustively
        # (see the dense branch in search()). Exposed as an attribute
        # so parity tests can force the path on small fixtures.
        self.dense_min_postings = 1 << 17
        self.last_path: str | None = None
        self.n_docs, self.avgdl, self.cfg, self.gens = _load_stats(index_dir)
        self._bind_generations()

    def _bind_generations(self) -> None:
        """Bind the per-generation readers for the CURRENT self.gens.

        Local index roots get direct pyarrow readers for the driver's
        point reads (postings fetch / df probe / doc resolve) — no
        Spark job per cold query (localio module docstring has the
        measurements); non-local roots leave them None and every
        caller falls back to the Spark path. The per-generation
        segment DataFrames are created LAZILY (first _gen_union):
        repeated queries reuse the resolved file index + parquet
        footers instead of re-listing the segment tree per search,
        and a Searcher whose queries are all served locally never
        pays the Spark-side listing at all. A Searcher is bound to
        the generation set it saw at construction — after
        update_index / compact_generations on the same root, call
        refresh() (or build a new Searcher); compaction DELETES the
        superseded generation dirs, so a stale snapshot would fail.
        (an empty-corpus index has no readable segment schema; its
        searches return empty before ever touching segments)"""
        self._seg_dfs_cache: list[DataFrame] | None = None
        self._local_segs = None
        self._local_docs = None
        if self.n_docs > 0:
            seg_roots = [localio.local_path(catalog.segments_dir(g["dir"]))
                         for g in self.gens]
            doc_roots = [localio.local_path(catalog.docs_dir(g["dir"]))
                         for g in self.gens]
            if all(r is not None for r in seg_roots + doc_roots):
                self._local_segs = [
                    localio.LocalParquetIndex(r, "term_bucket")
                    for r in seg_roots]
                self._local_docs = [
                    localio.LocalParquetIndex(r, "doc_block")
                    for r in doc_roots]

    @property
    def _seg_dfs(self) -> list[DataFrame]:
        if self._seg_dfs_cache is None:
            self._seg_dfs_cache = [
                self.spark.read.parquet(catalog.segments_dir(gen["dir"]))
                for gen in self.gens
            ] if self.n_docs > 0 else []
        return self._seg_dfs_cache

    def refresh(self) -> "Searcher":
        """Re-bind to the index's current generation set (after an
        append or in-place compaction). Returns self."""
        self._df_cache = None
        self._df_cache_checked = False
        self._post_cache.clear()
        self._post_cache_postings = 0
        self._doc_cache.clear()
        self._docs_df = None
        self._exp_cache.clear()
        self._exp_cache_terms = 0
        self.n_docs, self.avgdl, self.cfg, self.gens = _load_stats(self.index_dir)
        self._bind_generations()
        return self

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """df per term from the term dictionary table (analytics path;
        the hot search path derives df from segment rows instead).
        Sums across generations for an incrementally-built index;
        falls back to the pruned segment probe when a generation was
        built with build_terms_dict=False."""
        out: dict[str, int] = {}
        for gen in self.gens:
            td = catalog.terms_dir(gen["dir"])
            if not os.path.isdir(td):
                return self._probe_dfs(sorted(terms))
            tdf = (
                self.spark.read.parquet(td)
                .where(F.col("term").isin(terms)).toPandas()
            )
            for t, df_ in zip(tdf["term"], tdf["df"].astype(int)):
                out[t] = out.get(t, 0) + int(df_)
        return out

    def _via_batch(self, query_text: str, k: int, mode: str) -> pd.DataFrame:
        """Route one interactive query through the distributed batch
        path (structured filters need the forward table; hot terms
        would blow the driver collect bound)."""
        self.last_path = "batch"
        q = pd.DataFrame({"query_id": [0], "query_text": [query_text],
                          "k": [k]})
        out = search_batch(self.spark, self.index_dir, q, k=k,
                           mode=mode).toPandas()
        return out[["rank", "conv_id", "turn_idx", "score"]].reset_index(drop=True)

    def _gen_union(self, terms: list[str], cols: list) -> "DataFrame":
        """Pruned segment rows of ALL generations as ONE DataFrame
        (each generation is its own parquet root, so per-gen reads
        union with a literal generation index). One Spark job instead
        of one per generation (round-2 paid 2×G jobs per interactive
        query, VERDICT item 5)."""
        buckets = sorted({self.cfg.term_bucket_of(t) for t in terms})
        out = None
        for gi, seg_df in enumerate(self._seg_dfs):
            part = (
                seg_df
                .where(F.col("term_bucket").isin(buckets))
                .where(F.col("term").isin(terms))
                .select(F.lit(gi).alias("_g"), *cols)
            )
            out = part if out is None else out.unionByName(part)
        return out

    def _probe_dfs(self, terms: list[str]) -> dict[str, int]:
        """df per query term from a column-pruned segment scan: only
        (term, n_docs) are read — parquet column pruning means the
        blocks bytes never move — so the probe is O(segment rows of
        the query's buckets), not O(postings). The per-salt rows sum
        on the driver (terms × salts × generations rows, tens): a
        groupBy here would add a full shuffle-partition exchange just
        to add a handful of ints (round-3 paid ~0.2s/query for it).

        When the whole dictionary fits max_cached_dict_rows it loads
        once and later probes are dict lookups (no Spark job)."""
        if not self._df_cache_checked:
            self._df_cache_checked = True
            if self._local_segs is not None:
                # local fast path: footer-only row count, then ONE
                # column-pruned read aggregated in Arrow C++ — no
                # Spark job at all (localio module docstring)
                n_rows = sum(ix.count_rows() for ix in self._local_segs)
                if n_rows <= self.max_cached_dict_rows:
                    cache = {}
                    for ix in self._local_segs:
                        tb = ix.read(None, ["term", "n_docs"])
                        if tb is None:
                            continue
                        agg = tb.group_by("term").aggregate(
                            [("n_docs", "sum")])
                        for t, nd in zip(agg.column("term").to_pylist(),
                                         agg.column("n_docs_sum").to_pylist()):
                            cache[t] = cache.get(t, 0) + int(nd)
                    self._df_cache = cache
            else:
                # parquet count() is metadata-only — one cheap job, once
                n_rows = sum(df.count() for df in self._seg_dfs)
                if self._seg_dfs and n_rows <= self.max_cached_dict_rows:
                    cache: dict[str, int] = {}
                    rows = None
                    for df in self._seg_dfs:
                        part = df.select("term", "n_docs")
                        rows = part if rows is None else rows.unionByName(part)
                    for r in rows.collect():
                        cache[r["term"]] = cache.get(r["term"], 0) + int(r["n_docs"])
                    self._df_cache = cache
        if self._df_cache is not None:
            return {t: self._df_cache[t] for t in terms if t in self._df_cache}
        dfs: dict[str, int] = {}
        if self._local_segs is not None:
            import pyarrow.compute as pc

            buckets = sorted({self.cfg.term_bucket_of(t) for t in terms})
            filt = pc.field("term").isin(list(terms))
            for ix in self._local_segs:
                tb = ix.read(buckets, ["term", "n_docs"], filter=filt)
                if tb is None:
                    continue
                for t, nd in zip(tb.column("term").to_pylist(),
                                 tb.column("n_docs").to_pylist()):
                    dfs[t] = dfs.get(t, 0) + int(nd)
            return dfs
        for r in self._gen_union(terms, ["term", "n_docs"]).collect():
            dfs[r["term"]] = dfs.get(r["term"], 0) + int(r["n_docs"])
        return dfs

    def _fetch_postings(self, terms: list[str]) -> tuple[dict[str, "_TermPostings"], dict[str, int]]:
        """ONE partition-pruned, predicate-pushed scan (across all
        generations) returns the DECODED posting arrays and df per
        term (sum of per-salt n_docs). Routing is the client-side
        term-bucket hash — the analog of ES routing a query to the
        right shard — so no dictionary round-trip precedes the
        postings fetch.

        Warm terms serve from the LRU posting cache (bounded by
        cache_postings_budget TOTAL postings) — a query whose vocab
        was seen recently skips the Spark job entirely."""
        cached: dict[str, list] = {}
        cached_dfs: dict[str, int] = {}
        missing = []
        for t in terms:
            hit = self._post_cache.get(t)
            if hit is not None:
                # refresh LRU recency; known-absent terms (negative
                # cache, df 0) stay omitted from the result like the
                # scan omits them
                self._post_cache.pop(t)
                self._post_cache[t] = hit
                if hit[1] > 0:
                    cached[t], cached_dfs[t] = hit[0], hit[1]
            else:
                missing.append(t)
        if not missing:
            return cached, cached_dfs
        post, dfs = self._fetch_postings_scan(missing)
        # insert misses; evict least-recently-used first (plain dict
        # preserves insertion order and hits re-insert above). Terms
        # the scan proved ABSENT are cached as empty at zero budget
        # cost, so repeated misses never rescan. Cache entries are
        # (postings, df, cost): cost = postings + retained raw
        # position bytes in posting-equivalents (~24 B of decoded
        # arrays per posting), so positions-bearing indexes charge
        # their pos blobs against the same budget.
        for t in missing:
            n = dfs.get(t, 0)
            if n == 0:
                if self.cache_postings_budget > 0:
                    self._post_cache[t] = ([], 0, 0)
                continue
            cost = n + getattr(post[t], "pos_bytes", 0) // 24
            if cost > self.cache_postings_budget:
                continue
            while (self._post_cache_postings + cost > self.cache_postings_budget
                   and self._post_cache):
                old_t = next(iter(self._post_cache))
                old = self._post_cache.pop(old_t)
                self._post_cache_postings -= old[2]
            self._post_cache[t] = (post[t], n, cost)
            self._post_cache_postings += cost
        cached.update(post)
        cached_dfs.update(dfs)
        return cached, cached_dfs

    def _charge_positions(self, term: str, tp: "_TermPostings") -> None:
        """Account a term's freshly-decoded positions arrays
        (decode_positions_full) against the posting-cache budget: the
        decoded int64 flat/occ arrays live as long as the cached
        _TermPostings does, so the entry's cost grows by their size in
        posting-equivalents (~24 B each) and older entries evict to
        stay under budget. The charged term itself is never evicted
        here — it is the query in flight."""
        entry = self._post_cache.get(term)
        if entry is None or tp.pos_flat is None:
            return
        extra = (tp.pos_flat.nbytes + tp.pos_occ.nbytes) // 24
        self._post_cache[term] = (entry[0], entry[1], entry[2] + extra)
        self._post_cache_postings += extra
        while (self._post_cache_postings > self.cache_postings_budget
               and len(self._post_cache) > 1):
            old_t = next(iter(self._post_cache))
            if old_t == term:
                # move-to-end so the loop can reach older entries
                self._post_cache[term] = self._post_cache.pop(term)
                continue
            old = self._post_cache.pop(old_t)
            self._post_cache_postings -= old[2]

    def _fetch_postings_scan(self, terms: list[str]) -> tuple[dict[str, list], dict[str, int]]:
        """The actual pruned fetch (cache-miss path): a direct pyarrow
        read for local index roots (same partition pruning + rowgroup
        pushdown, no Spark job — localio module docstring), the pruned
        Spark collect otherwise."""
        # block-max metadata was encoded with each generation's avgdl;
        # inflate by max(1, avgdl_global/avgdl_gen) so the stored upper
        # bound stays sound under the global stats
        inflates = []
        for gen in self.gens:
            gen_avgdl = float(gen["avgdl"]) or self.avgdl
            inflates.append(
                max(1.0, self.avgdl / gen_avgdl) if gen_avgdl else 1.0)
        post: dict[str, list] = {}
        dfs: dict[str, int] = {}
        if self._local_segs is not None:
            import pyarrow.compute as pc

            buckets = sorted({self.cfg.term_bucket_of(t) for t in terms})
            filt = pc.field("term").isin(list(terms))
            parts: dict[str, list] = {}
            for gi, ix in enumerate(self._local_segs):
                tb = ix.read(buckets, ["term", "n_docs", "blocks"],
                             filter=filt)
                if tb is None or tb.num_rows == 0:
                    continue
                for t, bundle in _term_streams_from_arrow(
                        tb, inflates[gi]).items():
                    parts.setdefault(t, []).append(bundle)
                    dfs[t] = dfs.get(t, 0) + bundle[0]
            return ({t: _merge_term_streams(p) for t, p in parts.items()},
                    dfs)
        else:
            rows = self._gen_union(terms, ["term", "n_docs", "blocks"]).collect()
            for r in rows:
                inflate = inflates[r["_g"]]
                blks = [blk.asDict() for blk in r["blocks"]]
                if inflate != 1.0:
                    for blk in blks:
                        blk["max_impact"] = min(1.0, blk["max_impact"] * inflate)
                post.setdefault(r["term"], []).extend(blks)
                dfs[r["term"]] = dfs.get(r["term"], 0) + int(r["n_docs"])
        # decode once here: the cache (and every cursor built from it)
        # shares the flat arrays — warm queries never touch varints
        return {t: _TermPostings(b) for t, b in post.items()}, dfs

    def _attr_cols(self) -> list[str]:
        """Structured-filter attribute columns present in the forward
        table (cached rows carry them for python_filter)."""
        if self._local_docs is not None:
            names = self._local_docs[0].schema_names()
            if names:
                return [c for c in ("role", "tool", "ts") if c in names]
        return [c for c in ("role", "tool", "ts")
                if c in self._forward_docs().columns]

    def _cache_doc(self, doc_ord: int, entry: tuple) -> None:
        while len(self._doc_cache) >= self.doc_cache_max:
            self._doc_cache.pop(next(iter(self._doc_cache)))
        self._doc_cache[doc_ord] = entry

    def _fetch_doc_rows(self, ords: list[int]) -> None:
        """Pull the forward rows of `ords` into the doc cache with ONE
        doc_block-pruned, doc_ord-pushed scan (the ES point-GET
        analog, batched)."""
        need = [o for o in ords if o not in self._doc_cache]
        if not need:
            return
        attrs = self._attr_cols()
        blocks = sorted({o // self.cfg.doc_block_size for o in need})
        if self._local_docs is not None:
            # local fast path: doc_block dir pruning + a doc_ord
            # rowgroup-statistics filter, straight through pyarrow (the
            # forward table is written doc_ord-contiguous, so the
            # stats are tight) — no Spark job, no isin-literal plans
            import pyarrow.compute as pc

            filt = pc.field("doc_ord").isin(need)
            cols = ["doc_ord", "conv_id", "turn_idx", *attrs]
            for ix in self._local_docs:
                tb = ix.read(blocks, cols, filter=filt)
                if tb is None or tb.num_rows == 0:
                    continue
                tb = localio.strip_tz(tb)
                for r in tb.to_pylist():
                    self._cache_doc(int(r["doc_ord"]),
                                    (r["conv_id"], int(r["turn_idx"]),
                                     {a: r[a] for a in attrs}))
            return
        base = (self._forward_docs()
                .where(F.col("doc_block").isin(blocks)))
        if len(need) <= 256:
            base = base.where(F.col("doc_ord").isin(need))
        else:
            # thousands of isin literals cost more to ship over py4j
            # and analyze than the scan itself (a late probe round
            # probes 8192 ords; profiled ~2 s/round on the ts-range
            # shape). Ship the ord set as ONE Arrow batch and
            # broadcast-hash-join instead; keep min/max bounds as a
            # pushable residual so parquet row groups still prune.
            need_arr = np.asarray(need, dtype=np.int64)
            need_df = self.spark.createDataFrame(
                pd.DataFrame({"doc_ord": need_arr}))
            base = (base
                    .where((F.col("doc_ord") >= int(need_arr.min()))
                           & (F.col("doc_ord") <= int(need_arr.max())))
                    .join(F.broadcast(need_df), "doc_ord"))
        rows = base.select("doc_ord", "conv_id", "turn_idx",
                           *attrs).collect()
        for r in rows:
            self._cache_doc(int(r["doc_ord"]),
                            (r["conv_id"], int(r["turn_idx"]),
                             {a: r[a] for a in attrs}))

    def _expand_to_weights(self, leaves) -> dict[str, float]:
        """Resolve [(kind, payload, boost)] OR-leaves into flat
        term->weight form, expanding multi-term leaves against the
        term dictionary (same banded _expand_multiterm job the batch
        path runs, ValueError on max_expansions like the batch path)
        with a bounded LRU cache — a warm wildcard/prefix query skips
        the dictionary job entirely. Under OR, each expansion scores
        independently with its leaf's boost, so weights simply sum."""
        keys = []
        for kind, payload, boost in leaves:
            if kind == "term":
                keys.append(None)
            elif kind == "prefix":
                keys.append(f"p:{payload}")
            elif kind == "fuzzy":
                keys.append(f"f:{payload[0]}~{payload[1]}")
            elif kind == "regexp":
                keys.append(f"x:{payload}")
            else:
                keys.append(f"w:{payload}")
        missing = [(leaves[i], keys[i]) for i in range(len(leaves))
                   if keys[i] is not None and keys[i] not in self._exp_cache]
        if missing:
            prefixes = sorted({lf[1] for lf, k in missing
                               if lf[0] == "prefix"})
            fuzzies = sorted({lf[1] for lf, k in missing
                              if lf[0] == "fuzzy"})
            wildcards = sorted({lf[1] for lf, k in missing
                                if lf[0] == "wildcard"})
            regexps = sorted({lf[1] for lf, k in missing
                              if lf[0] == "regexp"})
            exp = _expand_multiterm(self.spark, self.index_dir,
                                    prefixes, fuzzies, wildcards, regexps)
            for key, terms in exp.items():
                n = len(terms)
                while (self._exp_cache_terms + n > self.exp_cache_budget
                       and self._exp_cache):
                    old = next(iter(self._exp_cache))
                    self._exp_cache_terms -= len(self._exp_cache.pop(old))
                self._exp_cache[key] = terms
                self._exp_cache_terms += n
        weights: dict[str, float] = {}
        for (kind, payload, boost), key in zip(leaves, keys):
            if key is None:
                weights[payload] = weights.get(payload, 0.0) + boost
            else:
                hit = self._exp_cache.get(key)
                if hit is None:     # evicted mid-call (tiny budget)
                    hit = _expand_multiterm(
                        self.spark, self.index_dir,
                        [payload] if kind == "prefix" else [],
                        [payload] if kind == "fuzzy" else [],
                        [payload] if kind == "wildcard" else [],
                        [payload] if kind == "regexp" else [])[key]
                # LRU refresh
                elif key in self._exp_cache:
                    self._exp_cache.pop(key)
                    self._exp_cache[key] = hit
                for t in hit:
                    weights[t] = weights.get(t, 0.0) + boost
        return weights

    def _forward_docs(self) -> DataFrame:
        """The forward table as a cached DataFrame: repeated filtered
        searches reuse the resolved file index + parquet footers
        instead of re-listing the docs tree per query (same idea as
        _seg_dfs; refresh() rebinds)."""
        if self._docs_df is None:
            self._docs_df = catalog.read_docs(self.spark, self.index_dir)
        return self._docs_df

    def _score_all(self, cursors: list["_Cursor"], fmode: str, k1: float,
                   b: float, avgdl: float) -> tuple[np.ndarray, np.ndarray]:
        """FULL scoring of every accepted doc (no top-k pruning — a
        downstream filter may reject arbitrarily many heads). Bounded
        by max_driver_postings like every driver path. Contributions
        sum in the caller's fixed cursor order, so exact float ties
        land identically to the other driver algorithms.

        OR mode uses a DENSE bincount scatter over doc_ord when the
        corpus is small enough (n_docs*8B within ~8× the postings
        volume): np.unique on P concatenated postings is an O(P log P)
        sort that measurably dominated warm filtered latency at the
        9.6M-turn scale (~4 s for 15M postings); bincount is O(P + N)
        C-speed and order-insensitive (per-doc float sums stay
        deterministic because addition order per doc is the
        concatenation order either way)."""
        if fmode == "and":
            if not cursors or any(c.total == 0 for c in cursors):
                return (np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.float64))
            cs = sorted(cursors, key=lambda c: c.total)
            cand = cs[0].all_docs
            for c in cs[1:]:
                idx = np.searchsorted(c.all_docs, cand, side="left")
                idx_c = np.clip(idx, 0, c.total - 1)
                cand = cand[c.all_docs[idx_c] == cand]
                if cand.size == 0:
                    return (np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=np.float64))
            scores = np.zeros(cand.size)
            for c in cursors:
                idx = np.searchsorted(c.all_docs, cand, side="left")
                scores += c.weight * c.tp.unit_scores(k1, b, avgdl)[idx]
            return cand, scores
        parts_d = [c.all_docs for c in cursors if c.total > 0]
        if not parts_d:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        parts_s = []
        for c in cursors:
            if c.total == 0:
                continue
            # one scalar multiply over the cached unit vector — the
            # per-query BM25 vector math was the warm-filtered hot spot
            parts_s.append(c.weight * c.tp.unit_scores(k1, b, avgdl))
        return _union_sum(np.concatenate(parts_d),
                          np.concatenate(parts_s), self.n_docs)

    # score-ordered filter probing: chunk growth factor / start / caps.
    # Probes stop as soon as k survivors exist; a highly selective
    # filter (< k survivors in the first _PROBE_CAP candidates while
    # more remain) falls back to the distributed batch path rather
    # than looping forever on driver round-trips.
    _PROBE_CAP = 131072
    _PROBE_CHUNK_MAX = 8192

    def _search_filtered_driver(self, parsed, weights: dict[str, float],
                                fmode: str, k: int) -> pd.DataFrame | None:
        """`term AND role:user` without the distributed batch detour
        (VERDICT r4 item 6): fetch the terms' postings driver-side
        (bounded by max_driver_postings, same probe gate as the other
        driver paths), score EVERY candidate doc vectorized, then
        apply the structured filter by probing the forward table in
        score order — each probe is one small doc_block-pruned,
        doc_ord-pushed scan over the chunk's candidates, and the
        resolve (conv_id, turn_idx) rides along for free. Returns
        None when the driver bound or the probe budget says the
        distributed path should run instead."""
        docs_df = self._forward_docs()
        missing_f = {c for c in qs_filter_columns(parsed.filters,
                                                  parsed.neg_filters)
                     if c not in docs_df.columns}
        if missing_f:
            raise ValueError(
                f"query_string filter fields not in index forward table: "
                f"{missing_f}")
        probe_dfs = self._probe_dfs(sorted(weights))
        if sum(probe_dfs.values()) > self.max_driver_postings:
            return None
        present_probe = sorted(t for t in weights
                               if probe_dfs.get(t, 0) > 0)
        empty = pd.DataFrame(columns=["rank", "conv_id", "turn_idx", "score"])
        if not present_probe or (
                fmode == "and" and len(present_probe) < len(weights)):
            self.last_path = None
            return empty
        postings, dfs = self._fetch_postings(present_probe)
        present = sorted(t for t in weights if t in dfs)
        if not present or (fmode == "and" and len(present) < len(weights)):
            self.last_path = None
            return empty
        cfg = self.cfg
        k1, b, avgdl, N = cfg.k1, cfg.b, self.avgdl, self.n_docs
        cursors = []
        for t in present:
            idf = float(np.log(1.0 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5)))
            cursors.append(_Cursor(postings[t], weights[t] * idf * (k1 + 1.0)))
        cand, scores = self._score_all(cursors, fmode, k1, b, avgdl)
        return self._filtered_probe(parsed, cand, scores, k)

    def _filtered_probe(self, parsed, cand: np.ndarray, scores: np.ndarray,
                        k: int) -> pd.DataFrame | None:
        """Apply the structured filter to a fully-scored candidate set
        in score order (shared by the flat filtered path and the
        OR-leaves path). Returns the top-k DataFrame, or None when the
        probe budget says the distributed path should run."""
        from sparkbm25.querystring import python_filter

        empty = pd.DataFrame(columns=["rank", "conv_id", "turn_idx", "score"])
        if cand.size == 0:
            self.last_path = "filtered"
            return empty

        # exact INCREMENTAL head ordering: a full lexsort of millions
        # of candidates costs seconds at the 10M-doc scale, but the
        # filter usually accepts within the first few hundred heads.
        # ordered_head(M) returns an exact PREFIX of the global
        # (-score, doc) order: everything scoring above the M-th
        # largest score plus ALL boundary-score ties (so no
        # equal-score doc can be ordered across the boundary wrongly);
        # argpartition is O(n), the sort touches only the prefix.
        n_cand = cand.size

        def ordered_head(m: int) -> np.ndarray:
            if m >= n_cand:
                return np.lexsort((cand, -scores))
            kth = np.partition(scores, n_cand - m)[n_cand - m]
            sel = np.flatnonzero(scores >= kth)
            if sel.size >= n_cand:
                return np.lexsort((cand, -scores))
            return sel[np.lexsort((cand[sel], -scores[sel]))]

        # predicates evaluate in PYTHON over cached forward rows
        # (querystring.python_filter — documented Catalyst-parity
        # three-valued semantics): a probe chunk fetches only the
        # UNCACHED rows via one pruned scan, and a warm repeat whose
        # candidate heads are all cached runs ZERO Spark jobs
        pred = python_filter(parsed.filters, parsed.neg_filters)
        survivors: list[tuple[float, int, str, int]] = []
        pos = 0
        chunk = max(128, 4 * k)
        head = ordered_head(chunk)
        bulk_done = False
        bulk_limit = n_cand
        while pos < n_cand and len(survivors) < k:
            if pos >= self._PROBE_CAP or pos >= bulk_limit:
                return None     # filter too selective for driver probing
            if pos + chunk > head.size and head.size < n_cand:
                head = ordered_head(min(max(pos + chunk, 4 * head.size),
                                        n_cand))
            # never walk past the bulk-resolved prefix: an ord beyond
            # it is uncached-but-unresolved, not rejected
            idx = head[pos:min(pos + chunk, bulk_limit)]
            ords = [int(o) for o in cand[idx].tolist()]
            sc = scores[idx].tolist()
            pos += len(ords)
            if not bulk_done:
                self._fetch_doc_rows(ords)
            for o, s in zip(ords, sc):
                ent = self._doc_cache.get(o)
                if ent is None:
                    # absent from the forward table — or, after the
                    # bulk round, rejected by the Catalyst filter
                    continue
                row = {"conv_id": ent[0], "turn_idx": ent[1], **ent[2]}
                if pred(row):
                    survivors.append((float(s), o, ent[0], ent[1]))
                    if len(survivors) == k:
                        break
            if (not bulk_done and len(survivors) < k and pos < n_cand):
                # round 1 missed: the filter rejects the score head
                # (adversarial filter-score correlation — profiled: a
                # mid-day ts range vs hot-term scores paid one Spark
                # collect per 4x-growing round, five sequential jobs
                # at 960k docs and worse at scale). Fetch the ENTIRE
                # remaining probe budget (bounded by _PROBE_CAP, under
                # the doc-cache capacity) with ONE broadcast-join job;
                # the python predicate stays the sole filter arbiter
                # over the cached rows, and a warm repeat finds every
                # row cached and runs ZERO jobs.
                m = int(min(self._PROBE_CAP, n_cand))
                if head.size < m:
                    head = ordered_head(m)
                self._fetch_doc_rows(
                    [int(o) for o in cand[head[pos:m]].tolist()])
                bulk_done = True
                bulk_limit = m
                chunk = self._PROBE_CHUNK_MAX
            else:
                chunk = min(chunk * 4, self._PROBE_CHUNK_MAX)
        self.last_path = "filtered"
        return pd.DataFrame({
            "rank": np.arange(1, len(survivors) + 1, dtype=np.int32),
            "conv_id": [s[2] for s in survivors],
            "turn_idx": [s[3] for s in survivors],
            "score": [s[0] for s in survivors],
        })

    def _eval_phrase(self, terms: tuple, slop: int, boost: float,
                     postings: dict, dfs: dict) -> tuple[np.ndarray, np.ndarray]:
        """One phrase leaf driver-side: intersect the member terms'
        postings (rarest first), decode positions ONLY for the blocks
        the intersection docs live in, verify adjacency (slop 0) or
        the documented sloppy span (_sloppy_exists), and score
        survivors as boost × Σ member-term BM25 contributions — the
        exact contract of the batch path's verify_leaf. Candidate
        count is bounded by the rarest member's df; verification is
        the vectorized _verify_phrase_sets kernel over all candidates
        at once (the batch path runs the same kernel inside
        applyInPandas)."""
        zero = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if not terms or any(t not in dfs for t in terms):
            return zero
        tps = [postings[t] for t in terms]
        cs = sorted(range(len(terms)), key=lambda i: tps[i].total)
        cand = tps[cs[0]].all_docs
        for i in cs[1:]:
            tp = tps[i]
            idx = np.searchsorted(tp.all_docs, cand, side="left")
            idx_c = np.clip(idx, 0, tp.total - 1)
            cand = cand[tp.all_docs[idx_c] == cand]
            if cand.size == 0:
                return zero
        m = len(terms)
        slot_csr = []
        for s, (t, tp) in enumerate(zip(terms, tps)):
            fresh = tp.pos_flat is None
            idx = np.searchsorted(tp.all_docs, cand, side="left")
            flat, offs = tp.positions_csr(idx)
            if fresh:
                self._charge_positions(t, tp)
            slot_csr.append((flat - s, offs))
        repeated = len(set(terms)) < m
        keep = _verify_phrase_sets(slot_csr, np.arange(m), int(slop),
                                   repeated)
        cand = cand[keep]
        if cand.size == 0:
            return zero
        cfg = self.cfg
        k1, b, avgdl, N = cfg.k1, cfg.b, self.avgdl, self.n_docs
        scores = np.zeros(cand.size)
        for t, tp in zip(terms, tps):
            idf = float(np.log(1.0 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5)))
            w = boost * idf * (k1 + 1.0)
            idx = np.searchsorted(tp.all_docs, cand, side="left")
            scores += w * tp.unit_scores(k1, b, avgdl)[idx]
        return cand, scores

    def _merge_parts(self, parts) -> tuple[np.ndarray, np.ndarray]:
        """Union-merge per-leaf (docs, scores) pairs (per-doc sums),
        bincount-dense when the corpus allows (see _score_all)."""
        parts = [(d, s) for d, s in parts if d.size]
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        if len(parts) == 1:
            return parts[0]
        return _union_sum(np.concatenate([d for d, _ in parts]),
                          np.concatenate([s for _, s in parts]),
                          self.n_docs)

    def _format_results(self, results: list) -> pd.DataFrame:
        """[(score, doc_ord)] → (rank, conv_id, turn_idx, score) with
        the shared forward-row cache resolving doc_ords."""
        if not results:
            return pd.DataFrame(columns=["rank", "conv_id", "turn_idx", "score"])
        results.sort(key=lambda x: (-x[0], x[1]))
        ords = [d for _, d in results]
        self._fetch_doc_rows(ords)
        resolved = [self._doc_cache[d] for d in ords]
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(results) + 1, dtype=np.int32),
                "conv_id": [r[0] for r in resolved],
                "turn_idx": [r[1] for r in resolved],
                "score": [s for s, _ in results],
            }
        )

    def _group_union(self, leaves, postings, dfs) -> tuple[np.ndarray, np.ndarray]:
        """One OR-group's (docs, scores) union: flat/expanded leaves
        through weighted cursors, phrase leaves through _eval_phrase,
        merged with per-doc score sums."""
        cfg = self.cfg
        k1, b, avgdl, N = cfg.k1, cfg.b, self.avgdl, self.n_docs
        phrases = [(payload[0], payload[1], boost)
                   for kind, payload, boost in leaves if kind == "phrase"]
        flat = [lv for lv in leaves if lv[0] != "phrase"]
        weights = self._expand_to_weights(flat) if flat else {}
        parts = []
        flat_present = sorted(t for t in weights if t in dfs)
        if flat_present:
            cursors = []
            for t in flat_present:
                idf = float(np.log(1.0 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5)))
                cursors.append(
                    _Cursor(postings[t], weights[t] * idf * (k1 + 1.0)))
            parts.append(self._score_all(cursors, "or", k1, b, avgdl))
        for terms, slop, boost in phrases:
            parts.append(self._eval_phrase(terms, slop, boost,
                                           postings, dfs))
        return self._merge_parts(parts)

    def _search_cnf(self, parsed, groups, neg_groups, k: int) -> pd.DataFrame | None:
        """Driver path for one-level CNF trees — AND of OR-groups
        whose members are any leaf kind (terms, prefix/fuzzy/wildcard/regexp
        expansions, exact/sloppy phrases), with optional NEGATED
        conjuncts (`a AND NOT b`, `x AND NOT (spam OR junk*)`),
        filtered or not. Round 5: these shapes previously paid the
        distributed batch detour.

        Semantics parity with the batch path's mask algebra: a doc is
        accepted when EVERY positive group has >=1 matched leaf and NO
        negative group does; its score is the sum over ALL matched
        positive leaves — i.e. the sum of the per-group union scores,
        restricted to the intersection of the positive groups' doc
        sets minus the negative groups' unions (NOT leaves never
        score). A group containing the MatchAll sentinel (a `+`
        required-clause rewrite's SHOULD group, round 5) is OPTIONAL:
        it never gates the candidate set, but its leaves still add
        score where they match. Returns None when the probe bound or
        the filter-probe budget routes to batch, when no gating group
        remains, or when a NEGATIVE group is vacuous (NOT matchall =
        match nothing — the batch mask algebra owns that corner)."""
        cfg = self.cfg
        empty = pd.DataFrame(columns=["rank", "conv_id", "turn_idx", "score"])
        all_phrase_terms = [t for g in list(groups) + list(neg_groups)
                            for kind, payload, _ in g if kind == "phrase"
                            for t in payload[0]]
        if all_phrase_terms and not cfg.store_positions:
            raise ValueError(
                "phrase queries need an index built with "
                "IndexConfig(store_positions=True)")
        if parsed.has_filters:
            docs_df = self._forward_docs()
            missing_f = {c for c in qs_filter_columns(parsed.filters,
                                                      parsed.neg_filters)
                         if c not in docs_df.columns}
            if missing_f:
                raise ValueError(
                    f"query_string filter fields not in index forward "
                    f"table: {missing_f}")
        # `+` rewrite groups: a group containing the matchall sentinel
        # never gates — split it out as optional scorers. A vacuous
        # NEGATIVE group or no gating group at all → batch path.
        if any(any(lv[0] == "matchall" for lv in g) for g in neg_groups):
            return None
        gating = [g for g in groups
                  if not any(lv[0] == "matchall" for lv in g)]
        optional = [[lv for lv in g if lv[0] != "matchall"]
                    for g in groups if any(lv[0] == "matchall" for lv in g)]
        optional = [g for g in optional if g]
        if not gating:
            return None
        groups = gating
        # expansion happens per group (cached), so collect the full
        # term set for ONE probe + ONE fetch across all groups
        # (negative groups' terms included — their postings drive the
        # anti-membership pass and count against the driver bound;
        # optional groups' terms likewise — they fetch to score)
        group_weights = []
        for g in list(groups) + list(optional) + list(neg_groups):
            flat = [lv for lv in g if lv[0] != "phrase"]
            group_weights.append(self._expand_to_weights(flat) if flat else {})
        all_terms = sorted(
            {t for w in group_weights for t in w} | set(all_phrase_terms))
        if not all_terms:
            self.last_path = None
            return empty
        probe_dfs = self._probe_dfs(all_terms)
        if sum(probe_dfs.values()) > self.max_driver_postings:
            return None
        present_probe = sorted(t for t in all_terms
                               if probe_dfs.get(t, 0) > 0)
        if not present_probe:
            self.last_path = None
            return empty
        postings, dfs = self._fetch_postings(present_probe)
        pairs = []
        for g in groups:
            d, s = self._group_union(g, postings, dfs)
            if d.size == 0:
                # a required group matching nothing ⇒ zero hits
                self.last_path = ("filtered" if parsed.has_filters
                                  else "or_merge")
                return empty
            pairs.append((d, s))
        # intersect groups (smallest drives), summing per-group scores
        pairs.sort(key=lambda p: p[0].size)
        cand = pairs[0][0]
        for d, _ in pairs[1:]:
            idx = np.searchsorted(d, cand, side="left")
            idx_c = np.clip(idx, 0, d.size - 1)
            cand = cand[d[idx_c] == cand]
            if cand.size == 0:
                self.last_path = ("filtered" if parsed.has_filters
                                  else "or_merge")
                return empty
        scores = np.zeros(cand.size)
        for d, s in pairs:
            idx = np.searchsorted(d, cand, side="left")
            scores += s[idx]
        # optional (`+`-rewrite SHOULD) groups: add score where a
        # candidate matches, never gate. PER-LEAF, left-to-right —
        # the batch rollup's rows arrive in slot order, so summing one
        # leaf at a time keeps float grouping aligned with it on
        # near-tie scores (same reason _maxscore_or scores in original
        # cursor order)
        for g in optional:
            for lv in g:
                d, s = self._group_union([lv], postings, dfs)
                if d.size == 0 or cand.size == 0:
                    continue
                idx = np.searchsorted(d, cand, side="left")
                idx_c = np.clip(idx, 0, d.size - 1)
                hit = d[idx_c] == cand
                scores[hit] += s[idx_c[hit]]
        # negated conjuncts: remove docs matching ANY negative group's
        # union (anti-membership via searchsorted; NOT leaves never
        # score, so only the doc sets matter)
        for g in neg_groups:
            if cand.size == 0:
                break
            d_neg, _ = self._group_union(g, postings, dfs)
            if d_neg.size == 0:
                continue
            idx = np.searchsorted(d_neg, cand, side="left")
            idx_c = np.clip(idx, 0, d_neg.size - 1)
            keep = d_neg[idx_c] != cand
            cand, scores = cand[keep], scores[keep]
        if cand.size == 0:
            self.last_path = ("filtered" if parsed.has_filters
                              else "or_merge")
            return empty
        if parsed.has_filters:
            return self._filtered_probe(parsed, cand, scores, k)
        self.last_path = "or_merge"
        if cand.size > max(4 * k, 64):
            kth = np.partition(scores, cand.size - k)[cand.size - k] \
                if cand.size > k else -np.inf
            keep = scores >= kth
            cand, scores = cand[keep], scores[keep]
        order = np.lexsort((cand, -scores))[:k]
        results = [(float(scores[i]), int(cand[i])) for i in order]
        return self._format_results(results)

    def search(self, query_text: str, k: int = 10, mode: str = "or") -> pd.DataFrame:
        """-> pandas (rank, conv_id, turn_idx, score). Accepts
        query_string syntax. Routing:

          * flat term queries (implicit, or explicit trees of positive
            Term leaves under one OR/AND) run on the driver;
          * the same shapes WITH structured filters run on the driver
            too (round-4 paid the ~0.4-0.6s distributed batch for
            `term AND role:user` — VERDICT r4 item 6): postings fetch
            + full driver scoring, then the filter applies via small
            doc_block-pruned forward-table probes in score order;
          * one-level CNF trees — AND of OR-groups whose members are
            any leaf kind (terms, prefix/fuzzy/wildcard/regexp expansions
            via the cached dictionary job, exact and sloppy phrases
            verified from cached position blobs), with NEGATED
            conjuncts (`a AND NOT b`) as anti-membership passes —
            evaluate fully on the driver (_search_cnf / _group_union
            / _eval_phrase), filtered or not;
          * pure-negative trees, NOT under OR (empty-mask accepting),
            and deeper mixed nesting keep the batch path's full mask
            algebra, as do filter-only queries and queries whose
            postings blow max_driver_postings."""
        from sparkbm25.querystring import parse_query_string

        parsed = parse_query_string(query_text, self.cfg.token_pattern)
        cfg = self.cfg
        if self.n_docs == 0:
            self.last_path = None
            return pd.DataFrame(columns=["rank", "conv_id", "turn_idx", "score"])
        flat = (_flatten_tree(parsed.tree)
                if (parsed.explicit and parsed.tree is not None) else None)
        if flat is None and parsed.explicit and parsed.tree is not None:
            # one-level CNF trees — OR-groups of any leaf kind
            # (terms / prefix / fuzzy / wildcard expansions, exact and
            # sloppy phrases), possibly ANDed: expand/verify/intersect
            # on the driver — round-5 removed the batch detour for
            # every shape short of NOT and deeper nesting
            cnf = _flatten_cnf(parsed.tree)
            if cnf is not None:
                pos_groups, neg_groups = cnf
                if (len(pos_groups) == 1 and not neg_groups
                        and all(lv[0] not in ("phrase", "matchall")
                                for lv in pos_groups[0])):
                    # plain OR-of-expandable-leaves: the theta-pruned
                    # MaxScore/WAND algorithms are faster than the
                    # full-union CNF evaluator. matchall must NOT take
                    # this route (final-round review finding): a
                    # `+filter should-term` rewrite leaves
                    # Or([Term, MatchAll]), which _expand_to_weights
                    # cannot expand (IndexError) and whose semantics —
                    # the group matches EVERY doc — live in
                    # _search_cnf's optional split / the batch path
                    flat = (self._expand_to_weights(pos_groups[0]), "or")
                else:
                    out = self._search_cnf(parsed, pos_groups,
                                           neg_groups, k)
                    if out is None:
                        return self._via_batch(query_text, k, mode)
                    return out
        if parsed.has_filters:
            if parsed.tree is None or (parsed.explicit and flat is None):
                # filter-only (constant-score semantics) or a complex
                # tree: the batch path owns those
                return self._via_batch(query_text, k, mode)
            if parsed.explicit:
                weights, fmode = flat
            else:
                weights = {t: float(q) for t, q in Counter(
                    tokenize_one(parsed.text, cfg.token_pattern)).items()}
                fmode = mode
            if not weights and not parsed.explicit:
                # implicit query whose text analyzed to nothing under
                # a filter: the batch path's filter-only const-score
                # semantics apply (ES filter context)
                return self._via_batch(query_text, k, mode)
            # explicit empty weights (a required multi-term leaf that
            # expanded to zero dictionary terms) correctly yield zero
            # hits on the driver — no batch job needed
            out = self._search_filtered_driver(parsed, weights, fmode, k)
            if out is None:
                return self._via_batch(query_text, k, mode)
            return out
        if parsed.explicit:
            if flat is None:
                return self._via_batch(query_text, k, mode)
            counts, mode = flat
        else:
            counts = Counter(tokenize_one(parsed.text, cfg.token_pattern))
        if not counts:
            self.last_path = None
            return pd.DataFrame(columns=["rank", "conv_id", "turn_idx", "score"])
        # bound the driver collect: probe df first (column-pruned scan,
        # blocks never read); hot/stopword-heavy queries go distributed
        probe_dfs = self._probe_dfs(sorted(counts))
        if sum(probe_dfs.values()) > self.max_driver_postings:
            return self._via_batch(query_text, k, mode)
        # fetch only terms the probe saw: absent terms never cost a
        # scan, and an AND query missing a term short-circuits before
        # any postings move
        present_probe = sorted(t for t in counts if probe_dfs.get(t, 0) > 0)
        if not present_probe or (
                mode == "and" and len(present_probe) < len(counts)):
            self.last_path = None
            return pd.DataFrame(columns=["rank", "conv_id", "turn_idx", "score"])
        postings, dfs = self._fetch_postings(present_probe)
        present = sorted(t for t in counts if t in dfs)
        if mode == "and" and len(present) < len(counts):
            # probe-present term negative-cached/absent at fetch: keep
            # last_path consistent with the probe-gated early return
            # above (ADVICE r4: a stale value here misled observability)
            self.last_path = None
            return pd.DataFrame(columns=["rank", "conv_id", "turn_idx", "score"])
        if not present:
            self.last_path = None
            return pd.DataFrame(columns=["rank", "conv_id", "turn_idx", "score"])
        k1, b, avgdl, N = cfg.k1, cfg.b, self.avgdl, self.n_docs
        cursors = []
        for t in present:
            idf = float(np.log(1.0 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5)))
            weight = counts[t] * idf * (k1 + 1.0)
            cursors.append(_Cursor(postings[t], weight))

        if mode == "and":
            self.last_path = "and"
            results = self._intersect_and(cursors, k, k1, b, avgdl)
        elif self.or_algo == "wand":
            self.last_path = "wand"
            results = self._wand_or(cursors, k, k1, b, avgdl)
        elif (len(cursors) >= 2
              and sum(c.total for c in cursors)
              >= max(self.n_docs, self.dense_min_postings)
              and self.n_docs <= max(
                  8 * sum(c.total for c in cursors), 1 << 20)
              and all(c.weight > 0 for c in cursors)):
            # exhaustive-dense regime (expanded prefix/fuzzy/wildcard/regexp
            # leaves, stopword ORs): many similar-weight hot cursors
            # keep MaxScore's essential set near-total, so it pays
            # per-chunk searchsorted alignment for every cursor while
            # pruning almost nothing. When the summed dfs reach the
            # corpus size, ONE bincount scatter per the _score_all
            # dense path scores every posting in O(P + N) with no
            # candidate alignment at all — measured 0.39 s -> ~0.1 s
            # warm for a 10-hot-term prefix expansion at 960k docs.
            # Gated on the same dense-feasibility bound as _score_all
            # (n_docs within 8x the postings volume), so a web-scale
            # doc count with a driver-bounded postings set still takes
            # the MaxScore path.
            self.last_path = "dense"
            results = self._dense_topk(cursors, k, k1, b, avgdl)
        else:
            self.last_path = "maxscore"
            results = self._maxscore_or(cursors, k, k1, b, avgdl)
        return self._format_results(results)

    def highlight(self, hits: pd.DataFrame, source, query_text: str,
                  **kw) -> pd.DataFrame:
        """Fetch-phase highlighting for an interactive result: returns
        ``hits`` plus a ``highlight`` fragment-list column. The index
        drops stored text at build time (forward table carries ids +
        attrs only), so — like the reference's ES `_source` reads —
        the caller supplies the transcripts ``source`` DataFrame; the
        probe pushes both id columns into the scan and the kernel runs
        driver-side over the k texts (highlight.highlight_hits).
        Keyword args: pre_tag, post_tag, fragment_size,
        number_of_fragments (0 = whole field)."""
        from sparkbm25.highlight import highlight_hits

        kw.setdefault("token_pattern", self.cfg.token_pattern)
        return highlight_hits(source, hits, query_text, **kw)

    def _dense_topk(self, cursors: list[_Cursor], k: int, k1: float,
                    b: float, avgdl: float) -> list:
        """Exhaustive scoring (_score_all's dense OR path) + exact
        top-k. Tie handling matches the pruned algorithms bit-exactly:
        per-doc sums accumulate in cursor order (bincount consumes the
        cursor-order concatenation sequentially) and the final cut is
        score desc, doc asc."""
        cand, scores = self._score_all(cursors, "or", k1, b, avgdl)
        if scores.size > k:
            thr = np.partition(scores, scores.size - k)[scores.size - k]
            m = scores >= thr
            cand, scores = cand[m], scores[m]
        order = np.lexsort((cand, -scores))[:k]
        return [(float(s), int(d))
                for s, d in zip(scores[order], cand[order])]

    @staticmethod
    def _wand_or(cursors: list[_Cursor], k: int, k1: float, b: float, avgdl: float):
        """Block-Max WAND, block-range-at-a-time (Ding & Suel BMW with
        the scoring vectorized — VERDICT r3 item 1: the per-posting
        Python loop ran at ~500k postings/s and WAS the interactive
        latency). Each outer iteration either

          (a) proves via block-max bounds alone that no doc in
              [pivot, range_end) can beat theta and skips the whole
              range without decoding, or
          (b) scores EVERY candidate doc in the range as whole numpy
              arrays and advances all cursors past it.

        range_end = min(participating cursors' current-block ends,
        first beyond-pivot cursor's cur_doc), so within the range the
        participating block set is constant: no other cursor owns a
        posting there, every in-range posting lives in one decoded
        block per cursor, and the shallow max_impact bound stays valid
        across the range. Scoring extra sub-threshold docs only wastes
        work — the heap acceptance is exact — so pruning stays
        lossless. heap holds (score, -doc_ord): the min element is
        the one a candidate must beat under (score desc, doc asc).
        """
        from operator import attrgetter

        heap: list[tuple[float, int]] = []  # (score, -doc_ord) min-heap
        curkey = attrgetter("cur")

        while True:
            live = [c for c in cursors if c.cur < _INF_DOC]
            if not live:
                break
            live.sort(key=curkey)
            theta = heap[0][0] if len(heap) >= k else -1.0
            # pivot: first index where cumulative GLOBAL ub exceeds theta
            acc = 0.0
            pivot_i = -1
            for i, c in enumerate(live):
                acc += c.weight  # weight == global ub (impact <= 1)
                if acc > theta:
                    pivot_i = i
                    break
            if pivot_i < 0:
                break  # nothing can beat theta anymore
            pivot_doc = live[pivot_i].cur
            # shallow block-max check over every term that could
            # contribute at pivot_doc (cur <= pivot_doc)
            ub_bm = 0.0
            bounds = []
            part = []
            for c in live:
                if c.cur > pivot_doc:
                    # first cursor past the pivot: its postings were NOT
                    # counted in ub_bm, so the skip may not jump past it
                    # (Ding & Suel BMW GetNewCandidate rule)
                    bounds.append(c.cur)
                    break
                ub, end = c.shallow_info(pivot_doc)
                ub_bm += ub
                bounds.append(end)
                part.append(c)
            # min(bounds) > pivot_doc always (shallow ends are
            # exclusive bounds of the block containing pivot_doc; the
            # beyond-pivot cursor sits past pivot_doc) => progress
            range_end = min(bounds)
            if ub_bm <= theta:
                # no doc in [pivot_doc, range_end) can beat theta:
                # skip to the nearest block boundary past pivot_doc
                target = max(range_end, pivot_doc + 1)
                for c in live:
                    if c.cur < target:
                        c.next_geq(target)
                continue
            # vectorized range scoring: gather each participating
            # cursor's postings in [pivot_doc, range_end) straight from
            # the flat decoded arrays (postings below pivot_doc are
            # skipped unscored — the pivot invariant says their
            # cursors' total weight cannot beat theta). Contributions
            # concatenate in the ORIGINAL cursor order, not cur-sorted
            # order: float summation order is then deterministic and
            # bit-identical across _wand_or/_maxscore_or/brute force,
            # so exact score ties rank identically everywhere
            cand_docs: list[np.ndarray] = []
            cand_scores: list[np.ndarray] = []
            part_ids = {id(c) for c in part}
            part = [c for c in cursors if id(c) in part_ids]
            for c in part:
                if c.cur < pivot_doc:
                    c.next_geq(pivot_doc)
                if c.cur >= range_end:
                    continue
                lo = c.gpos
                hi = lo + int(np.searchsorted(
                    c.all_docs[lo:], range_end, side="left"))
                cand_docs.append(c.all_docs[lo:hi])
                cand_scores.append(
                    c.weight * c.tp.unit_scores(k1, b, avgdl)[lo:hi])
            for c in part:
                if c.cur < range_end:
                    c.next_geq(range_end)
            if not cand_docs:
                continue
            alldocs = np.concatenate(cand_docs)
            allsc = np.concatenate(cand_scores)
            uniq, inv = np.unique(alldocs, return_inverse=True)
            sums = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(sums, inv, allsc)
            if len(heap) >= k:
                # theta only rises: one vectorized prefilter against
                # the entry threshold (ties kept — doc order decides)
                keep = sums >= heap[0][0]
                uniq, sums = uniq[keep], sums[keep]
            for d, s in zip(uniq.tolist(), sums.tolist()):
                item = (s, -d)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
        return [(s, -nd) for s, nd in sorted(heap, reverse=True)]

    @staticmethod
    def _maxscore_or(cursors: list[_Cursor], k: int, k1: float, b: float,
                     avgdl: float, chunk: int = 65536):
        """Chunked vectorized MaxScore (Turtle & Flood) — the default
        driver OR path. BMW iterates per posting/block, which fights
        numpy; MaxScore maps onto the fully-decoded flat arrays:

          * cursors sort by weight; the NON-ESSENTIAL prefix is the
            largest whose summed weights <= theta — a doc containing
            only non-essential terms can never beat theta, so
            CANDIDATES are exactly the union of essential cursors'
            postings (a vectorized merge, never a per-doc loop);
          * candidates score in doc-ordered chunks: every cursor's
            contribution at the chunk's docs comes from one
            np.searchsorted + mask, the chunk's exact top-k (score
            desc, doc asc — lexsort, tie-exact) merges into the heap,
            and theta's rise shrinks the essential set before the
            next chunk;
          * a cursor promoted to essential mid-query fast-forwards to
            the chunk frontier first, so no doc is ever emitted twice.

        Pruning is lossless for the same reason as MaxScore's: every
        skipped doc is PROVEN <= theta by the weight-prefix bound.
        Measured: the heaviest bench query's OR loop drops ~0.35 s
        (vectorized BMW) -> ~0.01-0.06 s; exhaustive-shape queries
        degrade gracefully to one vectorized full scoring pass.
        _wand_or stays as the block-max verification twin (parity
        tests run both)."""
        import heapq as _heapq

        cs = sorted((c for c in cursors if c.total > 0),
                    key=lambda c: c.weight)
        if not cs:
            return []
        prefix = np.cumsum([c.weight for c in cs])
        heap: list[tuple[float, int]] = []
        floor = 0  # doc-ord chunk frontier (docs < floor are settled)
        for c in cs:
            c.gpos = 0
        while True:
            theta = heap[0][0] if len(heap) >= k else -1.0
            ne = int(np.searchsorted(prefix, theta, side="right"))
            if ne >= len(cs):
                break  # even all terms together cannot beat theta
            ess = cs[ne:]
            # fast-forward essential cursors to the frontier (a cursor
            # promoted from non-essential still has a stale position)
            hi_doc = _INF_DOC
            alive = []
            for c in ess:
                g = c.gpos
                if g < c.total and c.all_docs[g] < floor:
                    g += int(np.searchsorted(c.all_docs[g:], floor,
                                             side="left"))
                    c.gpos = g
                if g >= c.total:
                    continue
                alive.append(c)
                j = min(g + chunk, c.total) - 1
                hi_doc = min(hi_doc, int(c.all_docs[j]))
            if not alive:
                break
            cand_parts = []
            for c in alive:
                g = c.gpos
                h = g + int(np.searchsorted(c.all_docs[g:], hi_doc,
                                            side="right"))
                cand_parts.append(c.all_docs[g:h])
                c.gpos = h
            if len(cand_parts) == 1:
                # single alive essential cursor: its slice IS the
                # (unique, sorted) candidate set — no merge, and its
                # contribution aligns 1:1 without a searchsorted
                cand = cand_parts[0]
                aligned = alive[0]
            else:
                cand = np.unique(np.concatenate(cand_parts))
                aligned = None
            scores = np.zeros(cand.size)
            # score in the ORIGINAL cursor order (not weight order):
            # deterministic float summation order, bit-identical with
            # _wand_or and the brute-force oracle even on exact ties
            for c in cursors:
                if c.total == 0:
                    continue
                if c is aligned:
                    lo = c.gpos - cand.size
                    scores += c.weight * c.tp.unit_scores(
                        k1, b, avgdl)[lo:c.gpos]
                    continue
                idx = np.searchsorted(c.all_docs, cand, side="left")
                idx_c = np.clip(idx, 0, c.total - 1)
                m = c.all_docs[idx_c] == cand
                if not m.any():
                    continue
                scores[m] += c.weight * c.tp.unit_scores(
                    k1, b, avgdl)[idx_c][m]
            if len(heap) >= k:
                keep = scores >= heap[0][0]
                cand, scores = cand[keep], scores[keep]
            if cand.size > k:
                # exact chunk top-k incl. doc-asc tie-break: threshold
                # by the kth score first (argpartition), lexsort only
                # the >= -threshold survivors (tie group included) —
                # a full lexsort of a large first chunk cost more than
                # the scoring itself
                thr = np.partition(scores, scores.size - k)[scores.size - k]
                m = scores >= thr
                cand, scores = cand[m], scores[m]
                order = np.lexsort((cand, -scores))[:k]
                cand, scores = cand[order], scores[order]
            for d, sc in zip(cand.tolist(), scores.tolist()):
                item = (sc, -d)
                if len(heap) < k:
                    _heapq.heappush(heap, item)
                elif item > heap[0]:
                    _heapq.heapreplace(heap, item)
            floor = hi_doc + 1
        return [(s, -nd) for s, nd in sorted(heap, reverse=True)]

    @staticmethod
    def _intersect_and(cursors: list[_Cursor], k: int, k1: float, b: float, avgdl: float):
        """Vectorized intersection, rarest list drives (J4:
        smallest-first): the rarest cursor's doc array filters through
        each other cursor via one searchsorted membership pass — the
        numpy shape of leapfrog — then scoring and exact top-k
        (score desc, doc asc) are whole-array ops. Candidates never
        exceed the rarest list's length, so memory is bounded by the
        most selective term."""
        if not cursors or any(c.total == 0 for c in cursors):
            return []
        cs = sorted(cursors, key=lambda c: c.total)
        cand = cs[0].all_docs
        for c in cs[1:]:
            idx = np.searchsorted(c.all_docs, cand, side="left")
            idx_c = np.clip(idx, 0, c.total - 1)
            cand = cand[c.all_docs[idx_c] == cand]
            if cand.size == 0:
                return []
        scores = np.zeros(cand.size)
        # fixed summation order (the caller's sorted-term cursor list)
        for c in cursors:
            idx = np.searchsorted(c.all_docs, cand, side="left")
            scores += c.weight * c.tp.unit_scores(k1, b, avgdl)[idx]
        order = np.lexsort((cand, -scores))[:k]
        return [(float(scores[i]), int(cand[i])) for i in order]
