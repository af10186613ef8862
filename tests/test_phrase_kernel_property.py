"""Property test for the vectorized phrase-verification kernel
(_verify_phrase_sets): over randomized per-doc position sets it must
equal the per-doc reference semantics it replaced — adjusted-value
intersection at slop 0, _sloppy_exists (window + distinct-assignment)
at slop > 0 — for every phrase shape: 1..4 slots, exact and sloppy,
distinct and repeated terms, docs with empty overlap windows, values
near 0 (where a naive key encoding would let a ±slop window cross a
doc boundary). Pure numpy — no Spark session."""

import numpy as np
import pytest

from sparkbm25.search import _sloppy_exists, _verify_phrase_sets


def _reference_mask(slot_lists, tidxs, slop):
    """Per-doc reference: the pre-round-5 loop semantics."""
    n = len(slot_lists[0])
    keep = np.zeros(n, dtype=bool)
    for i in range(n):
        lists = [np.asarray(sl[i], dtype=np.int64) for sl in slot_lists]
        if slop == 0:
            base = lists[0]
            for arr in lists[1:]:
                base = np.intersect1d(base, arr)
                if base.size == 0:
                    break
            keep[i] = base.size > 0
        else:
            keep[i] = _sloppy_exists(lists, tidxs, slop)
    return keep


def _to_csr(per_doc):
    lens = np.array([len(x) for x in per_doc], dtype=np.int64)
    offs = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = (np.concatenate([np.asarray(x, dtype=np.int64) for x in per_doc])
            if offs[-1] else np.empty(0, dtype=np.int64))
    return flat, offs


@pytest.mark.parametrize("seed", range(40))
def test_kernel_matches_per_doc_reference(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 5))
    repeated = bool(rng.integers(0, 2)) and m >= 2
    slop = int(rng.choice([0, 0, 1, 2, 5]))
    _run_case(rng, m, repeated, slop)


@pytest.mark.parametrize("seed", range(30))
def test_kernel_matches_reference_long_sloppy(seed):
    """Concentrated coverage of the vectorized m>2 distinct-term
    sloppy branch (anchored-window searchsorted over all candidate
    edges), which the uniform sampler above hits only occasionally."""
    rng = np.random.default_rng(10_000 + seed)
    m = int(rng.integers(3, 6))
    slop = int(rng.choice([1, 2, 3, 5, 9]))
    _run_case(rng, m, False, slop)


def _run_case(rng, m, repeated, slop):
    n = int(rng.integers(1, 60))
    # simulate tokenized docs: term occurrences at small positions so
    # adjusted values go negative and windows brush doc boundaries.
    # Distinct terms occupy DISJOINT raw positions within a doc (one
    # token is one term — the invariant the kernel's "raw
    # distinctness is free" shortcut relies on): partition a
    # without-replacement sample of each doc's positions among slots
    tidxs = np.arange(m)
    raw_docs = [[None] * n for _ in range(m)]
    for i in range(n):
        tfs = rng.integers(1, 4, size=m)
        total = int(tfs.sum())
        doclen = total + int(rng.integers(0, 20))
        pool = rng.choice(doclen, size=total, replace=False)
        pos = 0
        for s in range(m):
            cut = pos + int(tfs[s])
            raw_docs[s][i] = np.sort(pool[pos:cut].astype(np.int64))
            pos = cut
    if repeated:
        # a repeated term shares ONE raw occurrence set per doc
        raw_docs[m - 1] = raw_docs[0]
    # adjusted per slot: raw - slot index (the caller's convention)
    slot_lists = [[arr - s for arr in raw_docs[s]] for s in range(m)]
    ref = _reference_mask(slot_lists, tidxs, slop)
    got = _verify_phrase_sets([_to_csr(sl) for sl in slot_lists],
                              tidxs, slop, repeated)
    np.testing.assert_array_equal(got, ref, err_msg=(
        f"m={m} slop={slop} repeated={repeated}"))


def test_kernel_empty_and_singleton():
    # zero docs
    z = _verify_phrase_sets(
        [(np.empty(0, np.int64), np.zeros(1, np.int64))],
        np.arange(1), 0, False)
    assert z.size == 0
    # one doc, one slot: any occurrence is a match
    got = _verify_phrase_sets(
        [(np.array([3], np.int64), np.array([0, 1], np.int64))],
        np.arange(1), 0, False)
    assert got.tolist() == [True]
