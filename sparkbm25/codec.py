"""Delta-gap + varint posting compression, 128-doc self-contained blocks.

The reference stores postings inside Lucene (opaque to it); the
north_rule requires us to own the codec: per-term docID lists are
delta-gapped and varint-encoded into fixed-size blocks, each block
carrying per-block max-score metadata for block-max WAND pruning.

All encode/decode is vectorized numpy (no per-element Python loops in
the hot path) and runs inside Arrow UDFs, producing/consuming
``BinaryType`` columns (bytes), per SURVEY §7.3 — never
``ArrayType(ByteType)``.

Block layout (one struct row per block, self-contained so that
doc_ord-range-disjoint salt-bucket runs merge by concatenation):
    first_doc : int64   absolute doc_ord of the first posting
    n         : int32   postings in this block
    gaps      : binary  varint deltas doc[i]-doc[i-1] for i in 1..n-1
    tfs       : binary  varint term frequencies (all n)
    dls       : binary  varint doc lengths (all n; self-contained
                        scoring — no doc-norm join at query time)
    max_impact: double  max over block of tf/(tf + k1*(1-b+b*dl/avgdl))
                        → block score upper bound = qtf*idf*(k1+1)*max_impact
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64 bits / 7


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 varint encode of a non-negative int array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length of each value = number of 7-bit groups
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        nb += (v >> np.uint64(7 * k)) > 0
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for k in range(_MAX_VARINT_BYTES):
        mask = nb > k
        if not mask.any():
            break
        idx = starts[mask] + k
        byte = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (k < nb[mask] - 1).astype(np.uint8) << 7
        out[idx] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Vectorized varint decode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lens)
    vals7 = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(vals7, starts)


def encode_blocks(
    doc_ords: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    *,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int,
) -> list[dict]:
    """Cut a sorted (by doc_ord) posting run into self-contained blocks.

    Returns a list of dicts matching the segments `blocks` struct.
    """
    n = doc_ords.shape[0]
    doc_ords = np.asarray(doc_ords, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    # impact = tf / (tf + k1*(1 - b + b*dl/avgdl)), float64
    denom_norm = k1 * (1.0 - b + b * (dls / avgdl))
    impacts = tfs / (tfs + denom_norm)
    blocks = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        d = doc_ords[s:e]
        blocks.append(
            {
                "first_doc": int(d[0]),
                "n": int(e - s),
                "gaps": varint_encode(np.diff(d).astype(np.uint64)),
                "tfs": varint_encode(tfs[s:e].astype(np.uint64)),
                "dls": varint_encode(dls[s:e].astype(np.uint64)),
                "max_impact": float(impacts[s:e].max()),
            }
        )
    return blocks


def decode_block(block) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One block -> (doc_ords:int64, tfs:int64, dls:int64).

    Accepts a dict or a pyspark Row-like with fields first_doc/gaps/tfs/dls.
    """
    get = block.__getitem__ if isinstance(block, dict) else (lambda k: getattr(block, k))
    gaps = varint_decode(get("gaps")).astype(np.int64)
    docs = np.empty(gaps.size + 1, dtype=np.int64)
    docs[0] = get("first_doc")
    np.cumsum(gaps, out=docs[1:]) if gaps.size else None
    if gaps.size:
        docs[1:] += docs[0]
    tfs = varint_decode(get("tfs")).astype(np.int64)
    dls = varint_decode(get("dls")).astype(np.int64)
    return docs, tfs, dls


def decode_blocks(blocks) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate-decode a list of blocks (assumed doc_ord-ordered)."""
    if blocks is None or len(blocks) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    parts = [decode_block(blk) for blk in blocks]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )
