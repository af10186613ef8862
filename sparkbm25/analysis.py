"""Text analysis: the tokenizer and analyzer chain.

The reference's per-row transform is a pluggable scalar map
(``AbstractInterpreter.translate``, interpreters/abstract.py:158-171);
our engine's per-row transform is tokenization. It is implemented ONCE
in vectorized pandas string ops and reused by (a) the Spark build
pipeline via ``pandas_udf`` and (b) the numpy reference scorer — so
index-side and oracle-side analysis agree by construction (the same
way the reference reuses one ``translate`` for all execution paths).

No per-row Python: everything is ``pandas.Series.str`` vectorized and
crosses the JVM boundary in Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

DEFAULT_TOKEN_PATTERN = "[a-z0-9]+"

# byte tables for the vectorized ASCII fast path: lowercase map and
# the token-character class of the DEFAULT pattern
_ASCII_LOWER = np.arange(256, dtype=np.uint8)
_ASCII_LOWER[ord("A"):ord("Z") + 1] += 32
_IS_TOKEN_BYTE = np.zeros(256, dtype=bool)
_IS_TOKEN_BYTE[ord("a"):ord("z") + 1] = True
_IS_TOKEN_BYTE[ord("0"):ord("9") + 1] = True


def _token_bounds_ascii(arr, max_content_length: int = 0):
    """Shared core of the vectorized ASCII fast path: lowercased bytes
    + token boundaries. Returns (low uint8, tok_start, tok_end,
    row_off, n_rows) or None when the batch is not eligible (non-ASCII
    byte / non-string type)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        return None     # large_string etc.: take the pandas path
    if arr.null_count:
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, "")
    bufs = arr.buffers()
    n_rows = len(arr)
    off = np.frombuffer(bufs[1], dtype=np.int32, count=n_rows + 1,
                        offset=arr.offset * 4).astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    lo = int(off[0])
    seg = data[lo:int(off[-1])]
    if seg.size and int(seg.max()) >= 128:
        return None
    row_off = off - lo
    low = _ASCII_LOWER[seg]
    m = _IS_TOKEN_BYTE[low]
    n = seg.size
    maxlen = max_content_length if max_content_length and max_content_length > 0 else 0
    if maxlen:
        # mask out bytes beyond each row's cap (rare rows; tight loop
        # only over the affected ones)
        lens = np.diff(row_off)
        for i in np.flatnonzero(lens > maxlen):
            m[row_off[i] + maxlen:row_off[i + 1]] = False
    # token starts: token byte whose predecessor (within the row) is
    # not a token byte; ends symmetric. Row boundaries force breaks.
    prev = np.empty(n, dtype=bool)
    nxt = np.empty(n, dtype=bool)
    if n:
        prev[0] = False
        prev[1:] = m[:-1]
        nxt[-1] = False
        nxt[:-1] = m[1:]
    starts_rows = row_off[:-1]
    sr = starts_rows[(starts_rows >= 0) & (starts_rows < n)]
    prev[sr] = False
    ends_rows = row_off[1:] - 1
    er = ends_rows[(ends_rows >= 0) & (ends_rows < n)]
    nxt[er] = False
    tok_start = np.flatnonzero(m & ~prev)
    tok_end = np.flatnonzero(m & ~nxt) + 1
    return low, tok_start, tok_end, row_off, n_rows


def count_tokens_arrow_ascii(arr, max_content_length: int = 0):
    """dl (token count per row, int64 ndarray) WITHOUT materializing
    token lists — the cheap pass for consumers that only need doc
    lengths (forward table, stats). Same eligibility contract as
    tokenize_arrow_ascii (None -> pandas fallback)."""
    bounds = _token_bounds_ascii(arr, max_content_length)
    if bounds is None:
        return None
    _low, tok_start, _tok_end, row_off, _n_rows = bounds
    return np.diff(np.searchsorted(tok_start, row_off)).astype(np.int64)


def tokenize_arrow_ascii(arr, max_content_length: int = 0):
    """Vectorized tokenize of a pyarrow StringArray for the DEFAULT
    token pattern over pure-ASCII text: byte-table lowercase + token
    classification + one gather, no per-row Python and no Python
    string objects — the whole result is two Arrow buffers.

    Returns (tokens ListArray, dl int64 ndarray), or None when the
    batch is not eligible (any non-ASCII byte — Unicode lowercasing
    can change byte sequences, e.g. U+0130 lowercases INTO ascii 'i' +
    a combining dot), in which case the caller must use the
    tokenize_series path. For ASCII input this is equal by
    construction: str.lower() == byte+32 on A-Z, and [a-z0-9]+ runs ==
    maximal runs of the token byte class, split at row boundaries.
    Truncation (max_content_length) caps each row at that many BYTES
    (== characters for ASCII) before tokenizing, like str.slice."""
    import pyarrow as pa

    bounds = _token_bounds_ascii(arr, max_content_length)
    if bounds is None:
        return None
    low, tok_start, tok_end, row_off, n_rows = bounds
    lens = tok_end - tok_start
    total = int(lens.sum())
    out_off = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    if total:
        gather = (np.arange(total, dtype=np.int64)
                  + np.repeat(tok_start - out_off[:-1], lens))
        values = low[gather]
    else:
        values = np.empty(0, dtype=np.uint8)
    tok_per_row = np.diff(np.searchsorted(tok_start, row_off))
    list_off = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(tok_per_row, out=list_off[1:])
    svals = pa.Array.from_buffers(
        pa.string(), lens.size,
        [None, pa.py_buffer(out_off.astype(np.int32)),
         pa.py_buffer(values)])
    toks = pa.ListArray.from_arrays(
        pa.array(list_off, type=pa.int32()), svals)
    return toks, tok_per_row.astype(np.int64)


def tokenize_series(
    texts: pd.Series,
    token_pattern: str = DEFAULT_TOKEN_PATTERN,
    max_content_length: int = 0,
) -> pd.Series:
    """text -> list[str] terms. Lowercase, extract token_pattern runs.

    Nulls tokenize to []. Optional truncation mirrors the reference's
    --max-content-length (es_translator/es.py:120-121).
    """
    s = texts.fillna("")
    if max_content_length and max_content_length > 0:
        s = s.str.slice(0, max_content_length)
    return s.str.lower().str.findall(token_pattern)


def make_tokens_udf(token_pattern: str = DEFAULT_TOKEN_PATTERN, max_content_length: int = 0):
    """Vectorized Arrow UDF: text:string -> tokens:array<string>."""

    @F.pandas_udf(ArrayType(StringType()))
    def tokens_udf(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts, token_pattern, max_content_length)

    return tokens_udf


def tokenize_one(text: str | None, token_pattern: str = DEFAULT_TOKEN_PATTERN,
                 max_content_length: int = 0) -> list[str]:
    """Driver-side single-string tokenize (query analysis)."""
    return tokenize_series(pd.Series([text], dtype=object),
                           token_pattern, max_content_length).iloc[0]
