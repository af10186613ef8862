"""sparkbm25 — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch Spark-first re-expression of the capabilities that
ICIJ/es-translator delegates to Elasticsearch/Lucene (query_string
full-text retrieval, BM25 ranking, inverted indexing, shard routing,
scroll scan) plus the reference's own pipeline semantics (plan/resume,
skew-aware distribution, throughput metrics) — see SURVEY.md.

Input table shape (BASELINE.json input_hint):
    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp)

Public surface:
    IndexConfig            — job config (ref: es_translator/es_translator.py:136-163)
    build_index            — SPIMI-style index build (ref: scan→pipeline→sink dataflow)
    Searcher / search_batch — BM25 top-k query engine (ref: es_translator.py:313-323
                              delegates this to ES query_string; here it is native)
    bm25_reference_topk    — brute-force numpy parity oracle
"""

from sparkbm25.config import IndexConfig
from sparkbm25.build import build_index
from sparkbm25.search import Searcher, search_batch
from sparkbm25.refscore import bm25_reference_topk


def update_index(*args, **kwargs):
    """Incremental generation append (see streaming.update_index)."""
    from sparkbm25.streaming import update_index as _f

    return _f(*args, **kwargs)


def curate_and_index(*args, **kwargs):
    """Dedup/quality/lang curation + index build (see pipeline)."""
    from sparkbm25.pipeline import curate_and_index as _f

    return _f(*args, **kwargs)


def annotate_docs(*args, **kwargs):
    """MERGE-style nested-array partial update (see annotate)."""
    from sparkbm25.annotate import annotate_docs as _f

    return _f(*args, **kwargs)


def translate_into_index(*args, **kwargs):
    """The reference's end-to-end translate job (see translate)."""
    from sparkbm25.translate import translate_into_index as _f

    return _f(*args, **kwargs)


def compact_index(*args, **kwargs):
    """Fold index generations into one root (see compact)."""
    from sparkbm25.compact import compact_index as _f

    return _f(*args, **kwargs)


def compact_generations(*args, **kwargs):
    """In-place generation fold of a live root (see
    streaming.compact_generations; update_index's auto_compact_after
    policy calls this)."""
    from sparkbm25.streaming import compact_generations as _f

    return _f(*args, **kwargs)


__version__ = "0.1.0"

__all__ = [
    "IndexConfig",
    "build_index",
    "Searcher",
    "search_batch",
    "bm25_reference_topk",
    "update_index",
    "curate_and_index",
    "annotate_docs",
    "translate_into_index",
    "compact_index",
    "compact_generations",
]
