"""Incremental indexing: the reference's unbounded work-queue loop
(T1: es_translator/worker.py:37-51, producer es_translator.py:291-293)
re-expressed as Structured Streaming `foreachBatch` over generations.

Each micro-batch becomes a self-contained sub-index `gen=K/` whose
doc_ords start where the previous generation ended. Query-time global
stats (N, avgdl, df) are summed across generations
(catalog.global_stats), so EXACT BM25 scores over the merged index
equal a from-scratch build over the concatenated corpus; only the
stored block-max metadata is per-generation (encoded with that
generation's avgdl) and is inflated by max(1, avgdl_global/avgdl_gen)
at WAND time — a sound upper bound because block max_impact is
monotone in the length norm:
    impact = tf/(tf + k1*(1-b+b*dl/avgdl));
    for avgdl' vs avgdl the ratio is bounded by max(1, avgdl'/avgdl).

Rate limiting (T2: --throttle, cli.py:150) maps to
maxFilesPerTrigger; backpressure (X4: bounded JoinableQueue) is the
scheduler's job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sparkbm25 import catalog
from sparkbm25.build import BuildResult, build_index
from sparkbm25.config import IndexConfig


def next_generation(index_root: str) -> tuple[int, int]:
    """(next gen id, doc_ord base = docs so far).

    Dead generations (crashed builds, no _COMPLETE marker) don't count
    toward the doc_ord base — they are never read — but their ids are
    not reused either, so the next id is max over ALL gen dirs + 1."""
    all_gens = catalog.generation_dirs(index_root, include_dead=True)
    if all_gens == [index_root]:
        raise ValueError(
            f"{index_root} holds a single-shot index; use a fresh root "
            "for incremental generations")
    live = catalog.generation_dirs(index_root)
    if not all_gens:
        return 0, 0
    total = sum(catalog.read_stats(g)["n_docs"] for g in live)
    last = int(os.path.basename(all_gens[-1]).split("=")[1])
    return last + 1, total


def update_index(
    spark: SparkSession,
    new_transcripts: DataFrame,
    index_root: str,
    config: IndexConfig = IndexConfig(),
    input_desc: str = "",
) -> BuildResult:
    """Append one batch of transcripts as a new index generation.
    Crashed generations left by a dead builder are wiped first (resume
    path: the batch that died is simply re-appended)."""
    os.makedirs(index_root, exist_ok=True)
    import shutil

    live = set(catalog.generation_dirs(index_root))
    for g in catalog.generation_dirs(index_root, include_dead=True):
        if g != index_root and g not in live:
            shutil.rmtree(g, ignore_errors=True)
    gen_id, base = next_generation(index_root)
    gen_dir = os.path.join(index_root, f"gen={gen_id}")
    return build_index(
        spark, new_transcripts, gen_dir, config,
        input_desc=input_desc or f"gen{gen_id}",
        doc_ord_base=base,
    )


def stream_index(
    spark: SparkSession,
    input_path: str,
    index_root: str,
    config: IndexConfig = IndexConfig(),
    checkpoint: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """readStream(parquet dir) -> foreachBatch(update_index).

    available_now=True drains what exists and stops (batch-incremental
    refresh); False runs continuously. Returns the StreamingQuery.
    """
    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        update_index(spark, batch_df, index_root, config,
                     input_desc=f"stream_batch_{batch_id}")

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
