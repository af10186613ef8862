"""Partial-update sink: append derived values to a nested array column
of the forward table, keyed by (conv_id, turn_idx).

This is the engine analog of the reference's core write — an
update-by-id that APPENDS a struct to the nested `content_translated`
array of an existing ES document, keyed by (index, id, routing) with
concurrent writers (es_translator/es.py:92-129). Here:

  * the nested column is `annotations: array<struct<name,value>>` on
    the forward (docs) table;
  * the merge is a broadcast-friendly left join + conditional
    array_append — one pass over the table, no read-modify-write per
    row;
  * the commit is the index's atomic staging rename (catalog), so a
    crashed annotate never leaves a half-written docs table. On an
    Iceberg/Delta catalog the identical plan is `MERGE INTO ... WHEN
    MATCHED THEN UPDATE SET annotations = array_append(...)`, and only
    the partitions containing matched keys rewrite; plain parquet has
    no partition-level upsert, so each generation's docs table
    rewrites whole (bounded: generations are append-batches, so at
    100 TB you annotate the generations the keys live in, not the
    world).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from sparkbm25 import catalog

ANNOTATION_TYPE = ArrayType(StructType([
    StructField("name", StringType()),
    StructField("value", StringType()),
]))


def repair_annotate_swap(gen_dir: str) -> list[str]:
    """Close the per-block swap's crash window (ADVICE r3): a crash
    between `rename(dst -> old_root)` and `rename(src -> dst)` leaves
    a doc_block partition absent from the forward table, with the only
    copy sitting in the docs_annotate_old aside dir. On the next
    annotate (or an explicit repair call) any aside block whose
    partition is MISSING from docs/ is moved back; aside blocks whose
    partition exists are leftovers of a crash AFTER the new data
    landed and are simply dropped. Returns the restored block dirs."""
    import shutil

    docs_path = catalog.docs_dir(gen_dir)
    old_root = catalog.staging_dir(gen_dir, "docs_annotate_old")
    restored: list[str] = []
    if os.path.isdir(old_root):
        for d in os.listdir(old_root):
            if not d.startswith("doc_block="):
                continue
            dst = os.path.join(docs_path, d)
            if not os.path.exists(dst):
                os.rename(os.path.join(old_root, d), dst)
                restored.append(d)
        shutil.rmtree(old_root, ignore_errors=True)
    # a half-written staging dir from a crashed annotate is garbage
    shutil.rmtree(catalog.staging_dir(gen_dir, "docs_annotate"),
                  ignore_errors=True)
    return restored


def annotate_docs(
    spark: SparkSession,
    index_dir: str,
    updates: DataFrame,
    name: str,
    value_col: str = "value",
) -> int:
    """Append {name, value} to the `annotations` array of every doc
    matched by `updates` (conv_id, turn_idx, <value_col>). Returns the
    number of rows annotated. Unmatched docs keep their annotations.

    Partial by construction: the forward table is partitioned by
    doc_block (doc_ord range), so only the blocks that actually contain
    matched keys are rewritten — the untouched partitions' files are
    never read back or re-written (the parquet equivalent of Iceberg's
    MERGE INTO touching only matching data files). Each rewritten block
    commits via an atomic per-partition staging rename."""
    import os
    import shutil

    upd = updates.select(
        F.col("conv_id").cast("string").alias("_u_conv_id"),
        F.col("turn_idx").cast("int").alias("_u_turn_idx"),
        F.col(value_col).cast("string").alias("_u_value"),
    )
    # key dedup BEFORE the merge (ADVICE r2): caller-supplied frames may
    # carry duplicate (conv_id, turn_idx) rows, and a plain left join
    # would multiply forward-table rows — permanent doc_ord duplication.
    # Policy: ALL values append, in deterministic (sorted) order.
    upd = (
        upd.where(F.col("_u_value").isNotNull())
        .groupBy("_u_conv_id", "_u_turn_idx")
        .agg(F.array_sort(F.collect_list("_u_value")).alias("_u_values"))
    )
    n_updated = 0
    for gen in catalog.generation_dirs(index_dir):
        docs_path = catalog.docs_dir(gen)
        repair_annotate_swap(gen)
        docs = spark.read.parquet(docs_path)
        if "annotations" not in docs.columns:
            docs = docs.withColumn(
                "annotations", F.lit(None).cast(ANNOTATION_TYPE))
        # locate the affected doc_blocks + the matched-row count in one
        # pruned-column scan (only the join keys + partition column are
        # read; the annotations/blocks bytes never move)
        keys = upd.select("_u_conv_id", "_u_turn_idx").distinct()
        per_block = (
            docs.select("conv_id", "turn_idx", "doc_block")
            .join(F.broadcast(keys),
                  (F.col("conv_id") == F.col("_u_conv_id"))
                  & (F.col("turn_idx") == F.col("_u_turn_idx")),
                  "left_semi")
            .groupBy("doc_block").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        affected = sorted(r["doc_block"] for r in per_block)
        n_updated += sum(int(r["n"]) for r in per_block)
        if not affected:
            continue
        sub = docs.where(F.col("doc_block").isin(affected))
        joined = sub.join(
            upd,
            (sub["conv_id"] == upd["_u_conv_id"])
            & (sub["turn_idx"] == upd["_u_turn_idx"]),
            "left",
        )
        base = F.coalesce(F.col("annotations"),
                          F.array().cast(ANNOTATION_TYPE))
        merged = joined.select(
            *[c for c in docs.columns if c != "annotations"],
            F.when(
                F.col("_u_values").isNotNull(),
                F.concat(
                    base,
                    F.transform(
                        F.col("_u_values"),
                        lambda v: F.struct(F.lit(name).alias("name"),
                                           v.alias("value")))),
            ).otherwise(base).alias("annotations"),
        )
        staging = catalog.staging_dir(gen, "docs_annotate")
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").partitionBy("doc_block").parquet(staging)
        # per-partition swap, crash-safe (ADVICE r2): the old block dir
        # is MOVED aside (one rename), never deleted before its
        # replacement lands. A crash between the two renames leaves the
        # block's only copy in the aside dir; repair_annotate_swap
        # (run at the top of every annotate) moves it back, so no data
        # is ever lost and the gap lasts only until the next
        # annotate/repair (ADVICE r3). The aside dir lives under
        # _staging (outside docs_path) so partition discovery never
        # sees it.
        old_root = catalog.staging_dir(gen, "docs_annotate_old")
        shutil.rmtree(old_root, ignore_errors=True)
        os.makedirs(old_root, exist_ok=True)
        for blk in affected:
            src = os.path.join(staging, f"doc_block={blk}")
            dst = os.path.join(docs_path, f"doc_block={blk}")
            if os.path.exists(dst):
                os.rename(dst, os.path.join(old_root, f"doc_block={blk}"))
            os.rename(src, dst)
        shutil.rmtree(old_root, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)
    return n_updated


def read_annotations(spark: SparkSession, index_dir: str) -> DataFrame:
    """(conv_id, turn_idx, name, value) — the exploded nested array."""
    docs = catalog.read_docs(spark, index_dir)
    if "annotations" not in docs.columns:
        return spark.createDataFrame(
            [], "conv_id string, turn_idx int, name string, value string")
    return (
        docs.select("conv_id", F.col("turn_idx").cast("int").alias("turn_idx"),
                    F.explode("annotations").alias("a"))
        .select("conv_id", "turn_idx", "a.name", "a.value")
    )
