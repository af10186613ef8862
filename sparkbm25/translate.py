"""The reference's actual job, natively: translate a text field and
write the result back as a nested-array annotation, idempotently.

es-translator's pipeline is: scroll the index (S1) -> skip documents
already carrying this interpreter's translation (F2, `is_translated`,
es_translator/es_translator.py:168-178) -> per-row translate through a
pluggable interpreter (P1/P8, interpreters/abstract.py:158-171;
Apertium/Argos subclasses load a model once per worker) -> append a
struct to the document's `content_translated` array (S5/P4,
es_translator/es.py:92-129).

Here the same flow is: forward-table anti-join on existing annotations
-> mapInPandas iterator transform (interpreter initialized ONCE per
partition — the model-map pattern; real MT models slot into
`Interpreter.translate_batch` without touching the plan) ->
annotate_docs partial write-back (only affected doc_blocks rewrite).

The bundled interpreter is a deterministic stub (token reversal) so
the whole pipeline is SQL-oracle checkable; an Apertium/Argos/LLM
interpreter is one class with the same two members.
"""

from __future__ import annotations

from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkbm25.analysis import tokenize_series
from sparkbm25.annotate import annotate_docs, read_annotations


class Interpreter(Protocol):
    """The AbstractInterpreter surface (interpreters/abstract.py):
    a name (the annotation key, like the reference's translator+lang
    pair) and a batch translate."""

    name: str

    def translate_batch(self, texts: pd.Series) -> pd.Series: ...


class ReverseTokenInterpreter:
    """Deterministic stub translator: every [a-z0-9]+ token reversed,
    joined by single spaces (SQL-reproducible: list_transform(toks,
    reverse)). Stands in for Apertium/Argos — swap the body, keep the
    plan."""

    name = "rev"

    def translate_batch(self, texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)
        return toks.map(lambda ts: " ".join(t[::-1] for t in ts))


class ApertiumInterpreter:
    """Registry slot for the reference's Apertium backend
    (es_translator/interpreters/apertium.py). The apertium runtime is
    not installed in this environment; constructing the class says so
    explicitly instead of failing mid-job. A real deployment replaces
    __init__ with the model load and translate_batch with the
    subprocess/pipe call — the Spark plan (mapInPandas, once-per-task
    init) is unchanged."""

    name = "apertium"

    def __init__(self) -> None:
        raise NotImplementedError(
            "the apertium runtime is not available in this environment; "
            "use --interpreter rev or register a backend via "
            "register_interpreter()")

    def translate_batch(self, texts: pd.Series) -> pd.Series:  # pragma: no cover
        raise NotImplementedError


class ArgosInterpreter:
    """Registry slot for the reference's Argos backend
    (es_translator/interpreters/argos.py); same contract as
    ApertiumInterpreter."""

    name = "argos"

    def __init__(self) -> None:
        raise NotImplementedError(
            "argos-translate is not available in this environment; "
            "use --interpreter rev or register a backend via "
            "register_interpreter()")

    def translate_batch(self, texts: pd.Series) -> pd.Series:  # pragma: no cover
        raise NotImplementedError


# name -> class registry (the reference validates --interpreter against
# its (Apertium, Argos) tuple, es_translator/cli.py:60-83; ours is
# open for extension)
INTERPRETERS: dict[str, type] = {
    ReverseTokenInterpreter.name: ReverseTokenInterpreter,
    ApertiumInterpreter.name: ApertiumInterpreter,
    ArgosInterpreter.name: ArgosInterpreter,
}


def register_interpreter(cls: type) -> type:
    """Register an interpreter class under its `name` attribute."""
    INTERPRETERS[cls.name.lower()] = cls
    return cls


def get_interpreter(name: str) -> type:
    """name -> class, with the reference's validation error shape
    (es_translator/cli.py:81-83)."""
    try:
        return INTERPRETERS[name.lower()]
    except KeyError:
        raise ValueError(
            "must be a valid interpreter name "
            f"({', '.join(sorted(INTERPRETERS))})") from None


def translate_turns(
    transcripts: DataFrame,
    interpreter: Interpreter,
    text_col: str = "text",
    out_col: str = "translation",
) -> DataFrame:
    """Per-row transform through the interpreter, Arrow-batched with
    once-per-partition initialization (the reference loads the MT model
    once per Celery worker; here once per task)."""
    cols = transcripts.columns

    def run(batches):
        # interpreter state initializes lazily on the first batch —
        # the per-worker model-load point for a real MT backend
        interp = interpreter
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = interp.translate_batch(pdf[text_col])
            yield out

    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in transcripts.schema.fields)
    return transcripts.mapInPandas(run, schema=f"{ddl}, {out_col} string")


def translate_into_index(
    spark: SparkSession,
    index_dir: str,
    transcripts: DataFrame,
    interpreter: Interpreter,
    resume: bool = True,
) -> int:
    """The full reference job: translate every turn not yet carrying
    this interpreter's annotation and append {name, translation} to the
    forward table. Returns the number of newly translated turns.

    resume=True is the is_translated gate: turns whose annotations
    already contain the interpreter's name are anti-joined away, so
    re-running after a crash (or on a grown corpus) only processes the
    remainder — byte-identical semantics to the reference's skip
    predicate (es_translator.py:168-178)."""
    pending = pending_turns(spark, index_dir, transcripts, interpreter,
                            resume=resume)
    translated = translate_turns(pending, interpreter)
    updates = translated.select(
        "conv_id", "turn_idx", F.col("translation").alias("value"))
    return annotate_docs(spark, index_dir, updates, interpreter.name)


def pending_turns(
    spark: SparkSession,
    index_dir: str,
    transcripts: DataFrame,
    interpreter: Interpreter,
    resume: bool = True,
) -> DataFrame:
    """The turns a translate run would process (the is_translated
    anti-join) — shared by the job and the CLI's --dry-run, so the
    dry-run count IS the real plan's count."""
    if not resume:
        return transcripts
    done = (
        read_annotations(spark, index_dir)
        .where(F.col("name") == interpreter.name)
        .select("conv_id", "turn_idx")
    )
    return transcripts.join(done, ["conv_id", "turn_idx"], "left_anti")
