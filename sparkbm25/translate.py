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


class PipelineInterpreter:
    """Multi-hop interpreter composition: folds translate_batch through
    a sequence of registered interpreters — the engine analog of the
    reference translating through an intermediary language pair
    (apertium.py:105-114 pairs_pipeline; translate() pipes the text
    through each pair sequentially). The composed pipeline is itself an
    Interpreter, so the whole index job (resume gate, mapInPandas
    model-map, nested-array write-back) runs unchanged — the hops
    execute inside ONE Arrow batch pass, not one job per hop."""

    def __init__(self, steps: list[Interpreter], name: str | None = None):
        if not steps:
            raise ValueError("PipelineInterpreter needs at least one step")
        self.steps = list(steps)
        self.name = name or "+".join(s.name for s in self.steps)

    def translate_batch(self, texts: pd.Series) -> pd.Series:
        for step in self.steps:
            texts = step.translate_batch(texts)
        return texts


# ---------------------------------------------------------------------------
# language-pair graph: intermediary search (SURVEY J3's documented
# driver-side idiom — the graph is tiny, never a DataFrame)
# ---------------------------------------------------------------------------


def lang_tree(lang: str, pairs: list[list[str]], depth: int = 2) -> dict:
    """Tree of language connections reachable from `lang` through the
    available pairs (reference apertium.py:264-280, byte-for-byte
    semantics: a pair is an undirected edge; children keep the pairs'
    list order; recursion bounded by depth)."""
    tree: dict = {"lang": lang, "children": {}}
    for pair in pairs:
        if lang in pair and depth > 0:
            child_lang = next(item for item in pair if item != lang)
            tree["children"][child_lang] = lang_tree(child_lang, pairs, depth - 1)
    return tree


def leaf_has_lang(leaf: dict, lang: str) -> bool:
    """True when `lang` appears in the leaf's subtree (reference
    apertium.py leaf_has_lang)."""
    children = leaf["children"].values()
    return lang in leaf["children"] or any(
        leaf_has_lang(child, lang) for child in children)


def first_pairs_path(leaf: dict, lang: str) -> list[str]:
    """First DFS path (in child insertion order) from the tree root to
    `lang` (reference apertium.py first_pairs_path)."""
    path: list[str] = []
    for child_leaf in leaf["children"].values():
        if leaf_has_lang(child_leaf, lang):
            path.append(child_leaf["lang"])
            path = path + first_pairs_path(child_leaf, lang)
            break
    return path


def find_intermediary(source: str, target: str, pairs: list[str]) -> str:
    """Pick the intermediary language for an indirect translation: the
    first hop of the first source->target path in the pair graph — the
    reference's auto-selection (apertium.py:162-169: lang_tree over the
    remote pairs, then first_pairs_path(...)[0])."""
    trunk = [p.split("-") for p in pairs]
    tree = lang_tree(source, trunk)
    path = first_pairs_path(tree, target)
    if not path:
        raise ValueError(
            f"no path from {source!r} to {target!r} in the available pairs")
    return path[0]


def pairs_pipeline(source: str, target: str, available_pairs: list[str],
                   intermediary: str | None = None) -> list[str]:
    """The alpha-3 pair sequence a translation must hop through
    (reference apertium.py:105-114): the direct pair when available,
    else source->intermediary, intermediary->target, auto-selecting
    the intermediary from the pair graph when not given. Pairs are
    alpha-3 'src-tgt' codes (alpha.to_alpha_3_pair formatting)."""
    from sparkbm25.alpha import to_alpha_3, to_alpha_3_pair

    direct = to_alpha_3_pair(f"{source}-{target}")
    if intermediary is None and direct in available_pairs:
        return [direct]
    s3, t3 = to_alpha_3(source), to_alpha_3(target)
    if intermediary is None:
        intermediary = find_intermediary(s3, t3, available_pairs)
    i3 = to_alpha_3(intermediary)
    return [f"{s3}-{i3}", f"{i3}-{t3}"]


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
    # materialize the MT output ONCE: annotate_docs fires one action
    # per generation (key scan + block rewrite), and an uncached plan
    # re-executed the whole translate mapInPandas for each — ~2xG
    # full-corpus translations with a real backend (final-round
    # review). persist + count pins the translated rows first.
    updates = updates.persist()
    try:
        updates.count()
        return annotate_docs(spark, index_dir, updates, interpreter.name)
    finally:
        updates.unpersist()


def pending_turns(
    spark: SparkSession,
    index_dir: str,
    transcripts: DataFrame,
    interpreter: Interpreter,
    resume: bool = True,
) -> DataFrame:
    """The turns a translate run would process (the is_translated
    anti-join) — shared by the job and the CLI's --dry-run, so the
    dry-run count IS the real plan's count.

    Scoped to turns the INDEX actually holds (semi-join against the
    forward table keys): annotate_docs can only attach translations
    to indexed turns, so a transcripts table that grew past the index
    previously re-translated the unindexed tail on EVERY run and
    silently dropped the output — pending never reached zero
    (final-round review). Unindexed turns are simply not pending;
    re-index first, then translate."""
    from sparkbm25 import catalog

    indexed = (catalog.read_docs(spark, index_dir)
               .select("conv_id", "turn_idx"))
    scoped = transcripts.join(indexed, ["conv_id", "turn_idx"],
                              "left_semi")
    if not resume:
        return scoped
    done = (
        read_annotations(spark, index_dir)
        .where(F.col("name") == interpreter.name)
        .select("conv_id", "turn_idx")
    )
    return scoped.join(done, ["conv_id", "turn_idx"], "left_anti")
