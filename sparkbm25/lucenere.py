"""Lucene RegExp dialect -> portable-regex translation.

Lucene regexp queries (the `/pattern/` leaves of ES query_string —
the syntax the reference forwards verbatim to ES,
es_translator/es_translator.py:313-323) are parsed by
org.apache.lucene.util.automaton.RegExp, a dialect that differs from
Java regex (Spark `rlike`), Python `re` (querystring.python_filter)
and RE2 (the DuckDB oracle) in ways that silently change results if
the pattern is handed to any of them raw — exactly the
silent-misparse class this engine's grammar bans (VERDICT r4 item 1):

  * ``\\d`` / ``\\w`` / ``\\s`` are the LITERAL characters d/w/s —
    Lucene's backslash only ever means "the next character is
    literal" — while Java/Python/RE2 read character classes;
  * ``^`` and ``$`` are literal characters (Lucene regexps are
    implicitly anchored, there is nothing to anchor) while the regex
    dialects read anchors;
  * ``.`` matches ANY character including newline; the regex
    dialects' default ``.`` excludes newlines;
  * inside ``[...]`` Java reads ``[a[b]]`` as a NESTED class and
    ``&&`` as class intersection; Lucene reads literal ``[``/``&``;
  * the operators ES enables by default (RegExp flags=ALL): ``~``
    complement, ``&`` intersection, ``<n-m>`` numeric interval,
    ``@`` any-string, ``#`` empty-language. ``@``/``#`` have exact
    regex equivalents and translate; ``~``/``&``/``<n-m>`` need
    automaton arithmetic and RAISE — never silently match as
    literals;
  * ``"..."`` is a quoted literal run (no escapes inside).

to_portable() compiles a Lucene pattern into a regex whose behavior
is IDENTICAL across Java regex, Python re and RE2, by construction:
the emitted constructs are limited to escaped/plain literals,
``[...]`` classes whose only escapes are ``\\s``/``\\S`` and
backslash-escaped punctuation, non-capturing ``(?:...)`` groups,
``|``, and the ``* + ? {n,m}`` quantifiers (stacked quantifiers are
group-wrapped so Java possessive ``*+`` / Python lazy ``??`` readings
can never arise). Callers wrap the result in ``^(?:...)$`` (or use
``fullmatch``) for Lucene's implicit anchoring.

Dialect-parity is pinned by tests/test_lucenere.py, which fullmatches
the same (pattern, candidate) grid through Python re, Spark rlike and
DuckDB regexp_matches and asserts three-way agreement.
"""

from __future__ import annotations

import re

# characters that are special in at least one target dialect and must
# be backslash-escaped when emitted as literals
_SPECIAL_OUT = set("\\^$.|?*+()[]{}")
# inside a character class: `]`/`\\`/leading `^` end or negate it in
# every dialect; `[` opens a NESTED class in Java; `&` doubles into
# Java's class intersection; `-` is handled positionally by the class
# parser (ranges stay raw, escaped `-` emits `\\-`)
_CLASS_SPECIAL = set("\\]^[&-")

_REPEAT_RE = re.compile(r"\{(\d+)(?:,(\d*))?\}")


def _lit(ch: str) -> str:
    return ("\\" + ch) if ch in _SPECIAL_OUT else ch


def _class_lit(ch: str) -> str:
    return ("\\" + ch) if ch in _CLASS_SPECIAL else ch


def to_portable(pat: str) -> str:
    """Translate a Lucene RegExp pattern (flags=ALL, the ES
    query_string default) to the portable dialect described in the
    module docstring. Raises ValueError on the operators with no
    regex equivalent (`~` complement, `&` intersection, `<n-m>`
    interval) and on malformed syntax — a Lucene query shape must
    work or raise, never silently re-read as something else."""
    out: list[str] = []
    # out-index where the current quantifiable unit starts, or None
    # right after `(`, `|`, or at the very start (quantifier illegal)
    unit_start: int | None = None
    quantified = False          # current unit already owns a quantifier
    group_starts: list[int] = []
    i, n = 0, len(pat)

    def err(msg: str):
        raise ValueError(f"Lucene regexp /{pat}/: {msg}")

    def begin_unit():
        nonlocal unit_start, quantified
        unit_start = len(out)
        quantified = False

    while i < n:
        ch = pat[i]
        if ch == "\\":
            # Lucene: backslash makes the NEXT char literal — always,
            # including letters (`\d` is a literal d, not a digit class)
            if i + 1 >= n:
                err("dangling backslash")
            begin_unit()
            out.append(_lit(pat[i + 1]))
            i += 2
            continue
        if ch == "~":
            err("the complement operator '~' has no regex equivalent "
                "(write \\~ for a literal tilde)")
        if ch == "&":
            err("the intersection operator '&' has no regex equivalent "
                "(write \\& for a literal ampersand)")
        if ch == "<":
            err("the numeric-interval operator <n-m> is not supported "
                "(write \\< for a literal '<')")
        if ch == "@":
            # any-string: (?s).* — spelled as a class so no dialect
            # flag is needed
            begin_unit()
            out.append("(?:[\\s\\S]*)")
            i += 1
            continue
        if ch == "#":
            # empty language: a class that matches no character —
            # valid (and never-matching) in all three dialects,
            # unlike lookahead `(?!)` which RE2 rejects
            begin_unit()
            out.append("[^\\s\\S]")
            i += 1
            continue
        if ch == ".":
            # Lucene `.` includes newlines; default `.` does not
            begin_unit()
            out.append("[\\s\\S]")
            i += 1
            continue
        if ch == '"':
            j = pat.find('"', i + 1)
            if j < 0:
                err("unterminated quoted literal")
            begin_unit()
            out.append("(?:" + "".join(_lit(c) for c in pat[i + 1:j]) + ")")
            i = j + 1
            continue
        if ch == "(":
            group_starts.append(len(out))
            out.append("(?:")
            unit_start = None
            quantified = False
            i += 1
            continue
        if ch == ")":
            if not group_starts:
                err("unbalanced ')'")
            unit_start = group_starts.pop()
            quantified = False
            out.append(")")
            i += 1
            continue
        if ch == "|":
            unit_start = None
            quantified = False
            out.append("|")
            i += 1
            continue
        if ch == "[":
            body: list[str] = []
            j = i + 1
            if j < n and pat[j] == "^":
                body.append("^")
                j += 1
            if j < n and pat[j] == "]":
                # leading `]` is literal in Lucene (and Python/Java,
                # but NOT portably in RE2) — emit escaped
                body.append("\\]")
                j += 1
            closed = False
            while j < n:
                c = pat[j]
                if c == "\\":
                    if j + 1 >= n:
                        err("dangling backslash in character class")
                    body.append(_class_lit(pat[j + 1]))
                    j += 2
                    continue
                if c == "]":
                    closed = True
                    j += 1
                    break
                if c == "-":
                    body.append("-")      # range / positional literal
                    j += 1
                    continue
                # raw char: escape the ones Java reads specially
                # inside classes (`[` nesting, `&&` intersection, `\`)
                body.append(("\\" + c) if c in "[&\\" else c)
                j += 1
            if not closed:
                err("unterminated character class")
            if not body or body == ["^"]:
                err("empty character class")
            begin_unit()
            out.append("[" + "".join(body) + "]")
            i = j
            continue
        if ch in "*+?" or ch == "{":
            if ch == "{":
                m = _REPEAT_RE.match(pat, i)
                if not m:
                    err("malformed {n}/{n,}/{n,m} repetition "
                        "(write \\{ for a literal brace)")
                if m.group(2) and int(m.group(2)) < int(m.group(1)):
                    err(f"repetition {m.group(0)} has max < min")
                q = m.group(0)
                i = m.end()
            else:
                q = ch
                i += 1
            if unit_start is None or unit_start >= len(out):
                err(f"quantifier {q!r} with nothing to repeat")
            if quantified:
                # stacked quantifiers: Lucene means (x*)+ — wrap, so
                # Java can't read possessive `*+` / Python lazy `??`
                seg = "".join(out[unit_start:])
                del out[unit_start:]
                out.append("(?:" + seg + ")")
            out.append(q)
            quantified = True
            continue
        # plain character — including `^`/`$`/`}` which Lucene treats
        # as literals but the regex dialects would read as anchors /
        # dangling repetition
        begin_unit()
        out.append(_lit(ch))
        i += 1
    if group_starts:
        err("unbalanced '('")
    return "".join(out)
