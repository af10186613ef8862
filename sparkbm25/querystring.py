"""query_string parsing: structured predicates + full-text terms.

The reference hands Lucene query-string syntax straight to ES
(es_translator/es_translator.py:313-323; docs/usage.md:94-103 shows
"type:article AND status:published", docs/datashare.md:68
"type:Document AND language:FRENCH"). Here the structured part
becomes Catalyst predicates on the forward table (pushdown-friendly)
and the bare terms go to the BM25 engine; BM25 statistics stay
index-wide (ES semantics: a filter restricts candidates, it does not
re-scope idf/avgdl).

Supported v1 syntax:
    field:value          equality   (fields: role, tool, conv_id)
    field:prefix*        prefix match
    AND                  connective (implicit anyway; kept for parity
                         with the reference's examples)
    anything else        full-text term for BM25
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

FILTER_FIELDS = {"role", "tool", "conv_id"}
_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$")


@dataclass
class ParsedQuery:
    filters: list[tuple[str, str]] = field(default_factory=list)  # (field, value)
    text: str = ""

    @property
    def has_filters(self) -> bool:
        return bool(self.filters)


def parse_query_string(q: str) -> ParsedQuery:
    filters: list[tuple[str, str]] = []
    terms: list[str] = []
    for tok in (q or "").split():
        if tok.upper() == "AND":
            continue
        m = _FIELD_RE.match(tok)
        if m and m.group(1).lower() in FILTER_FIELDS:
            filters.append((m.group(1).lower(), m.group(2)))
        else:
            terms.append(tok)
    return ParsedQuery(filters=filters, text=" ".join(terms))


def filter_condition(filters: list[tuple[str, str]]) -> Column:
    """AND of the structured predicates, as a Catalyst column over the
    forward table (columns: conv_id, turn_idx, role, tool)."""
    cond = F.lit(True)
    for fld, val in filters:
        if val.endswith("*"):
            cond = cond & F.col(fld).startswith(val[:-1])
        else:
            cond = cond & (F.col(fld) == val)
    return cond
