"""ISO-639 language-code normalization (SURVEY P5).

The reference converts between alpha-2 / alpha-3 codes and language
names via pycountry (es_translator/alpha.py:12-80) to wire
user-supplied language pairs into interpreter model names
(`to_alpha_3_pair('fr-en') -> 'fra-eng'`). Engine analog: a STATIC
table — no pycountry dependency — exposed two ways:

  * driver-side converters (`to_alpha_2/to_alpha_3/to_name/
    to_alpha_3_pair`) with the reference's exact surface and
    `InvalidLanguageCode` error;
  * Catalyst column transforms (`alpha2_col/alpha3_col/name_col`)
    built as literal map expressions — a ~50-entry map folds into the
    plan, so at 100 TB the conversion is a shuffle-free, codegen'd
    projection (the "tiny broadcast map" of SURVEY P5, except the map
    is small enough to be a plan literal, cheaper than a broadcast).

Unknown codes map to NULL in the column form (DataFrames should not
throw per-row) and raise in the scalar form (reference parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (alpha_2, alpha_3, name) — ISO 639-1 / 639-2T codes for the languages
# the reference's interpreters ship models for, plus common web langs.
# This is an explicit SUPPORTED-LANGUAGE SUBSET, not the full ISO
# table the reference gets from pycountry (ADVICE r3): a valid ISO
# code outside it (e.g. 'sr', 'fy', 'az') raises InvalidLanguageCode
# when a conversion is required, while codes already in the requested
# format pass through unvalidated exactly like the reference. Extend
# the table to widen support; supported_codes() enumerates it.
LANGUAGES: list[tuple[str, str, str]] = [
    ("ar", "ara", "Arabic"),
    ("bg", "bul", "Bulgarian"),
    ("bn", "ben", "Bengali"),
    ("ca", "cat", "Catalan"),
    ("cs", "ces", "Czech"),
    ("da", "dan", "Danish"),
    ("de", "deu", "German"),
    ("el", "ell", "Greek"),
    ("en", "eng", "English"),
    ("eo", "epo", "Esperanto"),
    ("es", "spa", "Spanish"),
    ("et", "est", "Estonian"),
    ("eu", "eus", "Basque"),
    ("fa", "fas", "Persian"),
    ("fi", "fin", "Finnish"),
    ("fr", "fra", "French"),
    ("ga", "gle", "Irish"),
    ("gl", "glg", "Galician"),
    ("he", "heb", "Hebrew"),
    ("hi", "hin", "Hindi"),
    ("hr", "hrv", "Croatian"),
    ("hu", "hun", "Hungarian"),
    ("id", "ind", "Indonesian"),
    ("is", "isl", "Icelandic"),
    ("it", "ita", "Italian"),
    ("ja", "jpn", "Japanese"),
    ("ko", "kor", "Korean"),
    ("lt", "lit", "Lithuanian"),
    ("lv", "lav", "Latvian"),
    ("ms", "msa", "Malay"),
    ("nl", "nld", "Dutch"),
    ("no", "nor", "Norwegian"),
    ("pl", "pol", "Polish"),
    ("pt", "por", "Portuguese"),
    ("ro", "ron", "Romanian"),
    ("ru", "rus", "Russian"),
    ("sk", "slk", "Slovak"),
    ("sl", "slv", "Slovenian"),
    ("sv", "swe", "Swedish"),
    ("sw", "swa", "Swahili"),
    ("ta", "tam", "Tamil"),
    ("te", "tel", "Telugu"),
    ("th", "tha", "Thai"),
    ("tr", "tur", "Turkish"),
    ("uk", "ukr", "Ukrainian"),
    ("ur", "urd", "Urdu"),
    ("vi", "vie", "Vietnamese"),
    ("zh", "zho", "Chinese"),
]

_A2_TO_A3 = {a2: a3 for a2, a3, _ in LANGUAGES}
_A3_TO_A2 = {a3: a2 for a2, a3, _ in LANGUAGES}
_A2_TO_NAME = {a2: name for a2, _, name in LANGUAGES}


def supported_codes() -> set[str]:
    """Every alpha-2 and alpha-3 code the static table can convert."""
    return set(_A2_TO_A3) | set(_A3_TO_A2)


class InvalidLanguageCode(ValueError):
    """Reference parity: es_translator/alpha.py:4-9."""

    def __init__(self, code: str) -> None:
        super().__init__(f"Invalid language code: {code!r}")
        self.code = code


def to_alpha_2(code: str) -> str:
    """alpha-3 -> alpha-2 (ref alpha.py:12-29). Reference semantics
    EXACTLY (ADVICE r3): a code that is not 3 chars long passes
    through UNVALIDATED — the reference only consults pycountry when a
    conversion is actually needed, so e.g. to_alpha_2('sr') == 'sr'
    even though 'sr' is outside SUPPORTED_LANGUAGES. Only 3-letter
    codes the table cannot convert raise. The pass-through returns the
    ORIGINAL input (to_alpha_2('FR') == 'FR', not 'fr') — the
    reference never touches a code it doesn't convert (ADVICE r4)."""
    c = (code or "").lower()
    if len(c) == 3:
        if c not in _A3_TO_A2:
            raise InvalidLanguageCode(code)
        return _A3_TO_A2[c]
    return code or ""


def to_alpha_3(code: str) -> str:
    """alpha-2 -> alpha-3 (ref alpha.py:32-49). Like the reference, a
    code that is not 2 chars long passes through UNVALIDATED (see
    to_alpha_2); only 2-letter codes outside the static table raise —
    which is STRICTER than the reference for valid ISO codes we don't
    carry (e.g. 'fy'): the reference covers the full pycountry table,
    this engine the SUPPORTED_LANGUAGES subset below. Pass-through
    returns the ORIGINAL input unchanged (see to_alpha_2)."""
    c = (code or "").lower()
    if len(c) == 2:
        if c not in _A2_TO_A3:
            raise InvalidLanguageCode(code)
        return _A2_TO_A3[c]
    return code or ""


def to_name(alpha_2: str) -> str:
    """alpha-2 -> language name (ref alpha.py:52-66)."""
    c = (alpha_2 or "").lower()
    if c not in _A2_TO_NAME:
        raise InvalidLanguageCode(alpha_2)
    return _A2_TO_NAME[c]


def to_alpha_3_pair(pair: str) -> str:
    """'fr-en' -> 'fra-eng' (ref alpha.py:69-80): the interpreter
    model-name wiring."""
    source, target = pair.split("-")
    return f"{to_alpha_3(source)}-{to_alpha_3(target)}"


def _map_col(mapping: dict[str, str], col) -> Column:
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    lit = F.create_map(
        *[F.lit(x) for kv in mapping.items() for x in kv])
    return F.element_at(lit, c)


def alpha3_col(col) -> Column:
    """Column form: alpha-2 code column -> alpha-3 (NULL if unknown)."""
    return _map_col(_A2_TO_A3, col)


def alpha2_col(col) -> Column:
    """Column form: alpha-3 code column -> alpha-2 (NULL if unknown)."""
    return _map_col(_A3_TO_A2, col)


def name_col(col) -> Column:
    """Column form: alpha-2 code column -> language name."""
    return _map_col(_A2_TO_NAME, col)


def case_sql(col: str, kind: str = "alpha3") -> str:
    """The equivalent ANSI-SQL CASE expression (for the DuckDB oracle):
    generated from the SAME static table, so engine and oracle agree by
    construction."""
    mapping = {"alpha3": _A2_TO_A3, "alpha2": _A3_TO_A2,
               "name": _A2_TO_NAME}[kind]
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(mapping.items()))
    return f"CASE lower({col}) {whens} END"
