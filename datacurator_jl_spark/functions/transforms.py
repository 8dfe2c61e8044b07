"""Name/content transforms as native Column expressions.

Reference: name transforms (SURVEY.md §2.6; src/DataCurator.jl:1946-2015,
2842-2849, 3743-3760) compose left-to-right via ``collapse_functions``
(src/DataCurator.jl:1919-1924). Here each is a Column->Column function;
the engine folds chains with ``functools.reduce`` in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datacurator_jl_spark.functions.predicates import basename


def whitespace_to(col: Column, repl: str) -> Column:
    # reference replaces [\s,\t] (src/DataCurator.jl:3177-3179)
    return F.regexp_replace(col, r"[\s,\t]", repl)


def tolowercase(col: Column) -> Column:
    return F.lower(col)


def touppercase(col: Column) -> Column:
    return F.upper(col)


def replace_pattern(col: Column, pat: str, repl: str) -> Column:
    return F.regexp_replace(col, pat, repl)


def remove_pattern(col: Column, pat: str) -> Column:
    return F.regexp_replace(col, pat, "")


def remove_from_to_inclusive(col: Column, frm: str, to: str) -> Column:
    """Cut [frm..to] (both patterns removed). Non-greedy middle."""
    return F.regexp_replace(col, f"{frm}.*?{to}", "")


def remove_from_to_exclusive(col: Column, frm: str, to: str) -> Column:
    """Cut the span strictly between frm and to, keeping both markers."""
    return F.regexp_replace(col, f"({frm}).*?({to})", "$1$2")


def remove_from_to_extension_inclusive(col: Column, frm: str) -> Column:
    """Cut from pattern up to (not including) the final .extension."""
    return F.regexp_replace(col, f"{frm}[^.]*(\\.[^.]*)$", "$1")


def remove_from_to_extension_exclusive(col: Column, frm: str) -> Column:
    """Cut AFTER the pattern up to (not including) the final .extension,
    keeping the pattern itself (reference ``inclusive_first=false``:
    ``PRE = FN[1:B.stop]``, src/DataCurator.jl:1977-2000)."""
    return F.regexp_replace(col, f"({frm})[^.]*(\\.[^.]*)$", "$1$2")


def apply_to(col: Column, inner) -> Column:
    """Apply ``inner`` (Column->Column) to the LAST path component only,
    keeping the directory part (reference apply_to base=true,
    src/DataCurator.jl:3311-3319)."""
    dirpart = F.regexp_replace(col, r"[^/]*$", "")
    return F.concat(dirpart, inner(basename(col)))


def prefixfilename(col: Column, prefix: str) -> Column:
    """Prepend prefix to the last path component only."""
    return F.regexp_replace(col, r"([^/]+)$", prefix + "$1")


def postfixfilename(col: Column, postfix: str) -> Column:
    """Append postfix to the stem, before the extension."""
    return F.regexp_replace(col, r"([^/.]+)(\.[^./]*)?$", "$1" + postfix + "$2")


def change_path(col: Column, old: str, new: str) -> Column:
    """Re-root: replace leading ``old`` prefix with ``new``."""
    return F.when(
        col.startswith(old),
        F.concat(F.lit(new), col.substr(F.lit(len(old) + 1), F.length(col))),
    ).otherwise(col)


def flatten_to(col: Column, new_root: str) -> Column:
    """Flatten: new_root/basename."""
    sep = "" if new_root.endswith("/") else "/"
    return F.concat(F.lit(new_root + sep), basename(col))


def normalize_whitespace(col: Column) -> Column:
    """Collapse runs of whitespace to single spaces and trim."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def normalize_unicode_punct(col: Column) -> Column:
    """Map common unicode punctuation to ASCII (deterministic translate)."""
    return F.translate(col, "‘’“”–— ", "''\"\"--  ")


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization (UAX #15 canonical composition) — the
    standard web-text pre-pass that collapses combining sequences
    (``e`` + U+0301 -> single-codepoint e-acute) so downstream
    hashing/dedup/tokenization see one canonical byte form. Spark has no
    native normalizer, so this is one Arrow-batched pandas UDF over
    ``unicodedata.normalize`` (CPython's normalizer implements the same
    UAX #15 tables as DuckDB's ``nfc_normalize``, the oracle twin —
    d41). Null-safe."""
    import unicodedata

    @F.pandas_udf("string")
    def _nfc(s):
        return s.map(
            lambda t: unicodedata.normalize("NFC", t)
            if isinstance(t, str)
            else None
        )

    return _nfc(col)
