"""Name/metadata predicates: boolean Columns over the node-name column
(``url`` in the document table).

These re-express the reference's path predicates (SURVEY.md §2.4;
reference src/DataCurator.jl:3161-3302) as native Column expressions.
Regex-extraction helpers mirror ``read_int``/``read_float``
(src/DataCurator.jl:3290-3302, float regex ``FR`` at :3158) with
null-on-no-match semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

FLOAT_RE = r"[-+]?[0-9]*\.?[0-9]+([eE][-+]?[0-9]+)?"


# --- string shape ----------------------------------------------------------


def startswith(col: Column, prefix: str, regex: bool = False) -> Column:
    return col.rlike("^" + prefix) if regex else col.startswith(prefix)


def endswith(col: Column, suffix: str, regex: bool = False) -> Column:
    return col.rlike(suffix + "$") if regex else col.endswith(suffix)


def contains(col: Column, pat: str, regex: bool = False) -> Column:
    return col.rlike(pat) if regex else col.contains(pat)


def integer_name(col: Column) -> Column:
    """Entire (extension-stripped) last path component is an integer."""
    base = stem(col)
    return base.rlike(r"^[0-9]+$")


def ends_with_integer(col: Column) -> Column:
    return col.rlike(r"[0-9]+$")


def begins_with_integer(col: Column) -> Column:
    return basename(col).rlike(r"^[0-9]")


def contains_integer(col: Column) -> Column:
    return col.rlike(r"[0-9]")


def has_float_in_name(col: Column) -> Column:
    return col.rlike(FLOAT_RE)


def filename_ends_with_integer(col: Column) -> Column:
    return stem(col).rlike(r"[0-9]+$")


def is_lower(col: Column) -> Column:
    return col == F.lower(col)


def is_upper(col: Column) -> Column:
    return col == F.upper(col)


def has_lower(col: Column) -> Column:
    return col.rlike("[a-z]")


def has_upper(col: Column) -> Column:
    return col.rlike("[A-Z]")


def has_whitespace(col: Column) -> Column:
    # reference treats comma and tab as whitespace too
    # (src/DataCurator.jl:3177-3179). The class is spelled explicitly
    # (repo rule): Java \s == [ \t\n\x0b\f\r], but RE2 (DuckDB) excludes
    # \x0b from \s — explicit classes keep all engines value-identical.
    return col.rlike("[ \t\n\x0b\f\r,]")


def is_hidden(col: Column) -> Column:
    return basename(col).startswith(".")


def not_hidden(col: Column) -> Column:
    return ~is_hidden(col)


# --- path components -------------------------------------------------------


def basename(col: Column) -> Column:
    return F.element_at(F.split(col, "/"), -1)


def stem(col: Column) -> Column:
    """Basename without the final .extension."""
    return F.regexp_replace(basename(col), r"\.[^.]*$", "")


def extension(col: Column) -> Column:
    b = basename(col)
    return F.when(b.rlike(r"\.[^.]+$"), F.regexp_extract(b, r"\.([^.]+)$", 1)).otherwise(
        F.lit("")
    )


def file_extension_one_of(col: Column, exts: list[str]) -> Column:
    return F.lower(extension(col)).isin([e.lower().lstrip(".") for e in exts])


def is_type_file(col: Column, ext: str) -> Column:
    return F.lower(extension(col)) == ext.lower().lstrip(".")


# --- numeric extraction (read_int / read_float analogues) -------------------


def read_int(col: Column) -> Column:
    """First integer anywhere in the name; null when absent."""
    m = F.regexp_extract(col, r"([0-9]+)", 1)
    return F.when(m != "", m.cast("long"))


def read_float(col: Column) -> Column:
    m = F.regexp_extract(col, f"({FLOAT_RE})", 1)
    return F.when(m != "", m.cast("double"))


def read_postfix_int(col: Column) -> Column:
    m = F.regexp_extract(stem(col), r"([0-9]+)$", 1)
    return F.when(m != "", m.cast("long"))


def read_prefix_int(col: Column) -> Column:
    m = F.regexp_extract(basename(col), r"^([0-9]+)", 1)
    return F.when(m != "", m.cast("long"))


# --- sizes ------------------------------------------------------------------

_SIZE_UNITS = {"b": 1, "kb": 2**10, "mb": 2**20, "gb": 2**30, "tb": 2**40}


def descriptive_size(s: str | int | float) -> int:
    """'10GB' -> bytes. The reference's parser has a bug (MB multiplies by
    2^30, src/DataCurator.jl:2094-2108); we implement the intended
    semantics, not the bug (SURVEY.md §1.2)."""
    if isinstance(s, (int, float)):
        return int(s)
    m = re.fullmatch(r"\s*([0-9]*\.?[0-9]+)\s*([kKmMgGtT]?[bB])?\s*", s)
    if not m:
        raise ValueError(f"unparseable size: {s!r}")
    num = float(m.group(1))
    unit = (m.group(2) or "b").lower()
    return int(num * _SIZE_UNITS[unit])


def size_col(html: Column, text: Column) -> Column:
    """Document payload size in bytes: html length when present, else the
    UTF-8 text length."""
    return F.coalesce(F.length(html), F.octet_length(text), F.lit(0)).cast("long")
