"""Deterministic name normalization (janitor::make_clean_names parity).

The reference cleans every subject id, feature name, and path string through
janitor (reference: lib/tree.R:111, 229, 749, 910-911, 937-938). Outputs are
compared across train/test and across runs, so cleaning must be deterministic
and identical everywhere it is applied.

Semantics implemented (the subset janitor exercises on this data):
- lowercase
- any run of non-alphanumeric characters -> single underscore
- strip leading/trailing underscores
- names starting with a digit get an ``x`` prefix
- duplicates deduped with ``_2``, ``_3``, ... suffixes (first occurrence keeps
  the bare name)

Two surfaces: a driver-side pure-Python version for column names (tiny lists)
and a Spark Column expression for cleaning value columns at scale (no UDF —
regexp_replace chains stay inside whole-stage codegen).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def clean_name(name: str) -> str:
    """Clean one name (no dedup)."""
    s = _NON_ALNUM.sub("_", str(name).lower()).strip("_")
    if not s:
        s = "x"
    if s[0].isdigit():
        s = "x" + s
    return s


def clean_names(names: list[str]) -> list[str]:
    """Clean a list of names with janitor-style duplicate suffixing."""
    seen: dict[str, int] = {}
    out: list[str] = []
    for n in names:
        c = clean_name(n)
        if c in seen:
            seen[c] += 1
            out.append(f"{c}_{seen[c]}")
        else:
            seen[c] = 1
            out.append(c)
    return out


def clean_names_df(df, skip: tuple[str, ...] = ()):
    """Rename all columns of a DataFrame with clean_names (driver-side)."""
    cols = df.columns
    new = clean_names(cols)
    mapping = {old: (old if old in skip else nw) for old, nw in zip(cols, new)}
    return df.withColumnsRenamed(mapping)


def clean_entity(s: str) -> str:
    """Entity-id cleaning, EXACTLY mirrored by clean_entity_expr (the two are
    applied to the metadata side and the data side of the same join)."""
    return _NON_ALNUM.sub("_", str(s).lower()).strip("_")


def clean_entity_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c.cast("string")), r"[^a-z0-9]+", "_")
    return F.regexp_replace(cleaned, r"^_+|_+$", "")


def clean_value_col(col: Column | str, keep_pipe: bool = True) -> Column:
    """Spark expression cleaning a string VALUE column.

    Mirrors the reference's clade_name regex strip ``[^_|[:alnum:]]``
    (lib/tree.R:181): remove every char that is not alnum, underscore, or
    (optionally) the pipe path separator. Pure built-ins, codegen-friendly.
    """
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"[^_|a-zA-Z0-9]" if keep_pipe else r"[^_a-zA-Z0-9]"
    return F.regexp_replace(F.lower(c), pattern, "")
