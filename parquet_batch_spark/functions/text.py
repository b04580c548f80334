"""Text primitives shared by the text-analysis and dedup operators.

All JVM-side (split/regexp/transform) — no Python UDFs — so they stay
inside whole-stage codegen and scale linearly with executors. Each
primitive has an exact DuckDB SQL mirror for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS = r"\s+"


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization; trims first so no empty edge tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), WS)


def shingles_col(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingles: space-joined sliding windows of k tokens.

    Documents shorter than k tokens yield a single shingle of the whole
    text so they still participate in dedup.
    """
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.when(n >= k, windows).otherwise(whole)


# ---- Oracle-side (DuckDB) SQL mirrors ----

def sql_tokens(expr: str) -> str:
    return f"string_split_regex(trim({expr}), '\\s+')"


def sql_shingles(toks_expr: str, k: int = 3) -> str:
    """DuckDB mirror of shingles_col (1-based inclusive list slicing)."""
    return (
        f"CASE WHEN len({toks_expr}) >= {k} THEN "
        f"list_transform(generate_series(1, len({toks_expr}) - {k - 1}), "
        f"i -> array_to_string(({toks_expr})[i:i+{k - 1}], ' ')) "
        f"ELSE [array_to_string({toks_expr}, ' ')] END"
    )
