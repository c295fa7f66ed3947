"""Shared text-shaping column expressions (tokens, shingles, hashes).

All JVM-side built-ins — no UDFs. Every hash is md5-based so the DuckDB
oracle reproduces values exactly; min-hash comparisons operate on fixed-width
lowercase hex prefixes, where lexicographic order == numeric order, so
``MIN`` over strings is a valid min-hash without any hex->int conversion.
"""

from __future__ import annotations

from pyspark.sql import functions as F

TOKEN_SPLIT = " "


def tokens(col: str = "text") -> F.Column:
    """Whitespace tokens (the documents fixture is space-separated)."""
    return F.split(F.col(col), TOKEN_SPLIT)


def shingles(col: str = "text", k: int = 3) -> F.Column:
    """Distinct word k-gram shingles as an array<string> column."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(0, greatest(size(split({col}, ' ')) - {k}, 0)),"
            f" i -> concat_ws(' ', slice(split({col}, ' '), i + 1, {k})))"
        )
    )


def minhash_expr(i: int, shingle_col: str = "shingle") -> F.Column:
    """Min-hash component i: min over shingles of an 8-hex-char md5 prefix.

    Family of hash functions = md5 salted with the component index.
    """
    return F.min(
        F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col(shingle_col))), 1, 8)
    ).alias(f"mh{i}")


def minhash_sql(i: int, shingle_col: str = "shingle") -> str:
    """DuckDB twin of :func:`minhash_expr`."""
    return f"MIN(substr(md5('{i}:' || {shingle_col}), 1, 8)) AS mh{i}"
