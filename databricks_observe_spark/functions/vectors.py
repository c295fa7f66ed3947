"""Vector column expressions — dot product / cosine via JVM higher-order fns.

``F.aggregate`` folds the array sequentially, so the float summation order is
fixed (array order) — deterministic across partitionings and matched by the
DuckDB oracle's ``list_dot_product`` loop. No UDFs: the arithmetic runs in
whole-stage codegen.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, functions as F


def dot_expr(a: str | Column, b: str | Column) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    return dot_expr(a, b) / (
        F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b))
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH, as plain literals.

    Rounded to 6 decimals so that rendering them into SQL text parses to
    bit-identical doubles in any engine (strtod is correctly rounded).
    """
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n_planes)
    ]
