"""Engine-agnostic fixed-point rounding.

``F.round(double, n)`` is engine-implemented: Spark rounds HALF_UP over the
*shortest decimal representation* of the double (``BigDecimal.valueOf``)
while DuckDB scales and rounds the raw binary value. The two agree except
within ~1 ulp of a ``0.5 * 10^-n`` boundary — a latent cross-engine hash
divergence every ``round()`` oracle pair carried (flagged in the round-6
verdict; previously documented at the ``tfidf_keywords`` docstring).

The fix is to stop delegating to either engine's rounding entirely:

    round_half_up(x, n) == floor(x * 10^n + 0.5) / 10^n

is pure IEEE-double arithmetic (multiply, add, floor, divide) that both
engines execute bit-identically, so the Spark query and the DuckDB oracle
agree *by construction* — including at boundaries. (For negative inputs
this is "half toward +inf" where ``round()`` is "half away from zero";
they differ only exactly at boundaries, and both sides here use the same
formula, so cross-engine parity is unconditional.)

Spark's ``floor`` returns BIGINT while DuckDB's returns DOUBLE; after the
``/ 10^n`` both are the same double value, so hashes align. NULL propagates
through both pipelines identically.

Spark/SQL twins live side by side (:func:`round_half_up` /
:func:`sql_round_half_up`) per the ``textfns`` convention, so the formula
cannot drift between engine and oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _scale(n: int) -> float:
    return float(10**n)


def round_half_up(col: Column | str, n: int) -> Column:
    """Fixed-point half-up rounding of a double column to ``n`` decimals."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(_scale(n))
    return F.floor(c * s + F.lit(0.5)) / s


def sql_round_half_up(expr: str, n: int) -> str:
    """The exact SQL twin of :func:`round_half_up` (valid in DuckDB and
    Spark SQL; both floor/divide the same IEEE doubles)."""
    s = repr(_scale(n))
    return f"(floor(({expr}) * {s} + 0.5) / {s})"


def sql_nano_grid(expr: str) -> str:
    """The package's quantize-before-transcendental grid, as ONE shared
    SQL fragment: ``GREATEST(FLOOR((expr) * 1e9 + 0.5), 1)`` — the 1e-9
    half-up quantization (clamped >= 1 nano so ``ln(0)`` is unreachable)
    every ln/pow oracle applies to its input BEFORE the transcendental.

    Single-sourced here so the oracle SQL constants (logprob, DSIR, kl,
    bm25) and the boundary canaries in ``tests/test_ln_boundary.py``
    compose the IDENTICAL text: a formula change in one place re-derives
    both the shipped oracle and the canary's attained grid, closing the
    silent de-sync the r09 self-review flagged (valid in DuckDB and
    Spark SQL; pure IEEE ops either side of the floor)."""
    return f"GREATEST(FLOOR(({expr}) * 1000000000.0 + 0.5), 1)"
