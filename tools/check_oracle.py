"""Local differential oracle check — mimics the driver's CORRECTNESS gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
twin on DuckDB over the same parquet, then compares row count, column-name
set, and an order-insensitive exact value comparison (columns sorted by
name, rows sorted). Strict: floats must match bit-for-bit — the engine is
built to produce exact decimal-derived doubles.

Since r10 it ALSO compares the pandas conversion surface
(``sdf.toPandas()`` vs ``con.execute(sql).df()`` dtype classes): the
r07-r09 ``score_auc`` driver divergence reproduced ONLY there — DuckDB's
``.df()`` renders DECIMAL(38,0) as float64 while Spark's ``toPandas``
yields object/Decimal, identical values notwithstanding — and the
collect/Arrow comparisons this tool previously ran were blind to it
(both engines surface decimal128 in Arrow, so the type classes matched).
A pandas-surface mismatch is a FAIL even when every value matches.

r11 hardening (ADVICE.md): object columns classify over a bounded
SAMPLE of cells (not the first cell only) and list-like cells recurse
into element types, so mixed-type columns and nested element
divergence (list-of-Decimal vs list-of-float) cannot evade the gate;
``--surface-limit`` optionally bounds the conversion cost at larger
scale factors (see its help text for why full stays the default at
sf0.01).

r12 hardening (r11 VERDICT + ADVICE): both sample levels are strided
AND always include the final item (a ceil-step stride skips up to
step-1 trailing cells, and the old list-element sample was a head
slice — either could hide a tail-only divergence, e.g. the last slot
of a long embedding list or a lone divergent final cell); list
recursion is depth-capped at ``_CLS_MAX_DEPTH`` so a pathological
self-referential cell cannot recurse forever.

r13 hardening (r12 ADVICE): both strides were FLOOR-step + budget cap
(ceil-step could spend as little as half the stated budget).

r14 hardening (r13 ADVICE): the floor-stride + cap traded the budget
problem for a SPAN problem — for budget < len < 2*budget the step was 1,
so the capped sample was literally the head `budget` items plus the
final item, leaving a contiguous unsampled tail block of up to ~half the
column (the exact sort-order-correlated tail region the gate's own
rationale names as the likeliest landing spot). Both levels now sample
via ``_sample_idx``: evenly SPACED indices that always include the first
and last item, spend the full budget (exactly ``budget`` distinct
indices whenever len >= budget), and bound every contiguous unsampled
gap at ceil((len-1)/(budget-1)) items.

STANDING RULE: ``_CLS_MAX_DEPTH`` (=3) must be raised IN THE SAME
COMMIT as any new registry query whose result nests lists deeper than
3 levels (today's deepest shape is 2); a divergence confined below the
cap classifies identically on both engines and evades this gate.

Usage: python tools/check_oracle.py [name ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import math
import re
import sys
import time

import duckdb
import pyarrow as pa


def _norm_spark_dtype(dt: str) -> str:
    """Collapse a Spark simpleString dtype to a representation class."""
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("array"):
        return "list"
    if dt.startswith("timestamp"):
        return "ts"
    return {"string": "str", "boolean": "bool", "binary": "bin", "date": "date"}.get(
        dt, dt
    )


def _norm_arrow_type(t: pa.DataType) -> str:
    """Collapse an Arrow type to the same representation classes.

    DuckDB's HUGEINT (the result type of SUM over integers) surfaces as
    decimal128(38,0) in Arrow, which is what the driver's value-hash
    distinguishes from Spark's int64 — fetchall() would hide it.
    """
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_date(t):
        return "date"
    return str(t)


# how many object cells / list elements to type-classify per column —
# bounded so classification stays O(1) per column at any SF, but wide
# enough that a mixed-type column cannot hide behind its first cell
_CLS_CELL_SAMPLE = 1024
_CLS_ELEM_SAMPLE = 8
def _sample_idx(n: int, budget: int) -> list:
    """Evenly spaced sample indices over ``range(n)``.

    Properties (each one pinned in test_check_oracle_classifier.py):
    - always includes index 0 and index n-1;
    - spends the FULL budget: exactly ``budget`` distinct indices when
      n >= budget (the linear map i -> i*(n-1)//(budget-1) is strictly
      increasing once its real-valued step (n-1)/(budget-1) >= 1), and
      every index when n <= budget;
    - SPANS the range: no contiguous unsampled gap exceeds
      ceil((n-1)/(budget-1)) items.

    This replaces the r13 floor-stride + cap, which for
    budget < n < 2*budget had step 1 and so sampled the head ``budget``
    items plus the final item — a contiguous unsampled TAIL block of up
    to ~half the column, the exact sort-order-correlated region the
    gate's rationale calls the likeliest landing spot for a divergence
    (r13 ADVICE). A divergence confined to the <= ceil((n-1)/(budget-1))
    unsampled interior items between consecutive sampled indices can
    still evade — inherent to any bounded-budget sample.
    """
    if n <= budget:
        return list(range(n))
    if budget <= 1:
        # degenerate budget (r14 ADVICE: the linear map below divides by
        # budget-1); keep the first-and-last invariant as far as the
        # budget allows — [0] for budget 1, [] for budget <= 0
        return [0][: max(budget, 0)]
    return sorted({i * (n - 1) // (budget - 1) for i in range(budget)})


# list-nesting levels classified before truncating: bounds recursion so
# a pathological self-referential cell cannot loop forever (r11 ADVICE:
# the previous form was depth-unbounded while its docstring said "one
# level"); 3 levels cover every shape the registry emits (deepest is
# list<struct-as-tuple<scalar>>) with headroom
_CLS_MAX_DEPTH = 3


def _cell_cls(v, _depth: int = 0) -> str:
    """Representation class of ONE cell, recursing into list-likes up to
    ``_CLS_MAX_DEPTH`` nesting levels (r10 ADVICE: a list-of-Decimal vs
    list-of-float split — the exact divergence class this gate exists
    for, one nesting level down — must not collapse to an
    undifferentiated 'list').

    r11/r14 hardening: the per-level element sample is EVENLY SPACED
    across the whole list via ``_sample_idx`` — it always includes the
    first and FINAL element (a tail-only element-type divergence, e.g.
    the last slot of a 384-dim embedding list, evaded the pre-r11
    head-slice sample), spends the full ``_CLS_ELEM_SAMPLE`` budget
    whenever the list is at least that long, and leaves no contiguous
    unsampled run longer than ceil((len-1)/(budget-1)) elements. A
    divergence confined to unsampled interior elements can still evade
    — inherent to any bounded-budget sample."""
    import datetime as _dt
    import decimal as _dec

    import numpy as _np

    # bool BEFORE int: Python bool subclasses int, numpy likewise
    if isinstance(v, (bool, _np.bool_)):
        return "bool"
    if isinstance(v, _dec.Decimal):
        return "decimal"
    if isinstance(v, (int, _np.integer)):
        return "int"
    if isinstance(v, (float, _np.floating)):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bin"
    if isinstance(v, _dt.datetime):  # datetime BEFORE date (subclass)
        return "ts"
    if isinstance(v, _dt.date):
        return "date"
    if isinstance(v, (list, tuple, _np.ndarray)):
        if _depth >= _CLS_MAX_DEPTH:
            return "list<...>"  # depth-capped, never silently scalar-typed
        seq = list(v)
        if not seq:
            return "list<?>"  # no classifiable element in this cell
        # evenly spaced sample (same scheme as the cell-level sample in
        # _pandas_cls, one level down): full budget, spans the range,
        # first and final element always examined — see _sample_idx
        sample = [seq[j] for j in _sample_idx(len(seq), _CLS_ELEM_SAMPLE)]
        elems = {_cell_cls(x, _depth + 1) for x in sample if x is not None}
        if not elems:
            return "list<?>"  # all sampled elements were None
        return "list<" + ",".join(sorted(elems)) + ">"
    return "object:" + type(v).__name__


def _pandas_cls(series) -> str:
    """Collapse a pandas column to the representation class a
    value-canonicalizing hasher would see (str/repr of the cells).

    Object columns classify over a bounded SAMPLE of non-null cells —
    evenly spaced across the whole column, first and final cell always
    included — and list-like cells recurse (depth-capped, sampled the
    same way) into element types, so a mixed-type column or an
    element-type divergence cannot evade the gate behind a leading
    well-typed cell or an unsampled tail block."""
    dt = str(series.dtype)
    if dt.startswith(("int", "uint")):
        return "int"
    if dt.startswith("float"):
        return "float"
    if dt.startswith("datetime64"):
        return "ts"
    if dt == "bool":
        return "bool"
    if dt == "object":
        nn = series.dropna()
        if len(nn) == 0:
            return "object-empty"
        # EVENLY SPACED sample, not a head slice: a divergence
        # correlated with sort order (the canon sort puts high keys
        # last) must not land exclusively in an unexamined tail. The
        # full _CLS_CELL_SAMPLE budget is always spent when the column
        # is at least that long, the FIRST and FINAL cells are always
        # examined (a lone divergent LAST cell is the most likely
        # landing spot for a sort-order-correlated divergence), and no
        # contiguous unsampled run exceeds ceil((len-1)/(budget-1))
        # cells — see _sample_idx for why the r13 floor-stride + cap
        # form failed the span property. A divergence confined to the
        # unsampled interior cells between consecutive sampled indices
        # can still evade — inherent to any bounded-budget sample.
        cells = list(nn.iloc[_sample_idx(len(nn), _CLS_CELL_SAMPLE)])
        classes = {_cell_cls(v) for v in cells}
        # merge element-unknown list cells into a typed list class when
        # one exists ([] and [1,2] in one column are the same class)
        if "list<?>" in classes and any(
            c.startswith("list<") and c != "list<?>" for c in classes
        ):
            classes.discard("list<?>")
        if len(classes) == 1:
            return classes.pop()
        return "mixed{" + ",".join(sorted(classes)) + "}"
    return dt


def _surface_match(a: str, b: str, sampled: bool = False) -> bool:
    """True when two pandas-surface classes are compatible.

    Strict equality in FULL mode (the sf0.01 gate default): an all-null
    object column vs an all-NaT datetime64 column (None vs NaT) is a
    real rendering divergence on the pandas surface and must FAIL, as
    it did before r11. The 'object-empty'/'list<?>' wildcard applies
    ONLY in sampled (--surface-limit) mode, where an empty class is a
    sampling artifact — each engine limited a different row subset — not
    evidence about the full column."""
    if a == b:
        return True
    if not sampled:
        return False
    wild = {"object-empty", "list<?>"}
    return a in wild or b in wild


def canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession like the verification driver does",
    )
    ap.add_argument(
        "--surface-limit",
        type=int,
        default=0,
        help="bound the pandas-surface CONVERSION/TRANSFER to the first "
        "N rows per engine (0 = full, the default). Scope honesty: this "
        "does NOT bound the second execution itself — an aggregate/"
        "window/join query still computes fully on both engines before "
        "LIMIT can take rows — so it only pays off for large-OUTPUT "
        "queries (passthrough/per-row shapes) where the toPandas/.df() "
        "materialization dominates. Full stays the default at the "
        "gate's sf0.01 because limiting is SAMPLED per engine — each "
        "engine limits its own (differently ordered) row subset, so a "
        "mostly-null column or a nullable int (whose pandas dtype flips "
        "int64->float64 only when the sample happens to include a null) "
        "could classify differently and flake the gate; _surface_match "
        "relaxes to wildcard-on-empty ONLY in this sampled mode. "
        "(Reusing the already-fetched Arrow table instead was rejected: "
        "Arrow's to_pandas renders DECIMAL as object-of-Decimal where "
        "DuckDB's .df() renders float64 — it would NOT reproduce the "
        ".df() surface this check exists to compare.) CONSTRAINT (r11 "
        "ADVICE): sampled mode must never become the gate default as "
        "long as the two samples are unordered; if it ever is promoted, "
        "both samples must first be ordered identically (reuse the "
        "canon_rows sort keys) before limiting.",
    )
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]").appName("oracle-check").getOrCreate()
        )
    else:
        from databricks_observe_spark.session import get_spark

        spark = get_spark("oracle-check")
    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    from databricks_observe_spark.sources.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            tbl = res.arrow()
            ocols = tbl.column_names
            orows = [
                tuple(row) for row in zip(*[c.to_pylist() for c in tbl.columns])
            ] if tbl.num_columns else []
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        sc, sr = canon_rows(scols, srows)
        oc, orr = canon_rows(ocols, orows)
        styp = {c: _norm_spark_dtype(re.sub(r"\s", "", d)) for c, d in sdf.dtypes}
        otyp = {
            c: _norm_arrow_type(tbl.schema.field(i).type) for i, c in enumerate(ocols)
        }
        status = []
        if sc != oc:
            status.append(f"schema spark={sc} duck={oc}")
        else:
            mism = {c: (styp[c], otyp[c]) for c in sc if styp.get(c) != otyp.get(c)}
            if mism:
                status.append(f"typerep spark-vs-duck {mism}")
        if len(sr) != len(orr):
            status.append(f"rowcount spark={len(sr)} duck={len(orr)}")
        if not status and sr != orr:
            ndiff = sum(1 for a, b in zip(sr, orr) if a != b)
            status.append(f"values differ ({ndiff}/{len(sr)} rows)")
            for a, b in zip(sr, orr):
                if a != b:
                    status.append(f"  spark={a!r}\n  duck ={b!r}")
                    break
        if not status:
            # pandas conversion surface — the one the r07-r09 score_auc
            # driver divergence actually lived on (see module docstring)
            try:
                if args.surface_limit > 0:
                    pdf = sdf.limit(args.surface_limit).toPandas()
                    ddf = con.execute(
                        f"SELECT * FROM ({oracles[name]}) LIMIT "
                        f"{args.surface_limit}"
                    ).df()
                else:
                    pdf = sdf.toPandas()
                    ddf = con.execute(oracles[name]).df()
                pmism = {}
                for c in pdf.columns:
                    pc, dc = _pandas_cls(pdf[c]), _pandas_cls(ddf[c])
                    if not _surface_match(pc, dc, sampled=args.surface_limit > 0):
                        pmism[c] = (pc, dc)
                if pmism:
                    status.append(f"pandas-surface {pmism}")
            except Exception as ex:  # surface the conversion error itself
                status.append(f"pandas-surface error: {ex}")
        if status:
            print(f"FAIL {name}: " + "; ".join(status[:3]))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(names)-len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
