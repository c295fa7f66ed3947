"""Dump ``.explain("formatted")`` for named queries into a round's plan
evidence directory — the before/after pairs the optimization rounds
commit under ``plans/rNN/``.

Usage:
    python tools/dump_round_plans.py --tag before --round r22 NAME ...

Writes ``plans/<round>/<name>_<tag>.txt`` per query at sf0.01 (the
driver's correctness scale, same as PLANS.md).

Checkpoint-truncated operators (r21 verdict item 3): a query whose body
ends in ``localCheckpoint()`` — or that returns a per-context memoized
frame — dumps as a bare ``Scan ExistingRDD``, hiding the DAG the
optimization actually changed. For operators that expose the textrank
``materialize=False`` escape hatch this tool calls it automatically (the
full un-truncated iteration DAG); for memoized frames it dumps the plan
of the FIRST build in a fresh context, before any checkpoint truncates
lineage, by snapshotting the ctx keys the query would read and clearing
them is NOT done (memos are build-once by contract) — instead prefer
dumping a query in a fresh process if its plan is checkpoint-hidden.
"""

from __future__ import annotations

import argparse
import contextlib
import inspect
import io
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", required=True, help="before | after")
    ap.add_argument("--round", default="r22")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    sys.path.insert(0, _REPO)
    import __spark_entry__ as e
    from databricks_observe_spark.registry import _REGISTRY, _ctx
    from databricks_observe_spark.session import get_spark

    spark = get_spark("plan-dump-round")
    qs = e.queries()
    out_dir = os.path.join(_REPO, "plans", args.round)
    os.makedirs(out_dir, exist_ok=True)

    for name in args.names:
        # prefer the un-truncated DAG when the operator exposes the
        # materialize=False escape hatch (textrank pattern)
        fn = _REGISTRY.get(name, (None,))[0]
        if fn is not None and "materialize" in inspect.signature(fn).parameters:
            df = fn(_ctx(spark, args.sf_dir), materialize=False)
        else:
            df = qs[name](spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
