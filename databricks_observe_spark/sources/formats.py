"""Format-negotiating source reads (extension surface).

The reference reads exactly one warehouse surface (`spark.read.table`,
``customer_assets.py:11``); a standalone engine meets data where it lands —
parquet from the lakehouse, JSON-lines from crawlers and API dumps, CSV
from vendor drops. One entry point dispatches on the path's extension with
the scale rules baked in:

- schema is EXPLICIT whenever the caller knows it: schema inference is a
  full extra pass over the data for JSON and CSV (at 100 TB, a scan you
  pay before the first real scan).
- uncompressed JSON-lines and CSV split by line ranges, so they
  parallelize like parquet; the reader never collects or caches.
- unknown extensions raise a NAMED error (same stance as the fixture
  contract: fail loudly at the source, not deep inside a plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_JSON_EXTS = {"json", "jsonl", "ndjson"}


def read_any(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as a DataFrame, dispatching on its extension.

    ``options`` pass straight through to the underlying reader (e.g.
    ``sep`` for CSV). CSV defaults to ``header=true``; without an explicit
    schema it falls back to inference (documented cost: one extra pass).
    """
    ext = path.rstrip("/").rsplit(".", 1)[-1].lower()
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    if ext == "parquet":
        return reader.parquet(path)
    if ext in _JSON_EXTS:
        return reader.json(path)
    if ext == "csv":
        if "header" not in options:
            reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
        return reader.csv(path)
    raise ValueError(
        f"read_any: unsupported source extension {ext!r} for {path!r}; "
        f"supported: parquet, csv, {', '.join(sorted(_JSON_EXTS))}"
    )
