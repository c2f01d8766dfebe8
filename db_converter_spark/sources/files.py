"""File sources: the read-side twins of the engine's sinks.

``read_export_csv`` re-imports what ``plans/export.py`` writes (tab-
delimited, QUOTE_ALL, header, empty string = NULL — reference format:
dbccore/dbccore.py:759-768), closing the export→reimport loop the reference
leaves to external tooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_export_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
) -> DataFrame:
    """Read an engine-exported CSV back into a DataFrame.

    Schema is inferred unless given (DDL string). At scale prefer an
    explicit schema: inference runs an extra full pass over the files."""
    reader = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", None)
        .option("nullValue", "")
    )
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet_dir(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet directory read — schema from footers, pushdown/pruning
    native. Exists for symmetry in the source registry."""
    from ..catalog import _ensure_nanos_readable

    _ensure_nanos_readable(spark)
    return spark.read.parquet(path)
