"""JSONL corpus source/sink — the interchange format LLM training corpora
actually ship in (one JSON object per line, usually gzip'd: the common
public web-corpus dumps and LLM fine-tune files all use it).

The reference has no corpus ingestion at all (it operates on live PG
tables); this is a north-star extension feeding the `documents`-shaped
pipeline (dedup/textops/pipe operators) from files.

Scale stance: Spark's native JSON reader is distributed and
splittable-per-file (gzip members are not splittable — shard the corpus
into many files, which every public dump already does). ALWAYS pass the
schema: schema inference runs an extra full pass over 100 TB. Corrupt
lines are quarantined per Spark's PERMISSIVE machinery rather than
killing a multi-hour job; `bad_lines="fail"` opts into fail-fast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# documents-table shape (TESTDATA.md); JSONL fields beyond the schema are
# ignored by Spark's reader, missing ones read as NULL
DOCUMENTS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    bad_lines: str = "drop",
) -> DataFrame:
    """Read a JSONL corpus with an enforced schema.

    ``bad_lines``: ``"drop"`` (default — malformed lines are silently
    dropped, the standard corpus-ingest stance), ``"keep"`` (malformed
    lines surface as rows whose ``_corrupt_record`` column holds the raw
    line — route them to a quarantine sink), or ``"fail"`` (first bad line
    kills the job)."""
    if bad_lines not in ("drop", "keep", "fail"):
        raise ValueError(f"bad_lines must be drop|keep|fail, got {bad_lines!r}")
    if bad_lines == "fail":
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    reader = (
        spark.read.schema(f"{schema}, {_CORRUPT} STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    df = reader.json(path)
    if bad_lines == "keep":
        return df
    return df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = "gzip"
) -> None:
    """Write a corpus back out as (optionally gzip'd) JSONL shards — one
    file per partition, the layout every public dump uses. Repartition
    upstream to choose the shard count/size."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
