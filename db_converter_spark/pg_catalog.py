"""pg_catalog emulation — the introspection surface the reference's
alert_*/dba_* packet family queries (reference: packets/alert_check_autovacuum/
01_step.sql:1-16, packets/dba_top_tables/01_step.sql, packets/
alert_int4_capacity/01_gen_obj.sql), rebuilt over the live Spark catalog.

Shape parity, not byte parity: enough of pg_class / pg_namespace /
pg_attribute / pg_type / pg_stat_all_tables that the packets' joins and
predicates run unmodified through the PG dialect rewriter. Spark-specific
mappings:

- *oid*: a stable 32-bit hash of the qualified name (PG oids are also just
  opaque ints to these queries);
- *reloptions*: Spark TBLPROPERTIES rendered as PG-style ``k=v`` strings —
  the dialect rewriter maps ``ALTER TABLE t SET (k = v)`` onto
  TBLPROPERTIES, so options round-trip exactly like in PG; internal
  Spark/parquet bookkeeping properties are filtered out; NULL when no
  user options (PG semantics: NULL, not an empty array — containment
  predicates must not match optionless tables);
- *relpages / reltuples*: from ANALYZE statistics when present (DESCRIBE
  EXTENDED ``Statistics`` row), else file sizes listed from the table
  location; -1 reltuples when unknown, exactly PG's "never analyzed";
- *pg_stat_all_tables*: n_live_tup from the same stats; the MVCC counters
  (n_dead_tup, n_tup_ins/upd/hot_upd) are 0 — parquet has no dead tuples.

Everything here is driver-side catalog metadata (small N); no Spark jobs
are launched except the optional per-table file listing, which is a
filesystem stat, not a scan.
"""

from __future__ import annotations

import re
import zlib
from pathlib import Path

from pyspark.sql import SparkSession

# Spark simpleString -> PG typname (pg_type join key in the packets)
_PG_TYPNAME = {
    "tinyint": "int2",
    "smallint": "int2",
    "int": "int4",
    "bigint": "int8",
    "float": "float4",
    "double": "float8",
    "string": "text",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "bytea",
}

# TBLPROPERTIES keys that are Spark/parquet bookkeeping, not user reloptions
_INTERNAL_PROP_RE = re.compile(
    r"^(spark\.|option\.|transient_lastDdlTime|external|numFiles|totalSize"
    r"|rawDataSize|numRows|COLUMN_STATS_ACCURATE|created|owner|bucketing_version)",
    re.I,
)

_STATS_RE = re.compile(r"([\d,]+)\s+bytes(?:,\s*([\d,]+)\s+rows)?")


def _oid(name: str) -> int:
    return zlib.crc32(name.encode())


def _pg_typname(spark_type: str) -> str:
    base = spark_type.lower()
    if base.startswith("decimal"):
        return "numeric"
    if base.startswith("array"):
        inner = base[6:-1]
        return "_" + _pg_typname(inner)  # PG array typname convention
    if base.startswith(("struct", "map")):
        return base.split("<")[0]
    if base.startswith("varchar") or base.startswith("char"):
        return "text"
    return _PG_TYPNAME.get(base, base)


def _table_stats(spark: SparkSession, qualified: str) -> tuple[int | None, int | None]:
    """(size_bytes, row_count) from DESCRIBE EXTENDED; either may be None.
    Falls back to a filesystem listing of the table location for bytes."""
    size = rows = None
    location = None
    try:
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {qualified}").collect():
            if r[0] == "Statistics":
                m = _STATS_RE.search(r[1] or "")
                if m:
                    size = int(m.group(1).replace(",", ""))
                    if m.group(2):
                        rows = int(m.group(2).replace(",", ""))
            elif r[0] == "Location":
                location = r[1]
    except Exception:  # noqa: BLE001 — view/temp relations have no EXTENDED
        return None, None
    if size is None and location and location.startswith("file:"):
        p = Path(location[5:])
        if p.exists():
            size = sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
    return size, rows


def create_pg_catalog_views(spark: SparkSession, dbs: list[str] | None = None) -> None:
    """(Re)build the pg_catalog temp views over ``dbs`` (default: the
    session's current database). Call again after DDL to refresh — PG's
    catalog is live, these views are a snapshot (documented gap)."""
    dbs = dbs or [spark.catalog.currentDatabase()]
    ns_rows: list[tuple] = []
    cls_rows: list[tuple] = []
    att_rows: list[tuple] = []
    stat_rows: list[tuple] = []
    for db in dbs:
        ns_oid = _oid(db)
        ns_rows.append((ns_oid, db))
        for t in spark.catalog.listTables(db):
            if t.tableType == "TEMPORARY" or t.tableType == "VIEW":
                continue
            qualified = f"{db}.{t.name}"
            oid = _oid(qualified)
            try:
                props = {
                    r["key"]: r["value"]
                    for r in spark.sql(f"SHOW TBLPROPERTIES {qualified}").collect()
                }
            except Exception:  # noqa: BLE001
                props = {}
            reloptions = [
                f"{k}={v}"
                for k, v in sorted(props.items())
                if not _INTERNAL_PROP_RE.match(k)
            ] or None
            size, nrows = _table_stats(spark, qualified)
            relpages = (size or 0) // 8192
            reltuples = float(nrows) if nrows is not None else -1.0
            cls_rows.append((oid, t.name, ns_oid, "r", reltuples, relpages, reloptions))
            stat_rows.append(
                (oid, db, t.name, nrows if nrows is not None else 0, 0, 0, 0, 0)
            )
            for i, c in enumerate(spark.catalog.listColumns(qualified)):
                att_rows.append((oid, c.name, i + 1, _pg_typname(c.dataType)))

    spark.createDataFrame(ns_rows, "oid bigint, nspname string").createOrReplaceTempView(
        "pg_namespace"
    )
    spark.createDataFrame(
        cls_rows,
        "oid bigint, relname string, relnamespace bigint, relkind string,"
        " reltuples double, relpages bigint, reloptions array<string>",
    ).createOrReplaceTempView("pg_class")
    spark.createDataFrame(
        att_rows, "attrelid bigint, attname string, attnum int, atttypid string"
    ).createOrReplaceTempView("pg_attribute")
    typ = sorted({r[3] for r in att_rows})
    spark.createDataFrame(
        [(t, t) for t in typ] or [("text", "text")], "oid string, typname string"
    ).createOrReplaceTempView("pg_type")
    spark.createDataFrame(
        stat_rows,
        "relid bigint, schemaname string, relname string, n_live_tup bigint,"
        " n_dead_tup bigint, n_tup_ins bigint, n_tup_upd bigint, n_tup_hot_upd bigint",
    ).createOrReplaceTempView("pg_stat_all_tables")
